"""A/B the corr kernel's track-group unroll + block size + fmap dtype on
hardware.

The kernel's serial track loop carries fixed per-group overhead (scalar
address math, loop control); a larger static unroll amortises it at the cost
of vector-register pressure. Parity vs the GROUP=8 production path is
asserted before timing.

r5 adds the fmap-dtype axis (VERDICT r4 #6): the kernel is VMEM-load-bound
(~60 cycles/window ~= the 64 dynamic row loads), so int8 fmap storage halves
the window-load bytes vs bf16; the dequant scale folds into the 1/sqrt(C)
normaliser. int8 rows report error vs the bf16 baseline (quantisation, not a
bug — expect ~1e-2 on unit-normal features).

Usage: timeout 900 python scripts/corr_ab.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from batrack_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from batrack_tpu.ops import pallas_corr as pc  # noqa: E402
from batrack_tpu.ops.corr import build_pyramid  # noqa: E402


def _flush(x):
    # tunneled-backend block_until_ready returns early; scalar fetch drains
    return float(jnp.ravel(jax.tree_util.tree_leaves(x)[0])[0])


def timeit(fn, reps=20, warmup=3):
    for _ in range(warmup):
        _flush(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    _flush(out)
    return (time.perf_counter() - t0) / reps * 1000.0


def main():
    S, C, H, W, N, r, L = 12, 128, 96, 128, 2400, 3, 4
    rng = np.random.default_rng(0)
    fmaps = jnp.asarray(rng.normal(0, 1, (S, C, H, W)), jnp.bfloat16)
    targets = jnp.asarray(rng.normal(0, 1, (N, S, C)), jnp.bfloat16)
    coords = jnp.asarray(
        np.stack([rng.uniform(-4, W + 4, (S, N)),
                  rng.uniform(-4, H + 4, (S, N))], -1), jnp.float32)

    # parity baseline: the production default (GROUP, block_n=256), computed
    # explicitly BEFORE the sweep — if it fails, abort loudly rather than
    # silently comparing later configs against whichever one compiled first
    def run_cfg(group, block_n, fmap_dtype="bf16"):
        def run():
            pyr = build_pyramid(fmaps, L)
            return pc.corr_sample_pyramid_pallas(
                pyr, targets, coords, r, group=group, block_n=block_n,
                fmap_dtype=fmap_dtype)
        return jax.jit(run)

    base_fn = run_cfg(pc.GROUP, 256)
    base = base_fn()
    _flush(base)

    for group, block_n, fdt in [
        (8, 256, "bf16"), (16, 256, "bf16"), (32, 256, "bf16"),
        (64, 256, "bf16"), (32, 128, "bf16"),
        (32, 256, "int8"), (64, 256, "int8"),
    ]:
        f = run_cfg(group, block_n, fdt)
        try:
            out = f(); _flush(out)
        except Exception as e:
            print(f"group={group:3d} block_n={block_n:4d} {fdt}  FAILED: "
                  f"{type(e).__name__}: {str(e)[:120]}")
            continue
        err = float(jnp.max(jnp.abs(out - base)))
        ms = timeit(f)
        print(f"group={group:3d} block_n={block_n:4d} {fdt:5s} "
              f"{ms:7.2f} ms/pyramid  maxdiff={err:.2e}")


if __name__ == "__main__":
    main()
