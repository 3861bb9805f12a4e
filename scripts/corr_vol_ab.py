"""Feasibility measurement for the matmul-first corr restructure.

Times the XLA einsum that materialises the full correlation volume
(S, N, H, W) per pyramid level in bf16, at production shapes. If
einsum+HBM round-trip stays well under the current 9.4 ms/pyramid
Pallas gather, the two-pass design (MXU volume + light window gather)
wins. Usage: timeout 900 python scripts/corr_vol_ab.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from batrack_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from batrack_tpu.ops.corr import build_pyramid  # noqa: E402
from batrack_tpu.ops.pallas_corr import corr_sample_pyramid_pallas  # noqa: E402


def _flush(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.ravel(leaf)[0])


def timeit(fn, reps=20, warmup=3):
    for _ in range(warmup):
        _flush(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    _flush(out)
    return (time.perf_counter() - t0) / reps * 1000.0


def main():
    S, C, H, W, N = 12, 128, 96, 128, 2400
    rng = np.random.default_rng(0)
    fmaps = jnp.asarray(rng.normal(size=(S, C, H, W)), jnp.bfloat16)
    targets = jnp.asarray(rng.normal(size=(N, S, C)), jnp.bfloat16)
    coords = jnp.asarray(
        np.stack([rng.uniform(0, W - 1, (S, N)),
                  rng.uniform(0, H - 1, (S, N))], -1), jnp.float32)
    pyr = build_pyramid(fmaps.astype(jnp.float32), 4)
    inv = 1.0 / np.sqrt(C)

    # current production kernel
    cur = jax.jit(lambda: corr_sample_pyramid_pallas(
        pyr, targets.astype(jnp.float32), coords, 3))
    print(f"current pallas pyramid gather: {timeit(cur):7.3f} ms")

    # candidate pass 1: per-level einsum into bf16 volumes
    pyr_bf = [p.astype(jnp.bfloat16) for p in pyr]

    def vols():
        return [
            jnp.einsum(
                "schw,nsc->snhw", p, targets,
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16) * inv
            for p in pyr_bf
        ]

    v = jax.jit(vols)
    ms = timeit(v)
    out = v()
    tot_bytes = sum(int(np.prod(o.shape)) * 2 for o in out)
    print(f"einsum volumes (all levels):   {ms:7.3f} ms "
          f"({tot_bytes / 1e6:.0f} MB written)")


if __name__ == "__main__":
    main()
