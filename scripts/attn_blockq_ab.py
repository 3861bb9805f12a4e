"""A/B the fused packed-qkv attention kernel's query-block size on hardware.

block_q trades per-program K/V reuse against VMEM pressure; the production
default is Np//4. Parity is asserted against the default before timing.

Usage: timeout 900 python scripts/attn_blockq_ab.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from batrack_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from batrack_tpu.ops.pallas_attention import fused_qkv_attention  # noqa: E402


def _flush(x):
    return float(jnp.ravel(x)[0])


def timeit(fn, reps=30, warmup=3):
    for _ in range(warmup):
        _flush(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    _flush(out)
    return (time.perf_counter() - t0) / reps * 1000.0


def main():
    # production space-attention shape: B=T=12, N=2400, C=384, 8 heads
    B, N, C, H = 12, 2400, 384, 8
    scale = (C // H) ** -0.5
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(0, 1, (B, N, 3 * C)), jnp.bfloat16)
    mask = jnp.asarray(rng.uniform(0, 1, (N,)) > 0.3)

    Np = -(-N // 128) * 128

    def run_bq(bq):
        def run():
            return fused_qkv_attention(qkv, H, scale, block_q=bq,
                                       key_mask=mask)
        return jax.jit(run)

    # parity baseline: the production default (block_q=Np//4), computed
    # explicitly BEFORE the sweep — abort loudly if it fails rather than
    # silently comparing later configs against a non-default one
    base_fn = run_bq(Np // 4)
    base = base_fn()
    _flush(base)

    for bq in [Np // 4, Np // 2, Np, Np // 8, 128]:
        f = run_bq(bq)
        try:
            out = f()
            _flush(out)
        except Exception as e:
            print(f"block_q={bq:5d}  FAILED: {type(e).__name__}: "
                  f"{str(e)[:100]}")
            continue
        err = float(jnp.max(jnp.abs(
            out.astype(jnp.float32) - base.astype(jnp.float32))))
        ms = timeit(f)
        print(f"block_q={bq:5d}  {ms:7.3f} ms/block  maxdiff={err:.2e}")


if __name__ == "__main__":
    main()
