"""A/B the fused-qkv attention kernel's logits-matmul dtype on hardware.

The f32 upcast of q/k before the QK^T dot makes Mosaic emit a multi-pass
f32 MXU matmul; feeding the dot in bf16 (f32 accumulate) uses the native
bf16 rate. This measures both variants at the production space-attention
shape and reports the numeric delta vs an f64-ish XLA reference.

Usage: timeout 900 python scripts/attn_ab.py
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


def xla_reference(qkv, heads, scale, key_mask):
    B, N, C3 = qkv.shape
    C = C3 // 3
    d = C // heads
    q, k, v = jnp.split(qkv.astype(jnp.float32), 3, axis=-1)
    q = q.reshape(B, N, heads, d).transpose(0, 2, 1, 3)
    k = k.reshape(B, N, heads, d).transpose(0, 2, 1, 3)
    v = v.reshape(B, N, heads, d).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    logits = jnp.where(key_mask[None, None, None, :], logits, -1e30)
    p = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
    return o.transpose(0, 2, 1, 3).reshape(B, N, C)


def main():
    # production space-attention shape: B=T=12, N=2400, C=384, 8 heads
    B, N, C, H = 12, 2400, 384, 8
    scale = (C // H) ** -0.5
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(0, 1, (B, N, 3 * C)), jnp.bfloat16)
    mask = jnp.asarray(rng.uniform(0, 1, (N,)) > 0.3)

    ref = jax.jit(lambda: xla_reference(qkv, H, scale, mask))()
    _flush(ref)

    for qk_bf16 in (False, True):
        f = jax.jit(lambda b=qk_bf16: fused_qkv_attention(
            qkv, H, scale, key_mask=mask, qk_bf16=b))
        out = f()
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
        rel = err / float(jnp.max(jnp.abs(ref)))
        ms = timeit(f)
        print(f"qk_bf16={qk_bf16!s:5}  {ms:7.3f} ms/block  "
              f"max|err| vs f32 XLA={err:.3e} (rel {rel:.3e})")


if __name__ == "__main__":
    main()
