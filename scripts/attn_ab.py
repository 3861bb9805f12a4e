"""A/B the fused-qkv attention kernel's logits-matmul dtype on hardware,
plus the d=48 -> d=128 head-packing experiment (VERDICT r4 #7).

The f32 upcast of q/k before the QK^T dot makes Mosaic emit a multi-pass
f32 MXU matmul; feeding the dot in bf16 (f32 accumulate) uses the native
bf16 rate. This measures both variants at the production space-attention
shape and reports the numeric delta vs an f64-ish XLA reference.

--packed128: zero-pad every 48-lane head to 128 lanes (C 384 -> 1024,
qkv 1152 -> 3072) and AOT-compile the same kernel over a descending
block_q sweep (jit(...).lower().compile() — compile only, no 10-minute
tunnel-execution window in the way), then time whichever block_q values
compile. The r4 attempt ended in "did not compile inside a 10-minute
window"; this replaces that with data: ms/block per block_q, or the
concrete Mosaic rejection string.

Usage: timeout 900 python scripts/attn_ab.py [--packed128]
"""

from __future__ import annotations

import functools
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


def packed128():
    """d=48 -> d=128 head packing (VERDICT r4 #7): pad each head's 48 lanes
    to 128, AOT-compile the kernel over a descending block_q sweep, time
    what compiles. The d-padded heads contribute zero to the logits, so the
    live 48 lanes of each padded head must equal the d=48 kernel output."""
    B, N, C, H, D2 = 12, 2400, 384, 8, 128
    d = C // H
    scale = d ** -0.5  # logical scale: padded lanes are zero
    C2 = H * D2
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(0, 1, (B, N, 3 * C)), jnp.bfloat16)
    mask = jnp.asarray(rng.uniform(0, 1, (N,)) > 0.3)

    # baseline: the production d=48 kernel
    f48 = jax.jit(lambda: fused_qkv_attention(qkv, H, scale, key_mask=mask))
    out48 = f48(); _flush(out48)
    ms48 = timeit(f48)
    print(f"d=48 baseline            {ms48:7.3f} ms/block")

    # pack: (B, N, 3, H, 48) -> zero-pad lane axis to 128 -> (B, N, 3*1024)
    qkv5 = qkv.reshape(B, N, 3, H, d)
    qkv128 = jnp.pad(qkv5, ((0, 0),) * 4 + ((0, D2 - d),))
    qkv128 = qkv128.reshape(B, N, 3 * C2)

    # the kernel pads N to Np=2432 (= 2^7 * 19) internally; block_q must
    # divide Np and be 8-aligned
    for block_q in (608, 304, 152, 128, 64, 32, 8):
        fn = jax.jit(functools.partial(
            fused_qkv_attention, qkv128, H, scale, key_mask=mask,
            block_q=block_q))
        t0 = time.perf_counter()
        try:
            compiled = fn.lower().compile()
        except Exception as e:
            msg = " ".join(str(e).split())[:300]
            print(f"block_q={block_q:4d}  COMPILE FAILED "
                  f"({time.perf_counter() - t0:.0f}s): {msg}")
            continue
        t_compile = time.perf_counter() - t0
        try:
            out = compiled(); _flush(out)
        except Exception as e:
            msg = " ".join(str(e).split())[:300]
            print(f"block_q={block_q:4d}  compiled in {t_compile:.0f}s but "
                  f"EXEC FAILED: {msg}")
            continue
        # parity: live lanes of each padded head == the d=48 output
        live = np.asarray(
            out.reshape(B, N, H, D2)[..., :d].reshape(B, N, C),
            np.float32)
        errp = np.abs(live - np.asarray(out48, np.float32)).max()
        ms = timeit(compiled)
        print(f"block_q={block_q:4d}  {ms:7.3f} ms/block  (compile "
              f"{t_compile:.0f}s, vs d=48 {ms48:.3f} ms, "
              f"pad-parity {errp:.2e})")


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--packed128", action="store_true")
    args = ap.parse_args()
    if args.packed128:
        return packed128()

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
