"""Pallas TPU kernel: single-pass attention for short-ish sequences.

The tracker's space-attention works on (B*H = 96, N = 2400, D = 48): the
whole K/V of one (batch, head) is only ~230 KB, so unlike flash attention
(built for sequences whose K/V cannot fit on-chip) this kernel simply keeps
K/V resident in VMEM and computes softmax(QK^T)V for a block of queries in
one pass — logits/probs never touch HBM. The generic jax flash kernel pads
head_dim 48 to 128 internally and measures slower than dense XLA here;
this kernel avoids the flash machinery entirely.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fused_qkv_kernel(q_ref, k_ref, v_ref, m_ref, o_ref, *, scale, n_valid,
                      heads, qk_bf16=False):
    """All-head attention on the PACKED qkv projection output.

    q_ref: (1, BQ, C), k_ref/v_ref: (1, N, C) — the q/k/v thirds of the
    (B, N, 3C) qkv activation, selected by BlockSpec lane-blocking (C = 384
    is 128-aligned, so the thirds are legal blocks). Heads are split by
    STATIC lane slices inside the kernel (a register/VMEM shuffle), which is
    the point: the XLA formulation reshapes (B, N, 3C) -> 3x(B, H, N, d) in
    HBM at ~20% of copy bandwidth (~20 ms/tracker-forward, see ROOFLINE.md).

    Hardware-validated 2026-08-18 (TPU_PARITY.md round-3 section): Mosaic
    accepts the d=48 non-128-aligned static lane slices; the kernel measures
    3.21 ms/block bf16 vs 4.46 ms for the XLA reshape formulation on the
    v5e, parity 1.9e-4 vs dense f32.
    """
    C = q_ref.shape[-1]
    d = C // heads
    # qk_bf16: feed the logits matmul in the activations' own bf16 (f32
    # accumulate via preferred_element_type). Measured a WASH on hardware
    # (scripts/attn_ab.py, 2026-08-20: f32 2.973 vs bf16 3.011 ms/block —
    # the kernel is softmax/VPU-bound at K=48, not MXU-pass-bound;
    # ROOFLINE.md r4 #1). Kept as an option for future shapes where the
    # QK pass dominates; off by default.
    qk_t = jnp.bfloat16 if qk_bf16 else jnp.float32
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        q = q_ref[0, :, sl].astype(qk_t)               # (BQ, d)
        k = k_ref[0, :, sl].astype(qk_t)               # (N, d)
        v = v_ref[0, :, sl]                            # (N, d)
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                      # (BQ, N)
        n_ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        live = (n_ids < n_valid) & (m_ref[0:1, :] > 0)
        logits = jnp.where(live, logits, -1e30)
        m = logits.max(axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        s = p.sum(axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            (p / s).astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, sl] = o.astype(o_ref.dtype)


def fused_qkv_attention(
    qkv: jnp.ndarray,  # (B, N, 3*C) packed projection output
    heads: int,
    scale: float,
    block_q: int = 0,
    interpret: bool = False,
    key_mask: jnp.ndarray | None = None,  # (Nk,) bool; False keys excluded
    kv: jnp.ndarray | None = None,  # (B, Nk, 3*C) separate key/value source
    qk_bf16: bool = False,  # bf16 logits matmul (f32 accumulate); see kernel
) -> jnp.ndarray:
    """Multi-head softmax attention directly on the packed qkv activation.

    Returns (B, N, C) with heads re-merged — the layout the output
    projection consumes — so neither the 3-way head split nor the head
    merge ever materializes in HBM. K/V stay VMEM-resident per batch row
    (fine at tracker space-attention sizes: (2432, 384) bf16 = 1.8 MB).

    key_mask excludes inactive tracks from every query's softmax — the
    masked-shape equivalent of the reference slicing them out
    (md_tracker.py:617-626); same semantics as the flash path's segment
    ids (tracker/blocks.py::_tpu_flash_attention).

    kv: optional separate key/value source. Either a full packed-qkv array
    (B, Nk, 3C) whose q third is ignored, or a slim (B, Nk, 2C) K/V-only
    array. Used by the track-sharded path (parallel/shard_kernels.py),
    where each device holds a query shard and all-gathers ONLY the 2C
    key/value lanes of the other shards: queries come from the local
    `qkv`, keys/values from the gathered `kv`. key_mask then has length Nk.
    """
    B, N, C3 = qkv.shape
    C = C3 // 3
    kv_arr = qkv if kv is None else kv
    assert kv_arr.shape[-1] in (2 * C, 3 * C), kv_arr.shape
    # lane-block offset of the K third inside kv: 1 for packed qkv, 0 for
    # a slim K/V-only array
    kv_off = kv_arr.shape[-1] // C - 2
    Nk = kv_arr.shape[1]
    Np = -(-N // 128) * 128
    Nkp = -(-Nk // 128) * 128
    if not block_q:
        # Np/4 = 32*(Np/128): always a multiple of 8 and divides Np
        block_q = Np // 4
    assert Np % block_q == 0 and block_q % 8 == 0
    if Np != N:
        qkv = jnp.pad(qkv, ((0, 0), (0, Np - N), (0, 0)))
    if kv is not None and Nkp != Nk:
        kv_arr = jnp.pad(kv_arr, ((0, 0), (0, Nkp - Nk), (0, 0)))
    elif kv is None:
        kv_arr = qkv  # share the query-side padding
        Nkp = Np
    if key_mask is None:
        mrow = jnp.ones((1, Nkp), jnp.float32)
    else:
        mrow = jnp.pad(key_mask.astype(jnp.float32), (0, Nkp - Nk))[None]

    grid = (B, Np // block_q)
    # Double-buffered f32 K/V residency at the production shape needs ~19 MB
    # of VMEM — over Mosaic's default 16 MB *scoped* limit but well inside
    # the chip's 128 MB. Raise the scoped cap (hardware OOM observed
    # 2026-08-18: "exceeded scoped vmem limit by 32.0K" at (12, 2432, 1152)).
    out = pl.pallas_call(
        functools.partial(
            _fused_qkv_kernel, scale=scale, n_valid=Nk, heads=heads,
            qk_bf16=qk_bf16,
        ),
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        in_specs=[
            pl.BlockSpec((1, block_q, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nkp, C), lambda b, i: (b, 0, kv_off),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nkp, C), lambda b, i: (b, 0, kv_off + 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nkp), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, C), qkv.dtype),
        interpret=interpret,
    )(qkv, kv_arr, kv_arr, mrow)
    return out[:, :N]


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, n_valid):
    q = q_ref[0].astype(jnp.float32)           # (BQ, D)
    k = k_ref[0].astype(jnp.float32)           # (N, D)
    v = v_ref[0]                                # (N, D)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                   # (BQ, N)
    n_ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(n_ids < n_valid, logits, -1e30)
    m = logits.max(axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    s = p.sum(axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        (p / s).astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


def vmem_attention(
    q: jnp.ndarray,  # (B, N, D)  (fold heads into B)
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    block_q: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax(q k^T * scale) v with K/V VMEM-resident per batch row."""
    B, N, D = q.shape
    n_pad = (-N) % block_q
    if n_pad:
        q = jnp.pad(q, ((0, 0), (0, n_pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, n_pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, n_pad), (0, 0)))
    Np = N + n_pad

    grid = (B, Np // block_q)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, n_valid=N),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, D), q.dtype),
        interpret=interpret,
    )(q, k, v)
    return out[:, :N]
