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
