"""Track-sharded wrappers for the Pallas kernels.

GSPMD cannot partition a pallas_call, so sharding the tracker's query axis
used to force the slow XLA fallbacks for correlation sampling and space
attention (the r2 design hole: ~8-9x slower corr per ROOFLINE.md). These
wrappers make the kernels mesh-native with explicit shard_map:

* correlation sampling is per-track work — shard the track axis, replicate
  the (small) feature pyramid, zero communication;
* space attention mixes tracks — shard the query rows, all-gather the packed
  key/value rows once per block (the same collective GSPMD inserts for the
  dense path), then run the single-pass VMEM kernel on the local queries
  against the full keys.

Both pad the track axis up to the mesh size; padded tracks are dead weight
(corr results sliced off; padded keys masked out of every softmax).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from batrack_tpu.ops.pallas_attention import fused_qkv_attention
from batrack_tpu.ops.pallas_corr import GROUP, corr_sample_pyramid_pallas


def full_axis(mesh: Mesh):
    """The whole mesh as one logical axis (tuple form for 2D host/chip).

    Duplicated from parallel/sharded_slot_ba.py to keep this module
    import-light: tracker/blocks.py imports it lazily at trace time, and
    pulling in the BA/slam state modules there would create a cycle through
    parallel/__init__ -> sharded_tracker -> tracker.
    """
    names = tuple(mesh.axis_names)
    return names if len(names) > 1 else names[0]


def corr_sample_pyramid_sharded(
    pyramid: Sequence[jnp.ndarray],  # [(S, C, H_l, W_l)] replicated
    targets: jnp.ndarray,            # (N, S, C) track-major
    coords: jnp.ndarray,             # (S, N, 2) at level-0 resolution
    radius: int,
    mesh: Mesh,
    interpret: bool = False,
) -> jnp.ndarray:
    """corr_sample_pyramid_pallas with the track axis sharded over `mesh`.

    Per-track work needs no communication: each device runs the VMEM-resident
    kernel on its track shard against the replicated feature maps. Returns
    (N, S, L*(2r+1)^2) like the unsharded kernel (sharded over tracks via the
    out_specs; XLA keeps it that way for the downstream concat).
    """
    axis = full_axis(mesh)
    nd = mesh.size
    N = targets.shape[0]
    n_pad = (-N) % nd
    if n_pad:
        targets = jnp.pad(targets, ((0, n_pad), (0, 0), (0, 0)))
        coords = jnp.pad(coords, ((0, 0), (0, n_pad), (0, 0)))
    n_loc = (N + n_pad) // nd
    # per-shard block: full 256 when the shard is large, else one
    # GROUP-multiple block covering the shard (avoids 70%+ pad waste at
    # production N/devices ratios like 2400/8 = 300)
    block_n = min(256, -(-n_loc // GROUP) * GROUP)

    def f(tg, cd):
        return corr_sample_pyramid_pallas(
            pyramid, tg, cd, radius, block_n=block_n, interpret=interpret
        )

    # check_vma=False: pallas_call out_shapes carry no varying-mesh-axes
    # annotation, which jax>=0.9 otherwise requires inside shard_map; the
    # outputs are trivially varying over the track axis only
    out = shard_map(
        f, mesh=mesh,
        in_specs=(P(axis), P(None, axis)),
        out_specs=P(axis),
        check_vma=False,
    )(targets, coords)
    return out[:N]


def fused_qkv_attention_sharded(
    qkv: jnp.ndarray,  # (B, N, 3*C) packed projection output
    heads: int,
    scale: float,
    mesh: Mesh,
    key_mask: jnp.ndarray | None = None,  # (N,) bool
    block_q: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """fused_qkv_attention with the query/track axis sharded over `mesh`.

    One all-gather of the K/V lanes per call (the keys/values every query
    needs; B*N*2C bf16 bytes over ICI — the q lanes stay local, 2/3 of the
    naive packed-row gather), then each device runs the single-pass kernel
    for its local queries — padded tracks are masked out of every softmax
    via the key-mask row. Output stays sharded over tracks. Matches the
    SCALING collective_cost_model's (n-1)/n * N * 2C bf16 accounting.
    """
    axis = full_axis(mesh)
    nd = mesh.size
    B, N, C3 = qkv.shape
    C = C3 // 3
    n_pad = (-N) % nd
    if key_mask is None:
        key_mask = jnp.ones((N,), bool)
    if n_pad:
        qkv = jnp.pad(qkv, ((0, 0), (0, n_pad), (0, 0)))
        key_mask = jnp.pad(key_mask, (0, n_pad))  # False: padded keys masked

    def f(qkv_loc, mask_loc):
        kv = jax.lax.all_gather(qkv_loc[:, :, C:], axis, axis=1, tiled=True)
        mask = jax.lax.all_gather(mask_loc, axis, axis=0, tiled=True)
        return fused_qkv_attention(
            qkv_loc, heads, scale, block_q=block_q, interpret=interpret,
            key_mask=mask, kv=kv,
        )

    out = shard_map(
        f, mesh=mesh,
        in_specs=(P(None, axis, None), P(axis)),
        out_specs=P(None, axis, None),
        check_vma=False,  # see corr_sample_pyramid_sharded
    )(qkv, key_mask)
    return out[:, :N]
