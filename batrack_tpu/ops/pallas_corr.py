"""Pallas TPU kernel: fused correlation-window sampling.

The tracker needs, for every track and frame, the dot product of the track
feature with a bilinearly-sampled (2r+1)^2 window of the feature map — the
op the reference implements as cuda_corr (altcorr/correlation_kernel.cu) and
the CorrBlock materialises as an all-pairs volume (blocks.py:326-385).

XLA's gather for this access pattern measures ~80 ms per pyramid call at SLAM
sizes. This kernel keeps one frame's feature map resident in VMEM (bf16, a
few MB) and walks the tracks, so HBM sees each feature map exactly once.

Mosaic constraints shape the implementation:
  * dynamic offsets on the sublane (second-minor) axis must be 8-aligned, so
    the window load takes an aligned 16-wide slab and the residual horizontal
    shift is folded into the bilinear blend as a small iota-built selection
    matmul;
  * vector loads/stores at per-track offsets are done in aligned groups of
    GROUP tracks (statically unrolled within the group; 32 measured fastest,
    scripts/corr_ab.py);
  * per-track coordinates are scalars and live in SMEM where dynamic
    indexing is unrestricted.

The per-track serial loop dominates the kernel's cost, and it is the same
loop at every pyramid level (the window size is level-independent), so the
small levels are FUSED into one kernel: one track loop computes all their
windows, amortising the scalar address math, the target load, and the loop
control across levels. Level 0's feature map is too large to co-reside with
double buffering, so it runs as its own call.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# static track unroll per serial-loop step: hardware A/B (scripts/corr_ab.py,
# 2026-08-18, v5e): 8 -> 9.26 ms/pyramid, 16 -> 8.15, 32 -> 7.54 (bit-exact);
# 32 amortises the scalar address math best without spilling vregs
GROUP = 32

# fused-group VMEM budget for the padded bf16 feature maps (double-buffered
# by Mosaic alongside the targets block and the per-level output blocks)
_FUSE_BUDGET_BYTES = 4 * 1024 * 1024


def _corr_kernel_multi(coords_ref, targets_ref, lvl_scale_ref, *refs, radius,
                       block_n, out_dim, dims, scales, group=GROUP,
                       contract="vpu"):
    """One (frame, track-block) program over `len(dims)` pyramid levels.

    refs = fmap_ref per level, then out_ref per level. coords are at the
    first level's resolution; level l samples at coords * scales[l].
    lvl_scale_ref (SMEM, (L,)): per-level dequantisation scale folded into
    the 1/sqrt(C) normaliser — 1.0 for bf16 fmaps, amax/127 for int8.
    """
    L = len(dims)
    fmap_refs = refs[:L]
    out_refs = refs[L:]
    D = 2 * radius + 2          # integer taps per axis
    d = 2 * radius + 1          # blended outputs per axis
    SLAB = ((D + 7) // 8 + 1) * 8  # aligned horizontal slab (covers D + shift)
    C = fmap_refs[0].shape[-1]
    S = targets_ref.shape[1]
    inv = np.float32(1.0 / np.sqrt(np.float32(C)))
    # hoist the per-level scalar reads out of the track loop
    lvl_inv = [lvl_scale_ref[l] * inv for l in range(L)]

    # targets are track-major (N, S, C) — the transformer layout, which the
    # output BlockSpec also emits so the tracker never pays an HBM relayout.
    # The per-frame feature row is picked by a one-hot sublane reduction
    # (a dynamic sublane index would need 8-alignment; s is 0..S-1).
    s_onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (1, S, 1), 1) == pl.program_id(0)
    ).astype(jnp.float32)

    # fmap is pre-padded by PAD = 2r+2 ZERO rows/cols (grid_sample
    # padding_mode='zeros', the CorrBlock.sample semantics); clamping the
    # integer centre to [-(r+1), dim-1+r+1] keeps the loads in the padded
    # slab. A window entirely beyond the border is all-zero taps except the
    # left edge, where the clamped centre would let the dx-blend touch the
    # first real column — zero dx/dy there so the result is exactly 0.
    PAD = 2 * radius + 2

    # static row-blend matrix: out rows q = (1-dy)*row[q] + dy*row[q+1]
    row_q = jax.lax.broadcasted_iota(jnp.int32, (d, D), 0)
    row_p = jax.lax.broadcasted_iota(jnp.int32, (d, D), 1)

    col_p = jax.lax.broadcasted_iota(jnp.int32, (SLAB, d), 0)
    col_q = jax.lax.broadcasted_iota(jnp.int32, (SLAB, d), 1)

    def window(fmap_ref, tg_k, cx, cy, Hp, Wp, lsc):
        x0 = jnp.floor(cx)
        y0 = jnp.floor(cy)
        dx = jnp.where(x0 < -(radius + 1), 0.0, cx - x0)
        dy = jnp.where(y0 < -(radius + 1), 0.0, cy - y0)
        xc = jnp.clip(x0.astype(jnp.int32), -(radius + 1), Wp + radius)
        yc = jnp.clip(y0.astype(jnp.int32), -(radius + 1), Hp + radius)
        xi = xc + (PAD - radius)   # padded col of tap (x0 - r)
        yi = yc + (PAD - radius)
        xa = pl.multiple_of((xi // 8) * 8, 8)
        off = xi - xa              # in [0, 8)

        win = fmap_ref[0, pl.ds(yi, D), pl.ds(xa, SLAB), :]  # (D, SLAB, C)
        if contract == "mxu":
            # channel contraction as an MXU matvec: (D, SLAB, C) @ (C, 1)
            # bf16 inputs, f32 accumulate — vs the VPU path's cross-lane
            # reduction (log2(C) shuffle steps per window row)
            # minor-dim insertion must happen on the 32-bit value (Mosaic
            # rejects (C,)->(C,1) reshapes of bf16); cast after
            corr = jax.lax.dot_general(
                win,
                tg_k[:, None].astype(win.dtype),
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )[..., 0] * lsc                                  # (D, SLAB)
        else:
            corr = jnp.sum(
                win.astype(jnp.float32) * tg_k[None, None, :],
                axis=-1,
            ) * lsc                                          # (D, SLAB)

        # horizontal: select cols off..off+d and blend with dx in one
        # matmul  (SLAB, d): S[p, q] = (1-dx)[p==q+off] + dx[p==q+off+1]
        sel = ((col_p == col_q + off).astype(jnp.float32) * (1.0 - dx)
               + (col_p == col_q + off + 1).astype(jnp.float32) * dx)
        cx_blend = jnp.dot(corr, sel, preferred_element_type=jnp.float32)
        # vertical: (d, D) banded blend with dy
        sy = ((row_p == row_q).astype(jnp.float32) * (1.0 - dy)
              + (row_p == row_q + 1).astype(jnp.float32) * dy)
        out = jnp.dot(sy, cx_blend, preferred_element_type=jnp.float32)
        # Mosaic cannot reshape (d, d) -> (d*d,); emit lane-padded rows
        # and flatten outside the kernel
        return jnp.pad(out, ((0, 0), (0, out_dim - d)))[None]

    def body(g, _):
        base = pl.multiple_of(g * group, group)
        tg_full = targets_ref[pl.ds(base, group), :, :]  # (group, S, C)
        tg = jnp.sum(tg_full.astype(jnp.float32) * s_onehot, axis=1)  # (G, C)

        rows = [[] for _ in range(L)]
        for k in range(group):
            cx0 = coords_ref[0, base + k, 0]
            cy0 = coords_ref[0, base + k, 1]
            for lvl in range(L):
                Hp, Wp = dims[lvl]
                sc = np.float32(scales[lvl])
                rows[lvl].append(
                    window(fmap_refs[lvl], tg[k], cx0 * sc, cy0 * sc, Hp, Wp,
                           lvl_inv[lvl])
                )

        for lvl in range(L):
            out_refs[lvl][pl.ds(base, group), 0, :, :] = jnp.concatenate(
                rows[lvl], axis=0
            )
        return 0

    jax.lax.fori_loop(0, block_n // group, body, 0)


def _pad_fmap(fmaps, radius, fmap_dtype="bf16"):
    """Zero-pad one level's (S, C, H, W) maps for aligned slab loads.

    Returns (padded_fmap, dequant_scale). fmap_dtype:
      * "bf16" — default residency (scale 1.0): a full f32 frame
        double-buffered exceeds the ~16 MB VMEM budget at SLAM sizes; the
        contraction accumulates in f32.
      * "int8" — per-level symmetric quantisation (amax/127): halves the
        VMEM window-load bytes again on this load-bound kernel (VERDICT r4
        #6); the dequant scale is folded into the kernel's 1/sqrt(C)
        normaliser. Zero padding is exactly 0 in int8, so the border
        semantics are unchanged.
    """
    pad = 2 * radius + 2
    fm = jnp.moveaxis(fmaps, 1, -1)  # (S, H, W, C)
    # the horizontal slab is SLAB-wide from an 8-aligned start, so the right
    # padding must absorb alignment + slab overshoot (and keep the sublane
    # dim a multiple of 8); extra columns are never selected.
    W = fm.shape[2]
    slab = ((2 * radius + 2 + 7) // 8 + 1) * 8
    w_total = -((-(W + 2 * pad + slab)) // 8) * 8
    fm = jnp.pad(fm, ((0, 0), (pad, pad), (pad, w_total - W - pad), (0, 0)))
    if fmap_dtype == "int8":
        amax = jnp.maximum(jnp.max(jnp.abs(fm)), 1e-12)
        q = jnp.clip(jnp.round(fm * (127.0 / amax)), -127, 127)
        return q.astype(jnp.int8), amax / 127.0
    return fm.astype(jnp.bfloat16), jnp.float32(1.0)


def corr_sample_levels_pallas(
    fmaps_list: Sequence[jnp.ndarray],  # [(S, C, H_l, W_l)] one or more levels
    targets: jnp.ndarray,               # (N, S, C) — track-major
    coords: jnp.ndarray,                # (S, N, 2) at fmaps_list[0] resolution
    radius: int,
    scales: Sequence[float] = None,     # coord scale per level (default 2^-l)
    block_n: int = 256,
    group: int = GROUP,                 # static track unroll per loop step
    interpret: bool = False,
    contract: str = "vpu",              # channel contraction: "vpu" | "mxu"
    fmap_dtype: str = "bf16",           # fmap VMEM residency: "bf16" | "int8"
) -> Sequence[jnp.ndarray]:
    """Fused correlation sampling for a group of pyramid levels.

    Returns one (N, S, (2r+1)^2) array per level. Numerically matches
    ops.corr.corr_sample_level (zero-padded bilinear window times feature,
    reference-transposed flatten, scaled by 1/sqrt(C)) with the feature maps
    read in bf16 (f32 accumulation), or per-level-quantised int8 when
    fmap_dtype="int8" (adds ~amax/254 absolute quantisation noise per
    element, averaged down ~sqrt(C) by the channel sum). Targets and outputs
    are track-major (N, S, ...): the consumer (the tracker's transformer
    input concat) is track-major, and emitting that layout from the kernel's
    output BlockSpec is free, whereas an XLA moveaxis of the (S, N, LRR)
    tensor costs an HBM relayout pass per iteration.
    """
    L = len(fmaps_list)
    S, C, _, _ = fmaps_list[0].shape
    N = targets.shape[0]
    # the kernel's fori_loop runs block_n // group steps; a non-divisible
    # pair would silently leave the tail tracks of every block unwritten
    assert group > 0 and block_n % group == 0, (
        f"group ({group}) must be positive and divide block_n ({block_n})"
    )
    assert not (fmap_dtype == "int8" and contract == "mxu"), (
        "int8 fmaps are only supported on the vpu contraction path"
    )
    d = 2 * radius + 1
    out_dim = 128  # lane-padded row width per output window row
    if scales is None:
        scales = [0.5 ** l for l in range(L)]

    padded = [_pad_fmap(fm, radius, fmap_dtype) for fm in fmaps_list]
    fms = [p[0] for p in padded]
    lvl_scales = jnp.stack([p[1] for p in padded]).astype(jnp.float32)
    dims = tuple((fm.shape[2], fm.shape[3]) for fm in fmaps_list)

    n_pad = (-N) % block_n
    coords_p = jnp.pad(coords, ((0, 0), (0, n_pad), (0, 0))) if n_pad else coords
    targets_p = (jnp.pad(targets, ((0, n_pad), (0, 0), (0, 0)))
                 if n_pad else targets)
    Np = N + n_pad

    grid = (S, Np // block_n)
    outs = pl.pallas_call(
        functools.partial(
            _corr_kernel_multi, radius=radius, block_n=block_n,
            out_dim=out_dim, dims=dims, scales=tuple(scales), group=group,
            contract=contract,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_n, 2), lambda s, nb: (s, nb, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (block_n, S, C), lambda s, nb: (nb, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ] + [
            pl.BlockSpec(
                (1, fm.shape[1], fm.shape[2], C), lambda s, nb: (s, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
            for fm in fms
        ],
        out_specs=[
            pl.BlockSpec(
                (block_n, 1, d, out_dim), lambda s, nb: (nb, s, 0, 0),
                memory_space=pltpu.VMEM,
            )
            for _ in range(L)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, S, d, out_dim), jnp.float32)
            for _ in range(L)
        ],
        interpret=interpret,
    )(coords_p, targets_p, lvl_scales, *fms)

    # kernel windows are [y-offset, x-offset]; the reference layout is the
    # transpose (see ops/corr.py corr_sample_level) — swap before flattening
    return [
        jnp.swapaxes(o[:N, :, :, :d], -1, -2).reshape(N, S, d * d)
        for o in outs
    ]


def corr_sample_level_pallas(
    fmaps: jnp.ndarray,    # (S, C, H, W)
    targets: jnp.ndarray,  # (N, S, C) — track-major (transformer layout)
    coords: jnp.ndarray,   # (S, N, 2) at this level's resolution
    radius: int,
    block_n: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Single-level wrapper: (N, S, (2r+1)^2)."""
    return corr_sample_levels_pallas(
        [fmaps], targets, coords, radius, scales=[1.0],
        block_n=block_n, interpret=interpret,
    )[0]


def corr_sample_pyramid_pallas(
    pyramid: Sequence[jnp.ndarray],  # [(S, C, H_l, W_l)]
    targets: jnp.ndarray,            # (N, S, C) — track-major
    coords: jnp.ndarray,             # (S, N, 2) at level-0 resolution
    radius: int,
    group: int = GROUP,
    block_n: int = 256,
    interpret: bool = False,
    contract: str = "vpu",
    fmap_dtype: str = "bf16",
) -> jnp.ndarray:
    """ops.corr.corr_sample_pyramid in the track-major (N, S, LRR) layout.

    Levels are grouped greedily under a VMEM budget: level 0 (the large map)
    usually runs alone, the small levels share one fused track loop.
    """
    bytes_per = 1 if fmap_dtype == "int8" else 2
    pad_bytes = []
    for fm in pyramid:
        S, C, H, W = fm.shape
        slab = ((2 * radius + 2 + 7) // 8 + 1) * 8
        pad = 2 * radius + 2
        wt = -((-(W + 2 * pad + slab)) // 8) * 8
        pad_bytes.append((H + 2 * pad) * wt * C * bytes_per)

    groups = []  # (start_lvl, [fmaps])
    cur, cur_bytes, cur_start = [], 0, 0
    for lvl, fm in enumerate(pyramid):
        if cur and cur_bytes + pad_bytes[lvl] > _FUSE_BUDGET_BYTES:
            groups.append((cur_start, cur))
            cur, cur_bytes, cur_start = [], 0, lvl
        cur.append(fm)
        cur_bytes += pad_bytes[lvl]
    if cur:
        groups.append((cur_start, cur))

    outs = []
    for start, fms in groups:
        outs.extend(
            corr_sample_levels_pallas(
                fms, targets, coords / (2.0 ** start), radius,
                scales=[0.5 ** l for l in range(len(fms))],
                block_n=block_n, group=group, interpret=interpret,
                contract=contract, fmap_dtype=fmap_dtype,
            )
        )
    return jnp.concatenate(outs, axis=-1)
