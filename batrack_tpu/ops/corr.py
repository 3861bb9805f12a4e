"""Correlation pyramid ops for the point tracker.

The reference CorrBlock (main/frontend/core/cotracker/blocks.py:326-385)
materialises an all-pairs correlation volume corr = <f_track, fmap> of shape
(B, S, N, H, W) per pyramid level (~1.4 GB at SLAM sizes) and then bilinearly
samples a (2r+1)^2 window of it per track.

On TPU we exploit linearity of the dot product: bilinearly sampling the
correlation volume at float coords equals the dot product of the track feature
with the bilinearly-sampled feature map. So we gather only the (2r+2)^2
feature-window per track (via `patchify`) and contract with the track feature
— ~100x less FLOPs, no giant volume in HBM, and the contraction is a batched
matmul on the MXU. `corr_sample_fused` is numerically identical to
CorrBlock.corr + CorrBlock.sample.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from batrack_tpu.ops.sampling import avg_pool2d, patchify


def build_pyramid(fmaps: jnp.ndarray, num_levels: int) -> list:
    """List of average-pooled feature maps, level i has H/2^i (blocks.py:332-341).

    fmaps: (S, C, H, W).
    """
    pyramid = [fmaps]
    for _ in range(num_levels - 1):
        fmaps = avg_pool2d(fmaps, 2, 2)
        pyramid.append(fmaps)
    return pyramid


def corr_sample_level(
    fmaps: jnp.ndarray,   # (S, C, H, W) one pyramid level
    targets: jnp.ndarray, # (S, N, C) per-track features
    coords: jnp.ndarray,  # (S, N, 2) track coords at level-0 resolution / 2^level
    radius: int,
) -> jnp.ndarray:
    """Fused correlation sampling for one level. Returns (S, N, (2r+1)^2)."""
    C = fmaps.shape[1]
    d = 2 * radius + 1
    # (S, N, C, d, d) bilinear feature windows; zero padding to match the
    # reference CorrBlock.sample (grid_sample padding_mode='zeros')
    windows = patchify(fmaps, coords, radius, padding_mode="zeros")
    # contract feature dim on the MXU
    corr = jnp.einsum(
        "snchw,snc->snhw", windows, targets, precision=jax.lax.Precision.HIGHEST
    )
    corr = corr / jnp.sqrt(jnp.asarray(C, corr.dtype))
    # the reference flattens the window TRANSPOSED: its delta grid is
    # meshgrid(dy, dx) but the centroid add is (x, y) (blocks.py:352-362), so
    # out[i, j] reads the volume at (x+off_i, y+off_j). The checkpoint is
    # trained with that layout — reproduce it.
    corr = jnp.swapaxes(corr, -1, -2)
    return corr.reshape(corr.shape[0], corr.shape[1], d * d)


def corr_sample_pyramid(
    pyramid: list,          # [(S, C, H_l, W_l)]
    targets: jnp.ndarray,   # (S, N, C)
    coords: jnp.ndarray,    # (S, N, 2) at level-0 resolution
    radius: int,
) -> jnp.ndarray:
    """All levels concatenated: (S, N, L*(2r+1)^2).

    Equivalent to CorrBlock.corr(targets) followed by CorrBlock.sample(coords)
    (blocks.py:343-369): the window center at level l is coords / 2^l.
    """
    outs = []
    for lvl, fmaps in enumerate(pyramid):
        outs.append(corr_sample_level(fmaps, targets, coords / (2.0 ** lvl), radius))
    return jnp.concatenate(outs, axis=-1)
