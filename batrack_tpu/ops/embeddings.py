"""Positional embeddings (sincos + NeRF-style Fourier), pure JAX/numpy.

Mirrors main/frontend/core/embeddings.py exactly — the tracker checkpoint
conversion relies on identical embedding values.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def get_1d_sincos_pos_embed_from_grid(embed_dim: int, pos) -> np.ndarray:
    """(M,) positions -> (M, D) sincos embedding (embeddings.py:45-63)."""
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000**omega
    pos = np.asarray(pos).reshape(-1)
    out = np.einsum("m,d->md", pos, omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_2d_sincos_pos_embed_from_grid(embed_dim: int, grid) -> np.ndarray:
    assert embed_dim % 2 == 0
    emb_h = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[0])
    emb_w = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1)


def get_2d_sincos_pos_embed(embed_dim: int, grid_size) -> np.ndarray:
    """(H*W, D) grid embedding (embeddings.py:10-31)."""
    if isinstance(grid_size, tuple):
        gh, gw = grid_size
    else:
        gh = gw = grid_size
    grid_h = np.arange(gh, dtype=np.float32)
    grid_w = np.arange(gw, dtype=np.float32)
    grid = np.meshgrid(grid_w, grid_h)  # w goes first
    grid = np.stack(grid, axis=0).reshape([2, 1, gh, gw])
    return get_2d_sincos_pos_embed_from_grid(embed_dim, grid)


def _sincos_nd(x: jnp.ndarray, C: int) -> jnp.ndarray:
    """Interleaved sin/cos of each channel of x against C/2 frequencies.

    x: (..., D). Returns (..., D*C) with per-dim blocks [sin/cos interleaved],
    matching get_3d_embedding's pe layout (embeddings.py:117-144).
    """
    div_term = (jnp.arange(0, C, 2, dtype=jnp.float32) * (1000.0 / C)).reshape(
        (1,) * (x.ndim - 1) + (C // 2,)
    )
    outs = []
    for i in range(x.shape[-1]):
        v = x[..., i : i + 1] * div_term  # (..., C/2)
        pe = jnp.zeros(x.shape[:-1] + (C,), x.dtype)
        pe = pe.at[..., 0::2].set(jnp.sin(v))
        pe = pe.at[..., 1::2].set(jnp.cos(v))
        outs.append(pe)
    return jnp.concatenate(outs, axis=-1)


def get_2d_embedding(xy: jnp.ndarray, C: int, cat_coords: bool = True) -> jnp.ndarray:
    pe = _sincos_nd(xy, C)
    if cat_coords:
        pe = jnp.concatenate([xy, pe], axis=-1)  # note: coords first (ref :112-113)
    return pe


def get_3d_embedding(xyz: jnp.ndarray, C: int, cat_coords: bool = True) -> jnp.ndarray:
    pe = _sincos_nd(xyz, C)
    if cat_coords:
        pe = jnp.concatenate([pe, xyz], axis=-1)  # coords last (ref :141-143)
    return pe


def get_4d_embedding(xyzw: jnp.ndarray, C: int, cat_coords: bool = True) -> jnp.ndarray:
    pe = _sincos_nd(xyzw, C)
    if cat_coords:
        pe = jnp.concatenate([pe, xyzw], axis=-1)
    return pe


def get_nd_embedding(coords: jnp.ndarray, C: int, cat_coords: bool = True) -> jnp.ndarray:
    pe = _sincos_nd(coords, C)
    if cat_coords:
        pe = jnp.concatenate([pe, coords], axis=-1)
    return pe


class FourierEmbedder:
    """NeRF-style Fourier embedding (embeddings.py:206-257, Embedder_Fourier)."""

    def __init__(
        self,
        input_dim: int,
        max_freq_log2: float,
        N_freqs: int,
        log_sampling: bool = True,
        include_input: bool = True,
    ):
        self.input_dim = input_dim
        self.include_input = include_input
        if log_sampling:
            self.freq_bands = list(2.0 ** np.linspace(0.0, max_freq_log2, N_freqs))
        else:
            self.freq_bands = list(np.linspace(2.0**0.0, 2.0**max_freq_log2, N_freqs))
        self.out_dim = input_dim * (include_input + 2 * N_freqs)

    def __call__(self, x: jnp.ndarray, rescale: float = 1.0) -> jnp.ndarray:
        out = []
        if self.include_input:
            out.append(x / rescale)
        for freq in self.freq_bands:
            out.append(jnp.sin(x * freq))
            out.append(jnp.cos(x * freq))
        return jnp.concatenate(out, axis=-1)
