"""UniDepthV2 (metric mono-depth + intrinsics) in Flax.

TPU-native re-implementation of the reference's vendored UniDepth model
(UniDepth/unidepth/models/unidepthv2/{unidepthv2.py, decoder.py} and
unidepth/layers/*), the stage-0 metric-depth provider driven by
UniDepth/scripts/demo_mega-sam.py.  Released checkpoints
(lpiccinelli/unidepth-v2-vitl14) convert weight-for-weight with
`convert_unidepth_checkpoint`.

Only the inference path is reproduced — the reference pipeline uses
exactly `UniDepthV2.infer` (demo_mega-sam.py:48); training extras
(losses, EMA, DDP) are dead weight there.

TPU-first deviations (documented, all gated):
- The reference's 6 decoder self-attention blocks use xformers Nyström
  attention (128 landmarks) — a GPU-memory approximation.  At the
  decoder's sequence length (~2.4k tokens) exact attention is a single
  MXU-friendly matmul, faster *and* exact, so it is the default; the
  faithful Nyström path (`use_nystrom=True`) reproduces the landmark
  approximation (segment means + iterative Moore-Penrose pinv) for
  checkpoint-parity experiments.
- `F.interpolate(..., antialias=True)` resizes map to
  `jax.image.resize` (also kernel-antialiased on downsample).

Reference call stack mirrored here (unidepthv2.py:202-284):
    infer: normalize -> shape-constrained resize -> encoder (DINOv2-L/14,
    all-layer cls+patch tokens, final-norm) -> decoder
    {camera head -> K; global head -> (scale, shift); depth head ->
     log-depth + confidence} -> layernorm/exp/scale-shift/softplus ->
    resize back + K rescale.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from batrack_tpu.depth.dpt import (ARCHS, IMAGENET_MEAN, IMAGENET_STD, PATCH,
                                   _cache_hit, _cache_put,
                                   DINOv2, _conv, _lin)
from batrack_tpu.ops.sampling import interpolate_bilinear

# config_v2_vitl14.json
HIDDEN = 512
NUM_HEADS = 8
EXPANSION = 4
DEC_DEPTHS = (6, 0, 0)
CAMERA_DIM = 96
# 1-indexed encoder tap layers per arch (pixel_encoder.output_idx in
# configs/config_v2_{vitl,vits}14.json)
OUT_IDX_BY_ARCH = {"vitl": (21, 22, 23, 24), "vits": (9, 10, 11, 12)}
OUT_IDX = OUT_IDX_BY_ARCH["vitl"]  # back-compat alias
PIXELS_BOUNDS = (1400, 2400)  # patch-count bounds (shape_constraints)
RATIO_BOUNDS = (0.66, 2.0)
NUM_LANDMARKS = 128


# ---------------------------------------------------------------------------
# functional pieces (pure, shape-static)
# ---------------------------------------------------------------------------

def generate_rays(K: jnp.ndarray, hw: Tuple[int, int]):
    """Unit ray directions + (theta, phi) angles per pixel
    (unidepth/utils/geometric.py:13-53). K: (B, 3, 3) pinhole."""
    H, W = hw
    xs = jnp.arange(W, dtype=jnp.float32) + 0.5
    ys = jnp.arange(H, dtype=jnp.float32) + 0.5
    px, py = jnp.meshgrid(xs, ys)  # (H, W)
    fx, fy = K[:, 0, 0], K[:, 1, 1]
    cx, cy = K[:, 0, 2], K[:, 1, 2]
    x = (px.reshape(-1)[None] - cx[:, None]) / fx[:, None]  # (B, HW)
    y = (py.reshape(-1)[None] - cy[:, None]) / fy[:, None]
    ones = jnp.ones_like(x)
    rays = jnp.stack([x, y, ones], -1)
    rays = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
    theta = jnp.arctan2(rays[..., 0], rays[..., 2])
    phi = jnp.arccos(jnp.clip(rays[..., 1], -1.0, 1.0))
    return rays, jnp.stack([theta, phi], -1)


def spherical_zbuffer_to_euclidean(sph: jnp.ndarray) -> jnp.ndarray:
    """(theta, phi, z) -> (x, y, z) (geometric.py:57-73)."""
    theta, phi, z = sph[..., 0], sph[..., 1], sph[..., 2]
    x = z * jnp.tan(theta)
    y = z / jnp.tan(phi) / jnp.cos(theta)
    return jnp.stack([x, y, z], -1)


def fourier_features(x: jnp.ndarray, dim: int, max_freq: int) -> jnp.ndarray:
    """Log-spaced sin features, original concatenated
    (utils/positional_embedding.py:218-256, use_log=True, cat_orig=True)."""
    input_dim = x.shape[-1]
    num_bands = dim // input_dim
    scales = 2.0 ** jnp.linspace(0.0, math.log2(max_freq), num_bands)
    h = x[..., None] * scales * math.pi
    h = jnp.sin(h).reshape(*x.shape[:-1], input_dim * num_bands)
    return jnp.concatenate([h, x], -1)


def flat_interpolate(x: jnp.ndarray, old: Tuple[int, int],
                     new: Tuple[int, int]) -> jnp.ndarray:
    """(B, old_h*old_w, C) -> (B, new_h*new_w, C) bilinear
    (geometric.py:228-252)."""
    if tuple(old) == tuple(new):
        return x
    B, _, C = x.shape
    img = x.reshape(B, old[0], old[1], C)
    img = jax.image.resize(img, (B, new[0], new[1], C), method="linear")
    return img.reshape(B, new[0] * new[1], C)


def sine_pos_embed(hw: Tuple[int, int], dim: int) -> np.ndarray:
    """DETR sine embedding, normalized (layers/positional_encoding.py:14-58).
    Returns (1, H*W, dim) with channels [y(dim/2), x(dim/2)]."""
    H, W = hw
    npf = dim // 2
    scale = 2 * math.pi
    y = (np.arange(1, H + 1, dtype=np.float32) / (H + 1e-6) * scale)
    x = (np.arange(1, W + 1, dtype=np.float32) / (W + 1e-6) * scale)
    dim_t = 10000.0 ** (2 * (np.arange(npf, dtype=np.float32) // 2) / npf)
    py = y[:, None, None] / dim_t  # (H, 1, npf)
    px = x[None, :, None] / dim_t  # (1, W, npf)
    py, px = np.broadcast_to(py, (H, W, npf)), np.broadcast_to(px, (H, W, npf))

    def interleave(p):
        return np.stack([np.sin(p[..., 0::2]), np.cos(p[..., 1::2])],
                        -1).reshape(H, W, npf)

    pos = np.concatenate([interleave(py), interleave(px)], -1)
    return pos.reshape(1, H * W, dim)


def _upsample2x_align_corners(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, 2H, 2W, C), torch UpsamplingBilinear2d
    (align_corners=True) semantics."""
    x = jnp.moveaxis(x, -1, 1)
    x = interpolate_bilinear(x, (x.shape[2] * 2, x.shape[3] * 2),
                             align_corners=True)
    return jnp.moveaxis(x, 1, -1)


def _pixel_shuffle2(x: jnp.ndarray) -> jnp.ndarray:
    """torch PixelShuffle(2) on NHWC: channel c*4+i*2+j -> (2h+i, 2w+j, c)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H, W, C // 4, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(B, 2 * H, 2 * W, C // 4)


def _iterative_pinv(a: jnp.ndarray, iters: int = 6) -> jnp.ndarray:
    """Newton-Schulz Moore-Penrose pseudo-inverse of a row-stochastic
    matrix (Nystromformer eq. 16; xformers nystrom.py)."""
    m = a.shape[-1]
    eye = jnp.eye(m, dtype=a.dtype)
    z = a.swapaxes(-1, -2) / (
        jnp.max(jnp.sum(jnp.abs(a), -1), -1)[..., None, None]
        * jnp.max(jnp.sum(jnp.abs(a), -2), -1)[..., None, None]
    )
    for _ in range(iters):
        az = a @ z
        z = 0.25 * z @ (13 * eye - az @ (15 * eye - az @ (7 * eye - az)))
    return z


def _nystrom_attention(q, k, v, landmarks: int = NUM_LANDMARKS):
    """Nystrom-approximated softmax attention (q, k, v: (B, h, n, d)).
    Landmarks are count-weighted segment means, so a trailing partial
    segment stays unbiased."""
    B, h, n, d = q.shape
    m = min(landmarks, n)
    if m >= n:
        attn = jax.nn.softmax(q @ k.swapaxes(-1, -2) / math.sqrt(d), -1)
        return attn @ v
    seg = -(-n // m)  # ceil
    pad = seg * m - n
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
    counts = jnp.clip(
        n - jnp.arange(m) * seg, 1, seg
    ).astype(q.dtype)  # real elements per segment (empty -> zero landmark)
    q_l = qp.reshape(B, h, m, seg, d).sum(-2) / counts[None, None, :, None]
    k_l = kp.reshape(B, h, m, seg, d).sum(-2) / counts[None, None, :, None]
    s = 1.0 / math.sqrt(d)
    k1 = jax.nn.softmax(q @ k_l.swapaxes(-1, -2) * s, -1)       # (.., n, m)
    k2 = jax.nn.softmax(q_l @ k_l.swapaxes(-1, -2) * s, -1)     # (.., m, m)
    k3 = jax.nn.softmax(q_l @ k.swapaxes(-1, -2) * s, -1)       # (.., m, n)
    return k1 @ (_iterative_pinv(k2) @ (k3 @ v))


# ---------------------------------------------------------------------------
# layers (unidepth/layers/*)
# ---------------------------------------------------------------------------

class UDMLP(nn.Module):
    """layers/mlp.py (gated=False everywhere in the v2 decoder)."""

    dim: int
    expansion: int = 4
    output_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = self.output_dim or self.dim
        h = nn.LayerNorm(name="norm", dtype=self.dtype)(x)
        h = nn.Dense(int(self.dim * self.expansion), name="proj1",
                     dtype=self.dtype)(h)
        h = nn.gelu(h, approximate=False)
        return nn.Dense(out, name="proj2", dtype=self.dtype)(h)


class UDAttentionBlock(nn.Module):
    """layers/attention.py:82-175 (layer_scale=1.0 -> LayerScale params);
    `nystrom=True` adds the landmark approximation of layers/
    nystrom_attention.py for the self-attention path."""

    dim: int
    heads: int = 4
    expansion: int = 4
    context_dim: Optional[int] = None
    nystrom: bool = False
    use_nystrom: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, pos_embed=None,
                 pos_embed_context=None):
        ctx = x if context is None else context
        h = nn.LayerNorm(name="norm_attnx", dtype=self.dtype)(x)
        c = nn.LayerNorm(name="norm_attnctx", dtype=self.dtype)(ctx)
        kv = nn.Dense(2 * self.dim, name="kv", dtype=self.dtype)(c)
        q = nn.Dense(self.dim, name="q", dtype=self.dtype)(h)

        B, N, _ = q.shape
        M = c.shape[1]
        hd = self.dim // self.heads
        # torch layout "(kv h d)": k occupies channels [0, dim)
        k = kv[..., : self.dim].reshape(B, M, self.heads, hd).swapaxes(1, 2)
        v = kv[..., self.dim:].reshape(B, M, self.heads, hd).swapaxes(1, 2)
        qh = q.reshape(B, N, self.heads, hd).swapaxes(1, 2)
        if pos_embed is not None:
            qh = qh + pos_embed.reshape(B, N, self.heads, hd).swapaxes(1, 2)
        if pos_embed_context is not None:
            k = k + pos_embed_context.reshape(
                B, M, self.heads, hd).swapaxes(1, 2)

        if self.nystrom and self.use_nystrom:
            o = _nystrom_attention(qh, k, v)
        else:
            attn = jax.nn.softmax(
                qh @ k.swapaxes(-1, -2) / math.sqrt(hd), axis=-1
            )
            o = attn @ v
        o = o.swapaxes(1, 2).reshape(B, N, self.dim)
        o = nn.Dense(self.dim, name="out", dtype=self.dtype)(o)
        ls1 = self.param("ls1_gamma", nn.initializers.ones, (self.dim,))
        x = x + o * ls1
        h = UDMLP(self.dim, self.expansion, dtype=self.dtype, name="mlp")(x)
        ls2 = self.param("ls2_gamma", nn.initializers.ones, (self.dim,))
        return x + h * ls2


class CvnxtBlock(nn.Module):
    """layers/convnext.py (kernel 7, layer_scale=1.0)."""

    dim: int
    kernel: int = 7
    expansion: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        h = nn.Conv(self.dim, (self.kernel, self.kernel),
                    feature_group_count=self.dim, padding=self.kernel // 2,
                    name="dwconv", dtype=self.dtype)(x)
        h = nn.LayerNorm(name="norm", dtype=self.dtype)(h)
        h = nn.Dense(self.expansion * self.dim, name="pwconv1",
                     dtype=self.dtype)(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="pwconv2", dtype=self.dtype)(h)
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,))
        return x + h * gamma


class ConvUpsampleShuffleResidual(nn.Module):
    """layers/upsample.py:85-134: 2 ConvNeXt blocks -> (PixelShuffle ->
    depthwise 7x7 -> ReLU -> 3x3) + (1x1 -> bilinear x2) residual."""

    dim: int
    expansion: int = 4
    kernel: int = 7
    num_layers: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, C) -> (B, 4HW, C//2)
        for i in range(self.num_layers):
            x = CvnxtBlock(self.dim, self.kernel, self.expansion,
                           dtype=self.dtype, name=f"conv{i}")(x)
        up = _pixel_shuffle2(x)
        up = nn.Conv(self.dim // 4, (7, 7), feature_group_count=self.dim // 4,
                     padding=3, name="up_dw", dtype=self.dtype)(up)
        up = nn.relu(up)
        up = nn.Conv(self.dim // 2, (3, 3), padding=1, name="up_pw",
                     dtype=self.dtype)(up)
        res = nn.Conv(self.dim // 2, (1, 1), name="residual",
                      dtype=self.dtype)(x)
        res = _upsample2x_align_corners(res)
        out = up + res
        B, H, W, C = out.shape
        return out.reshape(B, H * W, C)


class ListAdapter(nn.Module):
    """decoder.py:13-29: per-chunk LayerNorm -> Linear -> GELU."""

    input_dims: Tuple[int, ...]
    hidden_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
        outs = []
        for i, x in enumerate(xs):
            h = nn.LayerNorm(name=f"norm{i}", dtype=self.dtype)(x)
            h = nn.Dense(self.hidden_dim, name=f"proj{i}", dtype=self.dtype)(h)
            outs.append(nn.gelu(h, approximate=False))
        return outs


# ---------------------------------------------------------------------------
# decoder heads (decoder.py)
# ---------------------------------------------------------------------------

class CameraHead(nn.Module):
    """decoder.py:32-88: two 1-head cross-attention aggregations of 4
    learned latents over features, -> (fx, fy, cx, cy) activations."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: List[jnp.ndarray], cls_tokens: jnp.ndarray,
                 pos_embed: jnp.ndarray) -> jnp.ndarray:
        B = cls_tokens.shape[0]
        cls_tokens = UDMLP(HIDDEN, 4, dtype=self.dtype,
                           name="project_cls")(cls_tokens)
        latents_pos = self.param(
            "latents_pos", nn.initializers.normal(1.0), (1, 4, HIDDEN))
        latents_pos = jnp.broadcast_to(latents_pos, (B, 4, HIDDEN))
        feats = UDMLP(HIDDEN, 2, dtype=self.dtype, name="in_features")(
            jnp.concatenate(features, 1) + pos_embed
        )
        feats = jnp.concatenate([feats, cls_tokens], 1)
        x = UDAttentionBlock(HIDDEN, 1, EXPANSION, dtype=self.dtype,
                             name="aggregate1")(
            cls_tokens, context=feats, pos_embed=latents_pos)
        x = UDAttentionBlock(HIDDEN, 1, EXPANSION, dtype=self.dtype,
                             name="aggregate2")(
            x, context=feats, pos_embed=latents_pos)
        x = UDMLP(HIDDEN, 2, output_dim=1, dtype=self.dtype,
                  name="out")(x)[..., 0]  # (B, 4)
        fx, fy = jnp.exp(x[:, 0]), jnp.exp(x[:, 1])
        cx, cy = jax.nn.sigmoid(x[:, 2]), jax.nn.sigmoid(x[:, 3])
        K = jnp.zeros((B, 3, 3), self.dtype)
        K = K.at[:, 0, 0].set(fx).at[:, 1, 1].set(fy)
        K = K.at[:, 0, 2].set(cx).at[:, 1, 2].set(cy).at[:, 2, 2].set(1.0)
        return K


def _embed_rays(rays: jnp.ndarray, original: Tuple[int, int],
                shapes: Tuple[int, int]) -> jnp.ndarray:
    """Ray fourier embedding at a feature resolution (decoder.py:112-123)."""
    r = flat_interpolate(rays, original, shapes)
    r = r / jnp.linalg.norm(r, axis=-1, keepdims=True)
    return fourier_features(r, CAMERA_DIM, max(shapes) // 2)


class GlobalHead(nn.Module):
    """decoder.py:91-148: scale/shift from 2 cls tokens + ray-conditioned
    features."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: List[jnp.ndarray], cls_tokens: jnp.ndarray,
                 rays: jnp.ndarray, original: Tuple[int, int],
                 shapes: Tuple[int, int]):
        cls_tokens = UDMLP(HIDDEN, 4, dtype=self.dtype,
                           name="project_cls")(cls_tokens)
        re = nn.Dense(HIDDEN, name="project_rays", dtype=self.dtype)(
            _embed_rays(rays, original, shapes))
        re = jnp.tile(re, (1, len(features), 1))
        feats = nn.Dense(HIDDEN, name="in_features", dtype=self.dtype)(
            jnp.concatenate(features, 1) + re)
        feats = jnp.concatenate([feats, cls_tokens], 1)
        x = UDAttentionBlock(HIDDEN, 1, EXPANSION, dtype=self.dtype,
                             name="aggregate1")(cls_tokens, context=feats)
        x = UDAttentionBlock(HIDDEN, 1, EXPANSION, dtype=self.dtype,
                             name="aggregate2")(x, context=feats)
        x = UDMLP(HIDDEN, 2, output_dim=1, dtype=self.dtype,
                  name="out")(x)[..., 0]  # (B, 2)
        scale = jnp.exp(x[:, 0]).reshape(-1, 1, 1, 1)
        shift = x[:, 1].reshape(-1, 1, 1, 1)
        return scale, shift


class DepthHead(nn.Module):
    """decoder.py:151-345: latent init + feature/camera aggregation, 3
    upsampling levels with ray-conditioned processing, multi-scale
    depth/confidence MLPs fused by 7x7 reflect convs."""

    use_nystrom: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: List[jnp.ndarray], rays_hr: jnp.ndarray,
                 pos_embed: jnp.ndarray, level_embed: jnp.ndarray,
                 original: Tuple[int, int], shapes: Tuple[int, int]):
        B = features[0].shape[0]
        nlev = len(DEC_DEPTHS)

        rays_embeddings = [
            nn.Dense(HIDDEN // 2 ** i, name=f"rays_layer{i}",
                     dtype=self.dtype)(
                _embed_rays(rays_hr, original,
                            (shapes[0] * 2 ** i, shapes[1] * 2 ** i)))
            for i in range(nlev)
        ]

        # init latents from pooled features (pool is identity for ViT since
        # every level lives at common_shape)
        feats_cat = nn.Dense(HIDDEN, name="features_channel_cat",
                             dtype=self.dtype)(
            jnp.concatenate(features, -1))
        latents = feats_cat + UDMLP(HIDDEN, 2, dtype=self.dtype,
                                    name="to_latents")(feats_cat)
        latents = UDAttentionBlock(
            HIDDEN, 1, EXPANSION, context_dim=HIDDEN, dtype=self.dtype,
            name="aggregate_16",
        )(latents, context=jnp.concatenate(features, 1),
          pos_embed_context=pos_embed + level_embed)
        latents = UDAttentionBlock(
            HIDDEN, 1, EXPANSION, context_dim=HIDDEN, dtype=self.dtype,
            name="prompt_camera",
        )(latents, context=rays_embeddings[0])

        out_features = []
        for i, depth in enumerate(DEC_DEPTHS):
            dim = HIDDEN // 2 ** i
            for j in range(depth):
                latents = UDAttentionBlock(
                    dim, NUM_HEADS // 2 ** i, EXPANSION, nystrom=True,
                    use_nystrom=self.use_nystrom, dtype=self.dtype,
                    name=f"process_{i}_{j}",
                )(latents, pos_embed=rays_embeddings[i])
            h, w = shapes[0] * 2 ** i, shapes[1] * 2 ** i
            img = (latents + rays_embeddings[i]).reshape(B, h, w, dim)
            latents = ConvUpsampleShuffleResidual(
                dim, EXPANSION, dtype=self.dtype, name=f"up{i}")(img)
            out_features.append(
                latents.reshape(B, 2 * h, 2 * w, dim // 2))

        def fuse(kind):
            maps = []
            for i in reversed(range(nlev)):
                m = UDMLP(HIDDEN // 2 ** (i + 1), 1, output_dim=16,
                          dtype=self.dtype, name=f"{kind}_mlp{i}")(
                    out_features[i])
                m = jnp.moveaxis(m, -1, 1)
                m = interpolate_bilinear(m, original, align_corners=False)
                maps.append(jnp.moveaxis(m, 1, -1))
            cat = jnp.concatenate(maps, -1)
            cat = jnp.pad(cat, ((0, 0), (3, 3), (3, 3), (0, 0)),
                          mode="reflect")
            return nn.Conv(1, (7, 7), padding=0, name=f"to_{kind}",
                           dtype=self.dtype)(cat)[..., 0]

        logdepth = fuse("depth")
        confidence = jax.nn.sigmoid(fuse("confidence"))
        return logdepth, confidence, latents


class Decoder(nn.Module):
    """decoder.py:347-585 orchestration for the ViT (single-resolution)
    encoder: camera -> rays -> global scale/shift -> depth."""

    use_nystrom: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: List[jnp.ndarray],
                 camera_cls: List[jnp.ndarray],
                 global_cls: List[jnp.ndarray],
                 image_hw: Tuple[int, int],
                 shapes: Tuple[int, int],
                 rays_gt: Optional[jnp.ndarray] = None):
        B = features[0].shape[0]
        H, W = image_hw
        nres = len(features)
        dims = (features[0].shape[-1],) * nres  # ListAdapter is dim-lazy

        features = ListAdapter(dims, HIDDEN, dtype=self.dtype,
                               name="input_adapter")(features)

        level_embeds = self.param(
            "level_embeds", nn.initializers.normal(1.0), (nres, HIDDEN))
        le = nn.Dense(HIDDEN, name="level_embed_0", dtype=self.dtype)(
            level_embeds)
        le = nn.gelu(le, approximate=False)
        le = nn.Dense(HIDDEN, name="level_embed_2", dtype=self.dtype)(le)
        le = nn.LayerNorm(name="level_embed_3", dtype=self.dtype)(le)
        hw = shapes[0] * shapes[1]
        level_embed = jnp.concatenate(
            [jnp.broadcast_to(le[i], (B, hw, HIDDEN)) for i in range(nres)], 1)
        pos_embed = jnp.tile(
            jnp.asarray(sine_pos_embed(shapes, HIDDEN), self.dtype),
            (1, nres, 1))

        cam_cls = ListAdapter((dims[0],) * 4, HIDDEN, dtype=self.dtype,
                              name="camera_token_adapter")(camera_cls)
        K = CameraHead(dtype=self.dtype, name="camera_layer")(
            features, jnp.concatenate(cam_cls, 1),
            pos_embed + level_embed)
        s = max(H, W) / 2
        K = K * jnp.asarray(
            [[s, 1, W], [1, s, H], [1, 1, 1]], self.dtype)[None]
        rays = rays_gt if rays_gt is not None else generate_rays(K, (H, W))[0]

        glob_cls = ListAdapter((dims[0],) * 2, HIDDEN, dtype=self.dtype,
                               name="global_token_adapter")(global_cls)
        scale, shift = GlobalHead(dtype=self.dtype, name="global_layer")(
            features, jnp.concatenate(glob_cls, 1), rays, (H, W), shapes)

        logdepth, confidence, depth_features = DepthHead(
            self.use_nystrom, dtype=self.dtype, name="depth_layer",
        )(features, rays, pos_embed, level_embed, (H, W), shapes)

        # norm in log space, then scale-invariant shift (decoder.py:506-515)
        mu = logdepth.mean((-2, -1), keepdims=True)
        var = ((logdepth - mu) ** 2).mean((-2, -1), keepdims=True)
        depth = jnp.exp((logdepth - mu) * jax.lax.rsqrt(var + 1e-5))
        depth = (depth[:, None] + shift) * scale
        depth = jax.nn.softplus(depth * 10.0) / 10.0
        return {"depth": depth[:, 0], "confidence": confidence, "K": K,
                "depth_features": depth_features, "rays": rays}


class UniDepthV2(nn.Module):
    """Full network: DINOv2/14 encoder + decoder (unidepthv2.py:119-200).

    arch selects the released checkpoint family: "vitl" (unidepth-v2-vitl14,
    the reference pipeline's model) or "vits" (unidepth-v2-vits14,
    configs/config_v2_vits14.json — same decoder, 12-block dim-384 trunk).

    `__call__` takes an ImageNet-normalized (B, H, W, 3) image whose sides
    are multiples of 14 (the `infer` driver handles the shape-constrained
    resize) and optional gt rays, and returns depth/K/confidence at the
    network resolution.
    """

    arch: str = "vitl"
    use_nystrom: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 rays_gt: Optional[jnp.ndarray] = None):
        B, H, W, _ = x.shape
        shapes = (H // PATCH, W // PATCH)
        take = [i - 1 for i in OUT_IDX_BY_ARCH[self.arch]]
        # interpolate_offset=0.0: UniDepth's encoder factory disables the
        # DINOv2 +0.1 kludge (models/encoder.py:188 -> size-mode interp)
        outs = DINOv2(self.arch, self.dtype, interpolate_offset=0.0,
                      name="pixel_encoder")(x, take)
        features = [t for t, _ in outs]
        cls = [c[:, None] for _, c in outs]  # (B, 1, C) each
        # stacking_fn="last" over slices (0,21),(21,22),(22,23),(23,24)
        # selects exactly layers 21..24; camera tokens are cls 22,24,23(x2)
        # per unidepthv2.py:245-247 ([-3,-2,-1] of all-layer cls + stacked
        # tokens[-2])
        camera_cls = [cls[1], cls[2], cls[3], cls[2]]
        global_cls = [cls[2], cls[3]]
        return Decoder(self.use_nystrom, dtype=self.dtype,
                       name="pixel_decoder")(
            features, camera_cls, global_cls, (H, W), shapes, rays_gt)


# ---------------------------------------------------------------------------
# inference driver (unidepthv2.py:202-284)
# ---------------------------------------------------------------------------

def _infer_shape(hw: Tuple[int, int],
                 resolution_level: Optional[int] = None,
                 pixels_bounds: Tuple[int, int] = PIXELS_BOUNDS):
    """Shape-constrained network resolution (unidepthv2.py:56-93).

    The patch count is FORCED to the level's bound regardless of the input
    size — reference-identical: _get_level_resolution sets pixels_bounds to
    [bound, bound] (unidepthv2.py:61-66), so clamp(n, bound, bound) == bound.
    pixels_bounds mirrors the reference's config-driven shape_constraints
    (config_v2_vitl14.json data.shape_constraints.pixels_bounds).
    """
    H, W = hw
    lo, hi = pixels_bounds
    level = 10 if resolution_level is None else min(max(resolution_level, 0), 10)
    bound = lo + math.ceil((hi - lo) * level / 10)
    ratio = W / H
    if not (RATIO_BOUNDS[0] <= ratio <= RATIO_BOUNDS[1]):
        import warnings

        warnings.warn(
            f"input aspect ratio {ratio:.3f} is outside the training "
            f"distribution {RATIO_BOUNDS}; metric depth/intrinsics may "
            f"degrade (unidepthv2.py:33-41)"
        )
    n = min(max((H / PATCH) * (W / PATCH), bound), bound)
    h = math.ceil(math.sqrt(n / ratio) - 0.5)
    w = math.ceil(h * ratio - 0.5)
    return (h * PATCH, w * PATCH), h * PATCH / H


_RUN_CACHE: dict = {}  # LRU (shared helpers in dpt.py); entries pin executables


def _run_fn(model, h, w, H, W, ratio, with_K, outputs):
    """One jitted end-to-end inference graph per (shape, gt-K, outputs)
    bucket, so a video sequence compiles exactly once. Everything —
    including the ray generation and spherical back-projection to 3D points
    (unidepthv2.py:273-280) — lives inside the jit: running those eagerly
    cost ~700 ms/frame of per-op dispatch round-trips on the tunneled TPU.
    `outputs` prunes both compute and the device->host transfer (the full
    f32 points+confidence maps are ~7.6 MB/frame at 518x924 — consumers
    like the .npz writer only keep depth+K)."""
    key = (id(model), h, w, H, W, ratio, with_K, outputs)
    if not _cache_hit(_RUN_CACHE, key):
        def run(params, img, K_gt, K_exact):
            # K_gt is the host-rescaled K for the (h, w) network input;
            # K_exact is the caller's ORIGINAL K, used verbatim for the
            # full-resolution back-projection — the reference backprojects
            # through the original gt tensor (unidepthv2.py:273-276), and an
            # in-graph scale-then-unscale f32 round-trip would perturb the
            # 'points' output by ~1 ulp of the intrinsics
            img = jax.image.resize(img, (1, h, w, 3), method="linear")
            rays = (generate_rays(K_gt, (h, w))[0]
                    if K_gt is not None else None)
            out = model.apply(params, img, rays)
            depth = interpolate_bilinear(
                out["depth"][:, None], (H, W), align_corners=False)[:, 0]
            K = out["K"] / jnp.asarray(
                [[ratio, 1, ratio], [1, ratio, ratio], [1, 1, 1]],
                jnp.float32)
            K_out = K_exact if K_exact is not None else K
            res = {"depth": depth, "intrinsics": K_out}
            if "confidence" in outputs:
                res["confidence"] = interpolate_bilinear(
                    out["confidence"][:, None], (H, W),
                    align_corners=False)[:, 0]
            if "points" in outputs:
                angles = generate_rays(K_out, (H, W))[1].reshape(1, H, W, 2)
                res["points"] = spherical_zbuffer_to_euclidean(
                    jnp.concatenate([angles, depth[..., None]], -1))
            return res

        _cache_put(_RUN_CACHE, key, jax.jit(run))
    return _RUN_CACHE[key]


def infer(model: UniDepthV2, params, image: np.ndarray,
          intrinsics: Optional[np.ndarray] = None,
          resolution_level: Optional[int] = None,
          pixels_bounds: Tuple[int, int] = PIXELS_BOUNDS,
          outputs: Tuple[str, ...] = ("depth", "intrinsics", "confidence",
                                      "points")):
    """uint8 RGB (H, W, 3) -> {depth (H, W), intrinsics (3, 3),
    confidence (H, W), points (H, W, 3)} at the original resolution.
    `outputs` selects which of them to compute/transfer (depth and
    intrinsics are always produced)."""
    H, W = image.shape[:2]
    (h, w), ratio = _infer_shape((H, W), resolution_level, pixels_bounds)
    x = (image.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD

    K_in = K_exact = None
    if intrinsics is not None:
        K_exact = np.asarray(intrinsics, np.float32)[None]
        K_in = K_exact.copy()
        K_in[:, :2] *= ratio

    outs = tuple(sorted(set(outputs) | {"depth", "intrinsics"}))
    run = _run_fn(model, h, w, H, W, ratio, K_in is not None, outs)
    res = run(params, jnp.asarray(x[None]),
              None if K_in is None else jnp.asarray(K_in),
              None if K_exact is None else jnp.asarray(K_exact))
    res = {k: np.asarray(v[0]) for k, v in res.items()}
    if intrinsics is not None:
        # caller-provided K passes through EXACTLY (the in-graph
        # scale/unscale round-trip only feeds the ray generation); matches
        # the reference, which returns pred_intrinsics but backprojects
        # through the original gt tensor (unidepthv2.py:273-276)
        res["intrinsics"] = np.asarray(intrinsics)
    return res


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------

def _ln(sd, k):
    return {"scale": sd[f"{k}.weight"], "bias": sd[f"{k}.bias"]}


def _dense(sd, k, bias=True):
    out = {"kernel": _lin(sd[f"{k}.weight"])}
    if bias:
        out["bias"] = sd[f"{k}.bias"]
    return out


def _cv(sd, k):
    return {"kernel": _conv(sd[f"{k}.weight"]), "bias": sd[f"{k}.bias"]}


def _mlp(sd, k):
    return {"norm": _ln(sd, f"{k}.norm"), "proj1": _dense(sd, f"{k}.proj1"),
            "proj2": _dense(sd, f"{k}.proj2")}


def _attn_block(sd, k):
    return {
        "norm_attnx": _ln(sd, f"{k}.norm_attnx"),
        "norm_attnctx": _ln(sd, f"{k}.norm_attnctx"),
        "kv": _dense(sd, f"{k}.kv", bias=f"{k}.kv.bias" in sd),
        "q": _dense(sd, f"{k}.q", bias=f"{k}.q.bias" in sd),
        "out": _dense(sd, f"{k}.out"),
        "mlp": _mlp(sd, f"{k}.mlp"),
        "ls1_gamma": sd[f"{k}.ls1.gamma"],
        "ls2_gamma": sd[f"{k}.ls2.gamma"],
    }


def _adapter(sd, k, n):
    out = {}
    for i in range(n):
        out[f"norm{i}"] = _ln(sd, f"{k}.input_adapters.{i}.0")
        out[f"proj{i}"] = _dense(sd, f"{k}.input_adapters.{i}.1")
    return out


def _cvnxt(sd, k):
    return {
        "dwconv": _cv(sd, f"{k}.dwconv"),
        "norm": _ln(sd, f"{k}.norm"),
        "pwconv1": _dense(sd, f"{k}.pwconv1"),
        "pwconv2": _dense(sd, f"{k}.pwconv2"),
        "gamma": sd[f"{k}.gamma"],
    }


def _to_np(sd):
    def np_(v):
        try:
            return v.detach().cpu().numpy()
        except AttributeError:
            return np.asarray(v)

    return {k: np_(v) for k, v in sd.items()}


def convert_unidepth_checkpoint(sd, arch: str = "vitl") -> dict:
    """UniDepthV2 (v2-vitl14 / v2-vits14) torch state_dict -> flax params."""
    sd = _to_np(sd)
    # dinov2 block-chunking (backbones/dinov2.py BlockChunk): keys are
    # blocks.<chunk>.<global_idx>.* with identity padding preserving the
    # global index — flatten to blocks.<global_idx>.*
    import re

    sd = {re.sub(r"(pixel_encoder\.blocks)\.\d+\.(\d+\.)", r"\1.\2", k): v
          for k, v in sd.items()}
    return {"params": {
        "pixel_encoder": _convert_encoder(sd, arch=arch),
        "pixel_decoder": _convert_decoder(sd),
    }}


def _convert_encoder(sd, p="pixel_encoder.", arch="vitl"):
    dim, depth, _, _ = ARCHS[arch]
    enc = {
        "patch_embed": _cv(sd, f"{p}patch_embed.proj"),
        "cls_token": sd[f"{p}cls_token"],
        "pos_embed": sd[f"{p}pos_embed"],
        "norm": _ln(sd, f"{p}norm"),
    }
    for i in range(depth):
        b = f"{p}blocks.{i}"
        enc[f"block{i}"] = {
            "norm1": _ln(sd, f"{b}.norm1"),
            "norm2": _ln(sd, f"{b}.norm2"),
            "qkv": _dense(sd, f"{b}.attn.qkv"),
            "proj": _dense(sd, f"{b}.attn.proj"),
            "fc1": _dense(sd, f"{b}.mlp.fc1"),
            "fc2": _dense(sd, f"{b}.mlp.fc2"),
            # init_values=None disables LayerScale (metadinov2/block.py:64);
            # released v2 checkpoints carry it (dinov2.py:412 init_values=1.0)
            "ls1_gamma": sd.get(f"{b}.ls1.gamma", np.ones(dim, np.float32)),
            "ls2_gamma": sd.get(f"{b}.ls2.gamma", np.ones(dim, np.float32)),
        }
    return enc


def _convert_decoder(sd, d="pixel_decoder"):
    camera = {
        "project_cls": _mlp(sd, f"{d}.camera_layer.project_cls"),
        "in_features": _mlp(sd, f"{d}.camera_layer.in_features"),
        "out": _mlp(sd, f"{d}.camera_layer.out"),
        "aggregate1": _attn_block(sd, f"{d}.camera_layer.aggregate1"),
        "aggregate2": _attn_block(sd, f"{d}.camera_layer.aggregate2"),
        "latents_pos": sd[f"{d}.camera_layer.latents_pos"],
    }
    glob = {
        "project_cls": _mlp(sd, f"{d}.global_layer.project_cls"),
        "in_features": _dense(sd, f"{d}.global_layer.in_features"),
        "project_rays": _dense(sd, f"{d}.global_layer.project_rays"),
        "out": _mlp(sd, f"{d}.global_layer.out"),
        "aggregate1": _attn_block(sd, f"{d}.global_layer.aggregate1"),
        "aggregate2": _attn_block(sd, f"{d}.global_layer.aggregate2"),
    }
    dh = {
        "to_latents": _mlp(sd, f"{d}.depth_layer.to_latents"),
        "features_channel_cat": _dense(
            sd, f"{d}.depth_layer.features_channel_cat"),
        "aggregate_16": _attn_block(sd, f"{d}.depth_layer.aggregate_16"),
        "prompt_camera": _attn_block(sd, f"{d}.depth_layer.prompt_camera"),
    }
    for i in range(len(DEC_DEPTHS)):
        dh[f"rays_layer{i}"] = _dense(sd, f"{d}.depth_layer.rays_layers.{i}")
        up = f"{d}.depth_layer.ups.{i}"
        dh[f"up{i}"] = {
            "conv0": _cvnxt(sd, f"{up}.convs.0"),
            "conv1": _cvnxt(sd, f"{up}.convs.1"),
            "up_dw": _cv(sd, f"{up}.up.1"),
            "up_pw": _cv(sd, f"{up}.up.3"),
            "residual": _cv(sd, f"{up}.residual.0"),
        }
        dh[f"depth_mlp{i}"] = _mlp(sd, f"{d}.depth_layer.depth_mlp.{i}")
        dh[f"confidence_mlp{i}"] = _mlp(
            sd, f"{d}.depth_layer.confidence_mlp.{i}")
        for j in range(DEC_DEPTHS[i]):
            dh[f"process_{i}_{j}"] = _attn_block(
                sd, f"{d}.depth_layer.process_layers.{i}.{j}")
    dh["to_depth"] = _cv(sd, f"{d}.depth_layer.to_depth")
    dh["to_confidence"] = _cv(sd, f"{d}.depth_layer.to_confidence")

    dec = {
        "input_adapter": _adapter(sd, f"{d}.input_adapter", 4),
        "camera_token_adapter": _adapter(sd, f"{d}.camera_token_adapter", 4),
        "global_token_adapter": _adapter(sd, f"{d}.global_token_adapter", 2),
        "camera_layer": camera,
        "global_layer": glob,
        "depth_layer": dh,
        "level_embeds": sd[f"{d}.level_embeds"],
        "level_embed_0": _dense(sd, f"{d}.level_embed_layer.0"),
        "level_embed_2": _dense(sd, f"{d}.level_embed_layer.2"),
        "level_embed_3": _ln(sd, f"{d}.level_embed_layer.3"),
    }
    return dec
