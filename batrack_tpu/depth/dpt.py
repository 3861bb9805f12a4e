"""DepthAnythingV2 (DINOv2 ViT encoder + DPT head) in Flax.

Architecture mirror of the reference's vendored model
(Depth-Anything/depth_anything_v2/{dinov2.py, dpt.py, util/blocks.py},
driven by run_videos_v2.py) so released checkpoints convert
weight-for-weight (`convert_da2_checkpoint`). This provides the stage-1
relative-disparity provider as a TPU-native network instead of an external
torch process; the metric provider (UniDepth) remains an external .npz
producer (SURVEY.md §7.7).

Inference preprocessing (resize to lower-bound 518 multiple-of-14, ImageNet
normalization) matches dpt.py:image2tensor.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

ARCHS = {
    # name: (embed_dim, depth, heads, intermediate layer ids)
    "vits": (384, 12, 6, [2, 5, 8, 11]),
    "vitb": (768, 12, 12, [2, 5, 8, 11]),
    "vitl": (1024, 24, 16, [4, 11, 17, 23]),
}
PATCH = 14
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class ViTBlock(nn.Module):
    dim: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # pre-norm + LayerScale (dinov2_layers/block.py)
        h = nn.LayerNorm(epsilon=1e-6, name="norm1", dtype=self.dtype)(x)
        B, N, C = h.shape
        hd = C // self.heads
        qkv = nn.Dense(3 * C, name="qkv", dtype=self.dtype)(h)
        q, k, v = jnp.moveaxis(qkv.reshape(B, N, 3, self.heads, hd), 2, 0)
        q, k, v = (jnp.moveaxis(t, 1, 2) for t in (q, k, v))
        attn = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q, k) * hd ** -0.5, axis=-1
        )
        o = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        o = nn.Dense(C, name="proj", dtype=self.dtype)(
            jnp.moveaxis(o, 1, 2).reshape(B, N, C)
        )
        ls1 = self.param("ls1_gamma", nn.initializers.ones, (C,))
        x = x + o * ls1

        h = nn.LayerNorm(epsilon=1e-6, name="norm2", dtype=self.dtype)(x)
        h = nn.Dense(4 * C, name="fc1", dtype=self.dtype)(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(C, name="fc2", dtype=self.dtype)(h)
        ls2 = self.param("ls2_gamma", nn.initializers.ones, (C,))
        return x + h * ls2


def _torch_bicubic_matrix(n_in: int, n_out: int, inv_scale: float) -> np.ndarray:
    """(n_out, n_in) interpolation matrix with torch's EXACT bicubic
    semantics: cubic convolution A=-0.75 (vs jax.image.resize's Keys A=-0.5),
    half-pixel mapping src = (dst + 0.5) * inv_scale - 0.5, border-clamped
    taps, NO antialiasing on downscale (F.interpolate default). inv_scale is
    n_in/n_out in size mode, or 1/scale_factor in scale-factor mode (the
    DINOv2 +0.1-offset kludge, dinov2.py:191-203)."""
    A = -0.75
    W = np.zeros((n_out, n_in), np.float64)
    for i in range(n_out):
        src = (i + 0.5) * inv_scale - 0.5
        f = np.floor(src)
        t = src - f
        for k in range(-1, 3):
            x = abs(k - t)
            if x <= 1.0:
                w = (A + 2) * x ** 3 - (A + 3) * x ** 2 + 1
            elif x < 2.0:
                w = A * x ** 3 - 5 * A * x ** 2 + 8 * A * x - 4 * A
            else:
                continue
            W[i, int(np.clip(f + k, 0, n_in - 1))] += w
    return W.astype(np.float32)


class DINOv2(nn.Module):
    """ViT trunk with bicubic pos-embed interpolation (dinov2.py:178-211).

    interpolate_offset: DepthAnything's DINOv2 factory uses the historical
    0.1 scale-factor kludge (Depth-Anything dinov2.py:414,191-203);
    UniDepth's uses 0.0 = plain size mode (UniDepth
    models/encoder.py:188, backbones/dinov2.py: size branch).
    """

    arch: str = "vitl"
    dtype: jnp.dtype = jnp.float32
    interpolate_offset: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, take: Sequence[int]):
        """x: (B, H, W, 3) normalized. Returns [(tokens (B,N,C), cls (B,C))]
        at the requested block indices, final-norm applied."""
        dim, depth, heads, _ = ARCHS[self.arch]
        B, H, W, _ = x.shape
        ph, pw = H // PATCH, W // PATCH

        feats = nn.Conv(
            dim, (PATCH, PATCH), strides=PATCH, padding=0, name="patch_embed",
            dtype=self.dtype,
        )(x)  # (B, ph, pw, C)
        tokens = feats.reshape(B, ph * pw, dim)

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, dim))
        pos = self.param(
            "pos_embed", nn.initializers.zeros, (1, 37 * 37 + 1, dim)
        )  # 518/14 = 37 per side at pretrain resolution

        # interpolate_pos_encoding (dinov2.py:179-211): torch-exact bicubic
        # resize of the patch grid (A=-0.75, no antialias); the weight
        # matrices are trace-time constants, applied as two matmuls
        n_pre = pos.shape[1] - 1
        side = int(round(float(np.sqrt(n_pre))))
        patch_pos = pos[:, 1:].reshape(1, side, side, dim)
        if (ph, pw) != (side, side):
            if self.interpolate_offset:
                inv_h = side / (ph + self.interpolate_offset)
                inv_w = side / (pw + self.interpolate_offset)
            else:
                inv_h, inv_w = side / ph, side / pw
            Wh = jnp.asarray(_torch_bicubic_matrix(side, ph, inv_h))
            Ww = jnp.asarray(_torch_bicubic_matrix(side, pw, inv_w))
            patch_pos = jnp.einsum(
                "hm,bmnd,wn->bhwd", Wh, patch_pos, Ww,
                precision=jax.lax.Precision.HIGHEST,
            )
        pos_full = jnp.concatenate(
            [pos[:, :1], patch_pos.reshape(1, ph * pw, dim)], axis=1
        )

        xtok = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, dim)), tokens], axis=1
        ) + pos_full

        outs = []
        take = set(int(i) for i in take)
        for i in range(depth):
            xtok = ViTBlock(dim, heads, self.dtype, name=f"block{i}")(xtok)
            if i in take:
                outs.append(xtok)

        norm = nn.LayerNorm(epsilon=1e-6, name="norm", dtype=self.dtype)
        outs = [norm(o) for o in outs]
        return [(o[:, 1:], o[:, 0]) for o in outs]


class ResidualConvUnit(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding=1, name="conv1", dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, name="conv2", dtype=self.dtype)(h)
        return x + h


class FeatureFusionBlock(nn.Module):
    """util/blocks.py:83-130 (align_corners=True upsampling)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None, out_hw=None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, self.dtype, name="resConfUnit1")(skip)
        x = ResidualConvUnit(self.features, self.dtype, name="resConfUnit2")(x)
        if out_hw is None:
            out_hw = (x.shape[1] * 2, x.shape[2] * 2)
        from batrack_tpu.ops.sampling import interpolate_bilinear

        x = jnp.moveaxis(x, -1, 1)
        x = interpolate_bilinear(x, out_hw, align_corners=True)
        x = jnp.moveaxis(x, 1, -1)
        return nn.Conv(self.features, (1, 1), name="out_conv", dtype=self.dtype)(x)


class DPTHead(nn.Module):
    """dpt.py:38-151 (use_clstoken=False, the DA2 configuration)."""

    in_channels: int
    features: int = 256
    out_channels: Tuple[int, ...] = (256, 512, 1024, 1024)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: List[Tuple[jnp.ndarray, jnp.ndarray]], ph: int, pw: int):
        outs = []
        for i, (tok, _cls) in enumerate(feats):
            B, N, C = tok.shape
            x = tok.reshape(B, ph, pw, C)
            x = nn.Conv(self.out_channels[i], (1, 1), name=f"project{i}",
                        dtype=self.dtype)(x)
            if i == 0:
                x = nn.ConvTranspose(
                    self.out_channels[0], (4, 4), strides=(4, 4),
                    name="resize0", dtype=self.dtype,
                )(x)
            elif i == 1:
                x = nn.ConvTranspose(
                    self.out_channels[1], (2, 2), strides=(2, 2),
                    name="resize1", dtype=self.dtype,
                )(x)
            elif i == 3:
                x = nn.Conv(self.out_channels[3], (3, 3), strides=2, padding=1,
                            name="resize3", dtype=self.dtype)(x)
            outs.append(x)

        rn = [
            nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    name=f"layer{i + 1}_rn", dtype=self.dtype)(outs[i])
            for i in range(4)
        ]

        p4 = FeatureFusionBlock(self.features, self.dtype, name="refinenet4")(
            rn[3], out_hw=rn[2].shape[1:3]
        )
        p3 = FeatureFusionBlock(self.features, self.dtype, name="refinenet3")(
            p4, rn[2], out_hw=rn[1].shape[1:3]
        )
        p2 = FeatureFusionBlock(self.features, self.dtype, name="refinenet2")(
            p3, rn[1], out_hw=rn[0].shape[1:3]
        )
        p1 = FeatureFusionBlock(self.features, self.dtype, name="refinenet1")(
            p2, rn[0]
        )

        x = nn.Conv(self.features // 2, (3, 3), padding=1, name="output_conv1",
                    dtype=self.dtype)(p1)
        from batrack_tpu.ops.sampling import interpolate_bilinear

        x = jnp.moveaxis(x, -1, 1)
        x = interpolate_bilinear(x, (ph * PATCH, pw * PATCH), align_corners=True)
        x = jnp.moveaxis(x, 1, -1)
        x = nn.Conv(32, (3, 3), padding=1, name="output_conv2_0", dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(1, (1, 1), name="output_conv2_2", dtype=self.dtype)(x)
        return nn.relu(x[..., 0])


class DepthAnythingV2(nn.Module):
    """Relative-disparity network (dpt.py:153-220)."""

    arch: str = "vitl"
    features: int = 256
    out_channels: Tuple[int, ...] = (256, 512, 1024, 1024)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, H, W, 3) ImageNet-normalized, H/W multiples of 14.
        Returns relative disparity (B, H, W)."""
        dim, _, _, take = ARCHS[self.arch]
        ph, pw = x.shape[1] // PATCH, x.shape[2] // PATCH
        feats = DINOv2(self.arch, self.dtype, name="pretrained")(x, take)
        return DPTHead(dim, self.features, self.out_channels, self.dtype,
                       name="depth_head")(feats, ph, pw)


# ---------------------------------------------------------------------------
# preprocessing + inference driver
# ---------------------------------------------------------------------------

def preprocess(image: np.ndarray, input_size: int = 518) -> np.ndarray:
    """uint8 RGB (H, W, 3) -> normalized (1, H', W', 3), lower-bound resize to
    input_size with both sides multiples of 14 (dpt.py:189-205)."""
    import cv2

    h, w = image.shape[:2]
    scale = input_size / min(h, w)

    def mult14(v):
        return max(int(np.round(v / 14) * 14), input_size if v * scale == input_size else 14)

    nh = int(np.round(h * scale / 14) * 14)
    nw = int(np.round(w * scale / 14) * 14)
    nh, nw = max(nh, input_size), max(nw, input_size)
    img = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_CUBIC)
    img = (img.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    return img[None]


_INFER_CACHE: dict = {}
_INFER_CACHE_MAX = 16  # LRU cap: each entry pins a compiled executable


def _cache_hit(cache: dict, key) -> bool:
    """LRU lookup: on hit, move the key to the end (most-recent) so
    alternating over >cap buckets evicts least-recently-USED, not oldest.
    Shared by the dpt and unidepth executable caches."""
    if key in cache:
        cache[key] = cache.pop(key)
        return True
    return False


def _cache_put(cache: dict, key, value, cap: int = _INFER_CACHE_MAX):
    if len(cache) >= cap:
        cache.pop(next(iter(cache)))  # dicts iterate in insertion order
    cache[key] = value
    return value


def infer_depth(model, params, image: np.ndarray, input_size: int = 518) -> np.ndarray:
    """Full-resolution relative disparity for a uint8 RGB image.

    The forward + output resize run as ONE jitted graph per (model, shape)
    bucket — eager model.apply dispatches every op individually, which on a
    tunneled TPU costs per-op round trips (the same fix as unidepth._run_fn;
    a video sequence compiles exactly once)."""
    from batrack_tpu.ops.sampling import interpolate_bilinear

    x = jnp.asarray(preprocess(image, input_size))
    h, w = image.shape[:2]
    key = (id(model), x.shape, h, w)
    if not _cache_hit(_INFER_CACHE, key):
        def run(p, xx):
            disp = model.apply(p, xx)  # (1, H', W')
            return interpolate_bilinear(disp, (h, w), align_corners=True)

        _cache_put(_INFER_CACHE, key, jax.jit(run))
    return np.asarray(_INFER_CACHE[key](params, x)[0])


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------

def _conv(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _convT(w):
    # torch ConvTranspose2d (in, out, kh, kw) -> flax (kh, kw, out?, ...):
    # flax ConvTranspose kernel is (kh, kw, in, out) applied as the transpose
    # of a conv whose kernel is flipped; torch stores the conv-gradient
    # kernel directly, so flip spatial dims and swap io.
    w = np.asarray(w)
    w = np.flip(w, axis=(2, 3))
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))


def _lin(w):
    return np.transpose(np.asarray(w), (1, 0))


def convert_da2_checkpoint(sd, arch: str = "vitl") -> dict:
    """DepthAnythingV2 torch state_dict -> flax params."""
    def np_(v):
        try:
            return v.detach().cpu().numpy()
        except AttributeError:
            return np.asarray(v)

    sd = {k: np_(v) for k, v in sd.items()}
    dim, depth, _, _ = ARCHS[arch]

    pre = {
        "patch_embed": {
            "kernel": _conv(sd["pretrained.patch_embed.proj.weight"]),
            "bias": sd["pretrained.patch_embed.proj.bias"],
        },
        "cls_token": sd["pretrained.cls_token"],
        "pos_embed": sd["pretrained.pos_embed"],
        "norm": {"scale": sd["pretrained.norm.weight"],
                 "bias": sd["pretrained.norm.bias"]},
    }
    for i in range(depth):
        b = f"pretrained.blocks.{i}"
        pre[f"block{i}"] = {
            "norm1": {"scale": sd[f"{b}.norm1.weight"], "bias": sd[f"{b}.norm1.bias"]},
            "norm2": {"scale": sd[f"{b}.norm2.weight"], "bias": sd[f"{b}.norm2.bias"]},
            "qkv": {"kernel": _lin(sd[f"{b}.attn.qkv.weight"]),
                    "bias": sd[f"{b}.attn.qkv.bias"]},
            "proj": {"kernel": _lin(sd[f"{b}.attn.proj.weight"]),
                     "bias": sd[f"{b}.attn.proj.bias"]},
            "fc1": {"kernel": _lin(sd[f"{b}.mlp.fc1.weight"]),
                    "bias": sd[f"{b}.mlp.fc1.bias"]},
            "fc2": {"kernel": _lin(sd[f"{b}.mlp.fc2.weight"]),
                    "bias": sd[f"{b}.mlp.fc2.bias"]},
            "ls1_gamma": sd[f"{b}.ls1.gamma"],
            "ls2_gamma": sd[f"{b}.ls2.gamma"],
        }

    def rcu(prefix):
        return {
            "conv1": {"kernel": _conv(sd[f"{prefix}.conv1.weight"]),
                      "bias": sd[f"{prefix}.conv1.bias"]},
            "conv2": {"kernel": _conv(sd[f"{prefix}.conv2.weight"]),
                      "bias": sd[f"{prefix}.conv2.bias"]},
        }

    head = {}
    for i in range(4):
        head[f"project{i}"] = {
            "kernel": _conv(sd[f"depth_head.projects.{i}.weight"]),
            "bias": sd[f"depth_head.projects.{i}.bias"],
        }
    head["resize0"] = {"kernel": _convT(sd["depth_head.resize_layers.0.weight"]),
                       "bias": sd["depth_head.resize_layers.0.bias"]}
    head["resize1"] = {"kernel": _convT(sd["depth_head.resize_layers.1.weight"]),
                       "bias": sd["depth_head.resize_layers.1.bias"]}
    head["resize3"] = {"kernel": _conv(sd["depth_head.resize_layers.3.weight"]),
                       "bias": sd["depth_head.resize_layers.3.bias"]}
    for i in range(4):
        head[f"layer{i + 1}_rn"] = {
            "kernel": _conv(sd[f"depth_head.scratch.layer{i + 1}_rn.weight"])
        }
    for i in range(1, 5):
        block = {
            "resConfUnit2": rcu(f"depth_head.scratch.refinenet{i}.resConfUnit2"),
            "out_conv": {
                "kernel": _conv(sd[f"depth_head.scratch.refinenet{i}.out_conv.weight"]),
                "bias": sd[f"depth_head.scratch.refinenet{i}.out_conv.bias"],
            },
        }
        if i != 4:
            # refinenet4 has no skip input; its resConfUnit1 exists in torch
            # checkpoints but is never executed (dpt.py:141 path_4 call)
            block["resConfUnit1"] = rcu(
                f"depth_head.scratch.refinenet{i}.resConfUnit1"
            )
        head[f"refinenet{i}"] = block
    head["output_conv1"] = {
        "kernel": _conv(sd["depth_head.scratch.output_conv1.weight"]),
        "bias": sd["depth_head.scratch.output_conv1.bias"],
    }
    head["output_conv2_0"] = {
        "kernel": _conv(sd["depth_head.scratch.output_conv2.0.weight"]),
        "bias": sd["depth_head.scratch.output_conv2.0.bias"],
    }
    head["output_conv2_2"] = {
        "kernel": _conv(sd["depth_head.scratch.output_conv2.2.weight"]),
        "bias": sd["depth_head.scratch.output_conv2.2.bias"],
    }

    return {"params": {"pretrained": pre, "depth_head": head}}
