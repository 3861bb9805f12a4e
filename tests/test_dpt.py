"""DepthAnythingV2 (Flax) tests: torch parity of the tricky pieces through
the checkpoint converter, structure match, and forward smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

from batrack_tpu.depth.dpt import (
    ARCHS,
    DepthAnythingV2,
    ViTBlock,
    _conv,
    _convT,
    _lin,
    convert_da2_checkpoint,
)


def test_vit_block_parity(rng):
    dim, heads = 64, 4

    class TBlock(tnn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
            self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
            self.qkv = tnn.Linear(dim, 3 * dim)
            self.proj = tnn.Linear(dim, dim)
            self.fc1 = tnn.Linear(dim, 4 * dim)
            self.fc2 = tnn.Linear(4 * dim, dim)
            self.ls1 = tnn.Parameter(torch.rand(dim))
            self.ls2 = tnn.Parameter(torch.rand(dim))

        def forward(self, x):
            h = self.norm1(x)
            B, N, C = h.shape
            qkv = self.qkv(h).reshape(B, N, 3, heads, C // heads).permute(2, 0, 3, 1, 4)
            q, k, v = qkv.unbind(0)
            a = (q @ k.transpose(-2, -1)) * (C // heads) ** -0.5
            o = (a.softmax(-1) @ v).transpose(1, 2).reshape(B, N, C)
            x = x + self.proj(o) * self.ls1
            h = self.norm2(x)
            return x + self.fc2(F.gelu(self.fc1(h))) * self.ls2

    torch.manual_seed(0)
    tb = TBlock().eval()
    x = rng.normal(size=(2, 9, dim)).astype(np.float32)
    with torch.no_grad():
        ref = tb(torch.from_numpy(x)).numpy()

    sd = tb.state_dict()
    params = {"params": {
        "norm1": {"scale": np.asarray(sd["norm1.weight"]), "bias": np.asarray(sd["norm1.bias"])},
        "norm2": {"scale": np.asarray(sd["norm2.weight"]), "bias": np.asarray(sd["norm2.bias"])},
        "qkv": {"kernel": _lin(sd["qkv.weight"]), "bias": np.asarray(sd["qkv.bias"])},
        "proj": {"kernel": _lin(sd["proj.weight"]), "bias": np.asarray(sd["proj.bias"])},
        "fc1": {"kernel": _lin(sd["fc1.weight"]), "bias": np.asarray(sd["fc1.bias"])},
        "fc2": {"kernel": _lin(sd["fc2.weight"]), "bias": np.asarray(sd["fc2.bias"])},
        "ls1_gamma": np.asarray(sd["ls1"]),
        "ls2_gamma": np.asarray(sd["ls2"]),
    }}
    out = ViTBlock(dim, heads).apply(jax.tree.map(jnp.asarray, params), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_conv_transpose_conversion(rng):
    tconv = tnn.ConvTranspose2d(6, 8, 4, stride=4).eval()
    x = rng.normal(size=(1, 6, 5, 7)).astype(np.float32)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x)).numpy()

    import flax.linen as nn

    fl = nn.ConvTranspose(8, (4, 4), strides=(4, 4))
    params = {"params": {
        "kernel": jnp.asarray(_convT(tconv.weight.detach())),
        "bias": jnp.asarray(np.asarray(tconv.bias.detach())),
    }}
    out = fl.apply(params, jnp.asarray(np.moveaxis(x, 1, -1)))
    out = np.moveaxis(np.asarray(out), -1, 1)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def _fake_da2_state_dict(arch="vits"):
    dim, depth, heads, _ = ARCHS[arch]
    t = torch.randn
    sd = {
        "pretrained.patch_embed.proj.weight": t(dim, 3, 14, 14) * 0.02,
        "pretrained.patch_embed.proj.bias": t(dim) * 0.02,
        "pretrained.cls_token": t(1, 1, dim) * 0.02,
        "pretrained.pos_embed": t(1, 37 * 37 + 1, dim) * 0.02,
        "pretrained.norm.weight": torch.ones(dim),
        "pretrained.norm.bias": torch.zeros(dim),
    }
    for i in range(depth):
        b = f"pretrained.blocks.{i}"
        sd.update({
            f"{b}.norm1.weight": torch.ones(dim), f"{b}.norm1.bias": torch.zeros(dim),
            f"{b}.norm2.weight": torch.ones(dim), f"{b}.norm2.bias": torch.zeros(dim),
            f"{b}.attn.qkv.weight": t(3 * dim, dim) * 0.02,
            f"{b}.attn.qkv.bias": torch.zeros(3 * dim),
            f"{b}.attn.proj.weight": t(dim, dim) * 0.02,
            f"{b}.attn.proj.bias": torch.zeros(dim),
            f"{b}.mlp.fc1.weight": t(4 * dim, dim) * 0.02,
            f"{b}.mlp.fc1.bias": torch.zeros(4 * dim),
            f"{b}.mlp.fc2.weight": t(dim, 4 * dim) * 0.02,
            f"{b}.mlp.fc2.bias": torch.zeros(dim),
            f"{b}.ls1.gamma": torch.ones(dim) * 0.1,
            f"{b}.ls2.gamma": torch.ones(dim) * 0.1,
        })
    oc = [256, 512, 1024, 1024]
    for i in range(4):
        sd[f"depth_head.projects.{i}.weight"] = t(oc[i], dim, 1, 1) * 0.02
        sd[f"depth_head.projects.{i}.bias"] = torch.zeros(oc[i])
        sd[f"depth_head.scratch.layer{i + 1}_rn.weight"] = t(256, oc[i], 3, 3) * 0.02
    sd["depth_head.resize_layers.0.weight"] = t(oc[0], oc[0], 4, 4) * 0.02
    sd["depth_head.resize_layers.0.bias"] = torch.zeros(oc[0])
    sd["depth_head.resize_layers.1.weight"] = t(oc[1], oc[1], 2, 2) * 0.02
    sd["depth_head.resize_layers.1.bias"] = torch.zeros(oc[1])
    sd["depth_head.resize_layers.3.weight"] = t(oc[3], oc[3], 3, 3) * 0.02
    sd["depth_head.resize_layers.3.bias"] = torch.zeros(oc[3])
    for i in range(1, 5):
        for u in ("resConfUnit1", "resConfUnit2"):
            sd[f"depth_head.scratch.refinenet{i}.{u}.conv1.weight"] = t(256, 256, 3, 3) * 0.01
            sd[f"depth_head.scratch.refinenet{i}.{u}.conv1.bias"] = torch.zeros(256)
            sd[f"depth_head.scratch.refinenet{i}.{u}.conv2.weight"] = t(256, 256, 3, 3) * 0.01
            sd[f"depth_head.scratch.refinenet{i}.{u}.conv2.bias"] = torch.zeros(256)
        sd[f"depth_head.scratch.refinenet{i}.out_conv.weight"] = t(256, 256, 1, 1) * 0.02
        sd[f"depth_head.scratch.refinenet{i}.out_conv.bias"] = torch.zeros(256)
    sd["depth_head.scratch.output_conv1.weight"] = t(128, 256, 3, 3) * 0.02
    sd["depth_head.scratch.output_conv1.bias"] = torch.zeros(128)
    sd["depth_head.scratch.output_conv2.0.weight"] = t(32, 128, 3, 3) * 0.02
    sd["depth_head.scratch.output_conv2.0.bias"] = torch.zeros(32)
    sd["depth_head.scratch.output_conv2.2.weight"] = t(1, 32, 1, 1) * 0.02
    sd["depth_head.scratch.output_conv2.2.bias"] = torch.zeros(1)
    return sd


def test_converter_structure_matches_init():
    torch.manual_seed(0)
    sd = _fake_da2_state_dict("vits")
    conv = jax.tree.map(jnp.asarray, convert_da2_checkpoint(sd, "vits"))
    model = DepthAnythingV2(arch="vits")
    x = jnp.zeros((1, 56, 56, 3))
    init = model.init(jax.random.PRNGKey(0), x)

    ip = {jax.tree_util.keystr(k): v.shape
          for k, v in jax.tree_util.tree_leaves_with_path(init)}
    cp = {jax.tree_util.keystr(k): v.shape
          for k, v in jax.tree_util.tree_leaves_with_path(conv)}
    assert ip == cp, (set(ip) ^ set(cp),
                      {k: (ip.get(k), cp.get(k)) for k in ip if cp.get(k) != ip[k]})

    # converted params must run
    out = model.apply(conv, x)
    assert out.shape == (1, 56, 56)
    assert np.isfinite(np.asarray(out)).all()
    assert (np.asarray(out) >= 0).all()


def test_preprocess_shapes(rng):
    from batrack_tpu.depth.dpt import preprocess

    img = rng.integers(0, 255, (480, 640, 3), np.uint8)
    x = preprocess(img, input_size=518)
    assert x.shape[1] % 14 == 0 and x.shape[2] % 14 == 0
    assert min(x.shape[1], x.shape[2]) >= 518


def test_torch_bicubic_matrix_matches_interpolate(rng):
    """_torch_bicubic_matrix == F.interpolate bicubic (A=-0.75, no
    antialias) in BOTH conventions the two DINOv2 variants use: size mode
    (UniDepth, offset 0.0) and scale-factor mode (DepthAnything's +0.1
    kludge, dinov2.py:191-203) — upscale and downscale."""
    import torch.nn.functional as F

    from batrack_tpu.depth.dpt import _torch_bicubic_matrix

    x = rng.normal(size=(1, 5, 37, 37)).astype(np.float32)
    xt = torch.from_numpy(x)
    for hout, wout in [(10, 13), (50, 41)]:
        # size mode
        ref = F.interpolate(xt, size=(hout, wout), mode="bicubic",
                            antialias=False).numpy()
        Wh = _torch_bicubic_matrix(37, hout, 37 / hout)
        Ww = _torch_bicubic_matrix(37, wout, 37 / wout)
        ours = np.einsum("hm,bcmn,wn->bchw", Wh, x, Ww)
        np.testing.assert_allclose(ours, ref, atol=1e-4)
        # scale-factor mode with the DA2 +0.1 offset
        sx, sy = (hout + 0.1) / 37, (wout + 0.1) / 37
        ref2 = F.interpolate(xt, scale_factor=(sx, sy), mode="bicubic",
                             antialias=False).numpy()
        Wh2 = _torch_bicubic_matrix(37, hout, 1.0 / sx)
        Ww2 = _torch_bicubic_matrix(37, wout, 1.0 / sy)
        ours2 = np.einsum("hm,bcmn,wn->bchw", Wh2, x, Ww2)
        assert ref2.shape == ours2.shape
        np.testing.assert_allclose(ours2, ref2, atol=1e-4)
