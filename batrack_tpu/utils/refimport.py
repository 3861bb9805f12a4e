"""Helpers for importing the reference implementation (torch CPU).

Used by the reference-parity test suites and scripts/validate_checkpoint.py
to instantiate the reference networks without their GPU-only dependencies:
pure-torch stubs for timm's Attention/Mlp (the only timm symbols the
tracker blocks use, reference blocks.py:5) and an omegaconf-like config
node. The reference tree location is resolved from (in order) the
BATRACK_REFERENCE_ROOT environment variable, an explicit argument, or the
conventional /root/reference mount.
"""

from __future__ import annotations

import os
import sys
import types

DEFAULT_REFERENCE_ROOT = "/root/reference"


def reference_root(explicit: str | None = None) -> str:
    """Resolve the reference checkout; raises with a clear message if absent."""
    root = explicit or os.environ.get(
        "BATRACK_REFERENCE_ROOT", DEFAULT_REFERENCE_ROOT
    )
    if not os.path.isdir(os.path.join(root, "main")):
        raise FileNotFoundError(
            f"reference tree not found at {root!r} (expected <root>/main/...); "
            "set BATRACK_REFERENCE_ROOT or pass --reference-root"
        )
    return root


class ConfigNode(dict):
    """Minimal omegaconf-like node: attribute access + `in` support."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)


def install_reference_stubs() -> None:
    """timm.models.vision_transformer.{Attention, Mlp} + torchvision stub.

    Pure-torch re-statements of the two timm modules the reference tracker
    blocks import (blocks.py:5) — standard pre-norm ViT attention and MLP,
    state-dict-compatible with timm's parameter names.
    """
    if "timm.models.vision_transformer" in sys.modules:
        return
    import torch.nn as nn

    class Attention(nn.Module):
        def __init__(self, dim, num_heads=8, qkv_bias=False, **kw):
            super().__init__()
            self.num_heads = num_heads
            self.head_dim = dim // num_heads
            self.scale = self.head_dim ** -0.5
            self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
            self.proj = nn.Linear(dim, dim)

        def forward(self, x):
            B, N, C = x.shape
            qkv = self.qkv(x).reshape(B, N, 3, self.num_heads, self.head_dim)
            q, k, v = qkv.permute(2, 0, 3, 1, 4).unbind(0)
            attn = (q @ k.transpose(-2, -1)) * self.scale
            attn = attn.softmax(dim=-1)
            x = (attn @ v).transpose(1, 2).reshape(B, N, C)
            return self.proj(x)

    class Mlp(nn.Module):
        def __init__(self, in_features, hidden_features=None, out_features=None,
                     act_layer=nn.GELU, drop=0.0, **kw):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = nn.Linear(in_features, hidden_features)
            self.act = act_layer()
            self.fc2 = nn.Linear(hidden_features, out_features)

        def forward(self, x):
            return self.fc2(self.act(self.fc1(x)))

    # merge-additive: other reference-import harnesses (e.g. the UniDepth
    # suite) install their own timm/torchvision stub surfaces — extend
    # whatever is present rather than clobbering it
    tm = sys.modules.get("timm") or types.ModuleType("timm")
    tmm = sys.modules.get("timm.models") or types.ModuleType("timm.models")
    tmv = (sys.modules.get("timm.models.vision_transformer")
           or types.ModuleType("timm.models.vision_transformer"))
    tmv.Attention = Attention
    tmv.Mlp = Mlp
    tmm.vision_transformer = tmv
    tm.models = tmm
    sys.modules.update({"timm": tm, "timm.models": tmm,
                        "timm.models.vision_transformer": tmv})

    tv = sys.modules.get("torchvision") or types.ModuleType("torchvision")
    tvt = (sys.modules.get("torchvision.transforms")
           or types.ModuleType("torchvision.transforms"))

    class Compose:  # Depth-Anything dpt.py imports it at module scope
        def __init__(self, transforms):
            self.transforms = transforms

        def __call__(self, x):
            for t in self.transforms:
                x = t(x)
            return x

    if not hasattr(tvt, "Compose"):
        tvt.Compose = Compose
    tv.transforms = tvt
    sys.modules.update({"torchvision": tv, "torchvision.transforms": tvt})
