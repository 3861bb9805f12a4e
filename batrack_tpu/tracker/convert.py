"""md_tracker.pth (torch) -> Flax params converter.

The reference loads `checkpoints/md_tracker.pth` with `module.` prefix
stripping (batrack.py:340-359). This module maps that state_dict onto the
MDTracker Flax parameter tree: conv kernels OIHW->HWIO, linear weights
(out,in)->(in,out), GroupNorm weight/bias -> scale/bias.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _conv(w):  # OIHW -> HWIO
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _lin(w):  # (out, in) -> (in, out)
    return np.transpose(np.asarray(w), (1, 0))


def _residual_block(sd, prefix):
    out = {
        "conv1": {"kernel": _conv(sd[f"{prefix}.conv1.weight"]),
                  "bias": np.asarray(sd[f"{prefix}.conv1.bias"])},
        "conv2": {"kernel": _conv(sd[f"{prefix}.conv2.weight"]),
                  "bias": np.asarray(sd[f"{prefix}.conv2.bias"])},
    }
    if f"{prefix}.downsample.0.weight" in sd:
        out["downsample"] = {
            "kernel": _conv(sd[f"{prefix}.downsample.0.weight"]),
            "bias": np.asarray(sd[f"{prefix}.downsample.0.bias"]),
        }
    return out


def _dense(sd, prefix):
    return {"kernel": _lin(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _attn_block(sd, prefix):
    return {
        "attn": {"qkv": _dense(sd, f"{prefix}.attn.qkv"),
                 "proj": _dense(sd, f"{prefix}.attn.proj")},
        "mlp": {"fc1": _dense(sd, f"{prefix}.mlp.fc1"),
                "fc2": _dense(sd, f"{prefix}.mlp.fc2")},
    }


def _updateformer(sd, prefix, time_depth, space_depth):
    out = {
        "input_transform": _dense(sd, f"{prefix}.input_transform"),
        "flow_head": _dense(sd, f"{prefix}.flow_head"),
    }
    for i in range(time_depth):
        out[f"time_blocks_{i}"] = _attn_block(sd, f"{prefix}.time_blocks.{i}")
    for j in range(space_depth):
        out[f"space_blocks_{j}"] = _attn_block(sd, f"{prefix}.space_blocks.{j}")
    return out


def convert_state_dict(
    sd: Dict[str, np.ndarray],
    time_depth: int = 6,
    space_depth: int = 6,
    time_depth_dyn: int = 3,
    space_depth_dyn: int = 3,
) -> dict:
    """torch state_dict (tensors or arrays) -> flax params dict."""
    if "model" in sd and not hasattr(sd["model"], "shape"):
        sd = sd["model"]  # unwrap BEFORE converting values (a nested dict
        # through _to_np becomes a 0-d object array and breaks everything)
    sd = {k.replace("module.", ""): _to_np(v) for k, v in sd.items()}

    fnet = {
        "conv1": {"kernel": _conv(sd["fnet.conv1.weight"]),
                  "bias": np.asarray(sd["fnet.conv1.bias"])},
        "conv2": {"kernel": _conv(sd["fnet.conv2.weight"]),
                  "bias": np.asarray(sd["fnet.conv2.bias"])},
        "conv3": {"kernel": _conv(sd["fnet.conv3.weight"]),
                  "bias": np.asarray(sd["fnet.conv3.bias"])},
    }
    for l in range(1, 5):
        for b in range(2):
            fnet[f"layer{l}_{b}"] = _residual_block(sd, f"fnet.layer{l}.{b}")

    params = {
        "fnet": fnet,
        "updateformer": _updateformer(sd, "updateformer", time_depth, space_depth),
        "updateformer_dyn": _updateformer(
            sd, "updateformer_dyn", time_depth_dyn, space_depth_dyn
        ),
        "norm": {"scale": np.asarray(sd["norm.weight"]),
                 "bias": np.asarray(sd["norm.bias"])},
        "ffeat_updater": _dense(sd, "ffeat_updater.0"),
        "vis_predictor": _dense(sd, "vis_predictor.0"),
        "motion_label_block": {
            "mlp": {"fc1": _dense(sd, "motion_label_block.network.mlp.fc1"),
                    "fc2": _dense(sd, "motion_label_block.network.mlp.fc2")},
        },
        "embedConv": {"kernel": _conv(sd["embedConv.weight"]),
                      "bias": np.asarray(sd["embedConv.bias"])},
        "zeroMLPflow": _dense(sd, "zeroMLPflow"),
    }
    return {"params": params}


def _to_np(v):
    try:
        return v.detach().cpu().numpy()  # torch tensor
    except AttributeError:
        return np.asarray(v)


def load_checkpoint(path: str, **kwargs) -> dict:
    """Load an md_tracker.pth and convert (requires torch for unpickling)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "model" in sd:
        sd = sd["model"]
    return convert_state_dict(sd, **kwargs)
