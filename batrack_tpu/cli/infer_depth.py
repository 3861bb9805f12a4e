"""Relative-depth inference CLI — Depth-Anything/run_videos_v2.py equivalent.

Runs the Flax DepthAnythingV2 over an image directory and saves per-frame
relative-disparity .npy files (the stage-1 mono provider consumed by
align_depth). The torch checkpoint converts on load.
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--img_dir", required=True)
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--checkpoint", required=True,
                        help="torch depth_anything_v2_*.pth")
    parser.add_argument("--encoder", default="vitl", choices=["vits", "vitb", "vitl"])
    parser.add_argument("--input_size", type=int, default=518)
    args = parser.parse_args(argv)
    from batrack_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    import jax

    from batrack_tpu.depth.dpt import (
        DepthAnythingV2,
        convert_da2_checkpoint,
        infer_depth,
    )

    import torch

    sd = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "model" in sd:
        sd = sd["model"]
    params = jax.tree.map(
        lambda x: jax.numpy.asarray(x), convert_da2_checkpoint(sd, args.encoder)
    )
    # per-arch DPT head dims (run_videos_v2.py:41-46 model_configs)
    head_cfg = {
        "vits": dict(features=64, out_channels=(48, 96, 192, 384)),
        "vitb": dict(features=128, out_channels=(96, 192, 384, 768)),
        "vitl": dict(features=256, out_channels=(256, 512, 1024, 1024)),
    }[args.encoder]
    model = DepthAnythingV2(arch=args.encoder, **head_cfg)

    os.makedirs(args.out_dir, exist_ok=True)
    files = sorted(
        glob.glob(os.path.join(args.img_dir, "*.jpg"))
        + glob.glob(os.path.join(args.img_dir, "*.png"))
    )
    import cv2

    for i, path in enumerate(files):
        img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
        disp = infer_depth(model, params, img, args.input_size)
        base = os.path.splitext(os.path.basename(path))[0]
        np.save(os.path.join(args.out_dir, base + ".npy"), disp.astype(np.float32))
        if i % 20 == 0:
            print(f"[{i}/{len(files)}] {base}: disp range "
                  f"[{disp.min():.4f}, {disp.max():.4f}]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
