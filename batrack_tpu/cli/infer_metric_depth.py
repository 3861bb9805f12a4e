"""Metric-depth inference CLI — UniDepth/scripts/demo_mega-sam.py equivalent.

Runs the Flax UniDepthV2 over an image directory and saves per-frame
.npz {depth, fov, intrinsics} files — the metric provider consumed by
align_depth (get_mono_depth.py:154-171 reads <depth_dir>/unidepthv2/<scene>).
The torch checkpoint (lpiccinelli/unidepth-v2-vitl14 pytorch_model.bin or
model.safetensors) converts on load.
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def _load_state_dict(path: str):
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "model" in sd:
        sd = sd["model"]
    return {k.replace("module.", ""): v for k, v in sd.items()}


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--img_dir", required=True,
                        help="directory of *.jpg / *.png frames")
    parser.add_argument("--out_dir", required=True,
                        help="output dir for per-frame .npz files")
    parser.add_argument("--checkpoint", required=True,
                        help="UniDepthV2 torch checkpoint (v2-vitl14 / "
                             "v2-vits14)")
    parser.add_argument("--arch", default="vitl", choices=["vitl", "vits"],
                        help="checkpoint family (config_v2_<arch>14.json)")
    parser.add_argument("--intrinsics", default=None,
                        help="optional .npy (3,3) gt intrinsics")
    parser.add_argument("--resolution_level", type=int, default=None)
    args = parser.parse_args(argv)
    from batrack_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    import cv2
    import jax

    from batrack_tpu.depth.unidepth import (UniDepthV2,
                                            convert_unidepth_checkpoint,
                                            infer)

    params = jax.tree.map(
        lambda x: jax.numpy.asarray(x),
        convert_unidepth_checkpoint(_load_state_dict(args.checkpoint),
                                    arch=args.arch),
    )
    model = UniDepthV2(arch=args.arch)
    K_gt = np.load(args.intrinsics) if args.intrinsics else None

    os.makedirs(args.out_dir, exist_ok=True)
    files = sorted(
        glob.glob(os.path.join(args.img_dir, "*.jpg"))
        + glob.glob(os.path.join(args.img_dir, "*.png"))
    )
    if not files:
        print(f"no images in {args.img_dir}")
        return 1
    for f in files:
        rgb = cv2.cvtColor(cv2.imread(f), cv2.COLOR_BGR2RGB)
        # only depth+K are saved: skip the confidence/points compute AND
        # their ~7.6 MB/frame device->host transfer
        out = infer(model, params, rgb, intrinsics=K_gt,
                    resolution_level=args.resolution_level,
                    outputs=("depth", "intrinsics"))
        fov = np.rad2deg(
            2 * np.arctan(out["depth"].shape[-1]
                          / (2 * out["intrinsics"][0, 0])))
        stem = os.path.splitext(os.path.basename(f))[0]
        np.savez(
            os.path.join(args.out_dir, stem + ".npz"),
            depth=np.float32(out["depth"]),
            fov=fov,
            intrinsics=np.float32(out["intrinsics"]),
        )
        print(f"{stem}: depth [{out['depth'].min():.2f}, "
              f"{out['depth'].max():.2f}] m, fov {fov:.1f} deg")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
