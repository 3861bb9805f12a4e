"""4D visualization CLI — vis_refined_results.py equivalent.

Loads a results(_refined).pkl and logs cameras, images, point clouds and
tracks to a Rerun viewer (requires rerun-sdk; degrades to a summary print).
"""

from __future__ import annotations

import argparse
import pickle

import numpy as np


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--result_path", required=True)
    parser.add_argument("--stride", type=int, default=4)
    args = parser.parse_args(argv)

    with open(args.result_path, "rb") as f:
        results = pickle.load(f)

    for key in ("rgbs", "dmaps_scaled", "dmaps", "cams_T_world", "intrinsics"):
        if results.get(key) is not None:
            print(f"  {key}: {np.asarray(results[key]).shape}")

    from batrack_tpu.utils.visualizer import vis_rerun

    ok = vis_rerun(results, stride=args.stride)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
