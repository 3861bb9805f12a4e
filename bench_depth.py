"""Stage-1 depth-prior benchmark: Flax DepthAnythingV2 + UniDepthV2 on TPU.

The reference's stage 1 (scripts/demo/run_mono_depth.sh) runs both torch
networks frame-by-frame on the GPU; these are the same architectures as
native Flax (batrack_tpu/depth/{dpt,unidepth}.py), so their TPU throughput
is part of the end-to-end pipeline story. Random weights — identical
compute to the released checkpoints.

Prints one JSON line per model:
  {"metric": "da2_vitl_fps" | "unidepth_vitl_fps", "value": ..., ...}

Run with --small for a CPU-sized smoke (tiny ViT shapes, correctness of the
harness only — not a performance number).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def bench_da2(jax, jnp, small: bool) -> dict:
    from batrack_tpu.depth.dpt import DepthAnythingV2, preprocess

    arch = "vits" if small else "vitl"
    H, W = (240, 427) if small else (480, 854)  # DAVIS-480p frame
    model = DepthAnythingV2(arch=arch)
    img = np.random.default_rng(0).uniform(0, 255, (H, W, 3)).astype(np.uint8)
    x = jnp.asarray(preprocess(img, input_size=196 if small else 518))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    fwd = jax.jit(model.apply)
    d = fwd(params, x)
    float(d[0, 0, 0])  # compile + sync (block_until_ready lies on axon)
    reps = 3 if small else 10
    t0 = time.time()
    for _ in range(reps):
        d = fwd(params, x)
    float(d[0, 0, 0])
    dt = (time.time() - t0) / reps
    return {
        "metric": f"da2_{arch}_fps",
        "value": round(1.0 / dt, 3),
        "unit": "frames/s",
        "input": list(x.shape),
        "backend": jax.default_backend(),
        "notes": "network forward at the preprocessed resolution "
                 "(resize/normalize excluded; they are <1 ms host work)",
    }


def bench_unidepth(jax, jnp, small: bool) -> dict:
    from batrack_tpu.depth import unidepth as ud

    H, W = (240, 427) if small else (480, 854)
    if small:
        # tiny harness smoke: drive the full infer() path at low resolution
        level = 0
    else:
        level = None  # production default (resolution_level=10)
    model = ud.UniDepthV2()
    img = np.random.default_rng(1).uniform(0, 255, (H, W, 3)).astype(np.uint8)
    (h, w), _ = ud._infer_shape((H, W), level)
    x = jnp.zeros((1, h, w, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    out = ud.infer(model, params, img, resolution_level=level)
    assert out["depth"].shape == (H, W)
    reps = 2 if small else 10

    def timed(**kw):
        ud.infer(model, params, img, resolution_level=level, **kw)  # warm
        t0 = time.time()
        for _ in range(reps):
            ud.infer(model, params, img, resolution_level=level, **kw)
        return (time.time() - t0) / reps

    dt_full = timed()
    # the production .npz path (cli/infer_metric_depth.py) transfers only
    # depth+K — confidence/points compute + ~7.6 MB/frame transfer skipped
    dt_slim = timed(outputs=("depth", "intrinsics"))
    return {
        "metric": "unidepth_vitl_fps",
        "value": round(1.0 / dt_full, 3),
        "value_depth_K_only": round(1.0 / dt_slim, 3),
        "unit": "frames/s",
        "network_hw": [h, w],
        "backend": jax.default_backend(),
        "notes": "one jitted graph per shape incl. ray generation + "
                 "spherical back-projection (eager per-op dispatch through "
                 "the tunnel cost ~700 ms/frame before r4). "
                 "value_depth_K_only is the production .npz-writer path "
                 "(no confidence/points compute or transfer).",
    }


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--small", action="store_true",
                        help="CPU-sized harness smoke (not a perf number)")
    parser.add_argument("--model", choices=["da2", "unidepth", "both"],
                        default="both")
    args = parser.parse_args()

    from batrack_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    if args.model in ("da2", "both"):
        print(json.dumps(bench_da2(jax, jnp, args.small)), flush=True)
    if args.model in ("unidepth", "both"):
        print(json.dumps(bench_unidepth(jax, jnp, args.small)), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
