"""Sparse SLAM CLI (stage 2) — the reference's main/run_batrack.py equivalent.

Usage:
    python -m batrack_tpu.cli.run_slam --config configs/davis_demo.yaml \
        data.imagedir=... data.depthdir=... data.savedir=... data.name=...

Hydra-style `a.b=c` overrides are accepted after the flags.
"""

from __future__ import annotations

import argparse
import logging
import os
import time

import numpy as np

logging.basicConfig(level=logging.INFO, format="%(asctime)s - %(levelname)s - %(message)s")
logger = logging.getLogger(__name__)


def build_stream(cfg):
    from batrack_tpu.data import (
        dataset_rgbd_stream,
        davis_stream,
        sintel_rgbd_stream,
        tartanair_rgbd_stream,
    )

    d = cfg.data
    depthdir_gt = d.depthdir_gt or d.depthdir
    if (d.depthdir_gt and d.depthdir_gt != d.depthdir
            and d.traj_format not in ("sintel", "tartanair")):
        # neither the davis/generic Python streams nor the native loader
        # carry a separate gt-depth channel (the reference's don't either);
        # silently yielding depth_gt = prior depth would corrupt depth
        # metrics, so reject the combination loudly. depthdir_gt ==
        # depthdir is allowed as a no-op: the reference's own demo
        # (scripts/demo/run_sparse.sh) passes the same dir for both and
        # davis_stream drops the argument (stream.py:231)
        raise ValueError(
            f"data.depthdir_gt={d.depthdir_gt!r} differs from data.depthdir "
            f"but traj_format {d.traj_format!r} has no gt-depth channel "
            f"(only sintel/tartanair do)"
        )
    if d.native_prefetch and d.traj_format not in ("sintel", "tartanair"):
        # native C++ prefetch loader (decode/crop on background threads);
        # yields frames identical to the Python streams
        # (tests/test_data_config.py::test_native_build_stream_matches_python)
        from batrack_tpu.data import native_rgbd_stream
        from batrack_tpu.data.native_loader import available
        from batrack_tpu.data.streams import _glob_sorted, IMG_EXTS

        if available():
            image_list = _glob_sorted(d.imagedir, IMG_EXTS)
            depth_list = _glob_sorted(d.depthdir, ["*.npy"])
            end = d.end if d.end != -1 else len(image_list)
            if d.traj_format == "davis":
                K_list = _glob_sorted(d.calib, ["*.npy"])
                Ks = np.array([np.load(str(k)) for k in K_list])
                Ks = Ks[d.skip:end:d.stride]
                intr = np.stack(
                    [Ks[:, 0, 0], Ks[:, 1, 1], Ks[:, 0, 2], Ks[:, 1, 2]], -1
                )
                intrinsics_fn = lambda t: intr[t]
            else:
                calib = np.loadtxt(d.calib, delimiter=" ")
                fixed = np.array(calib[:4])
                intrinsics_fn = lambda t: fixed
            return native_rgbd_stream(
                image_list[d.skip:end:d.stride],
                depth_list[d.skip:end:d.stride],
                intrinsics_fn,
            )
        logger.warning("native loader unavailable; using the Python stream")
    if d.traj_format == "sintel":
        return sintel_rgbd_stream(
            d.imagedir, d.depthdir, depthdir_gt, d.calib, d.stride, d.skip, d.end,
            d.input_intrinsics,
        )
    if d.traj_format == "tartanair":
        return tartanair_rgbd_stream(
            d.imagedir, d.depthdir, depthdir_gt, d.calib, d.stride, d.skip, d.end
        )
    if d.traj_format == "davis":
        return davis_stream(d.imagedir, d.depthdir, d.calib, d.stride, d.skip, d.end)
    return dataset_rgbd_stream(
        d.imagedir, d.depthdir, d.calib, d.stride, d.skip, d.end,
        mode=d.traj_format,
    )


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default=None, help="YAML config path")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("overrides", nargs="*", help="key=value overrides")
    args = parser.parse_args(argv)

    from batrack_tpu.utils.compile_cache import enable_compile_cache
    from batrack_tpu.utils.config import load_config

    enable_compile_cache()
    cfg = load_config(args.config, args.overrides)

    if cfg.slam.distributed:
        # must run before ANY other JAX use (checkpoint conversion below
        # already initializes the local backend, after which multi-host
        # initialization is impossible)
        from batrack_tpu.parallel.mesh import init_distributed

        init_distributed()

    from batrack_tpu.slam import BATrack
    from batrack_tpu.tracker import MDTrackerAdapter, load_checkpoint
    from batrack_tpu.utils.evaluation import eval_metrics
    from batrack_tpu.utils.traj import (
        load_traj,
        plot_trajectory,
        save_trajectory_tum_format,
    )

    params = None
    if cfg.model.init_dir:
        logger.info("loading tracker checkpoint %s", cfg.model.init_dir)
        params = load_checkpoint(
            cfg.model.init_dir,
            time_depth=cfg.model.time_depth,
            space_depth=cfg.model.space_depth,
            time_depth_dyn=cfg.model.time_depth_dyn,
            space_depth_dyn=cfg.model.space_depth_dyn,
        )

    slam = None
    pending = None
    # raw frames are retained only when results.pkl needs them — at 900
    # frames of 480x640 the full float stack is ~10 GB of host RAM
    keep_frames = cfg.save_results
    image_list, depth_list, depth_list_gt = [], [], []
    nf = 0
    start = time.time()
    for t, image, depth, depth_gt, intrinsics in build_stream(cfg):
        if (isinstance(t, (int, np.integer)) and t == -1) or t == "-1":
            break
        depth = np.clip(depth, 1e-2, 1e2)
        nf += 1
        if keep_frames:
            image_list.append(image)
            depth_list.append(depth)
            depth_list_gt.append(depth_gt)
        if slam is None:
            ht, wd = image.shape[:2]
            mesh = None
            if cfg.slam.mesh_devices:
                from batrack_tpu.parallel.mesh import (
                    get_host_chip_mesh,
                    get_mesh,
                )

                if cfg.slam.distributed:
                    # init_distributed already ran at startup (see above)
                    mesh = get_host_chip_mesh()
                else:
                    mesh = get_mesh(cfg.slam.mesh_devices)
                logger.info("device mesh: %s", mesh)
            slam = BATrack(cfg, ht, wd, seed=args.seed, mesh=mesh)
            slam.timer.enabled = True
            if cfg.save_video:
                from batrack_tpu.utils.visualizer import TrackVisualizer

                slam.visualizer = TrackVisualizer(
                    save_dir=os.path.join(cfg.data.savedir, cfg.data.name),
                    fps=cfg.visualizer.fps,
                    linewidth=cfg.visualizer.linewidth,
                    tracks_leave_trace=cfg.visualizer.tracks_leave_trace,
                )
            slam.tracker = MDTrackerAdapter(
                cfg.model, params=params,
                backward_tracking=cfg.slam.backward_tracking
                and cfg.slam.S_slam > cfg.model.S,
                static_threshold=cfg.slam.STATIC_THRESHOLD,
                mesh=mesh,
            )
        # one-frame lookahead: frame t+1's host->device upload overlaps
        # frame t's compute (the visualizer needs host images, so the
        # pre-upload is skipped when save_video is on)
        if cfg.save_video:
            item = (t, image, depth, intrinsics)
        else:
            dev_img, dev_depth = BATrack.upload_frame(image, depth)
            item = (t, dev_img, dev_depth, intrinsics)
        if pending is not None:
            if cfg.profile_dir and nf == 21:
                import jax

                jax.profiler.start_trace(cfg.profile_dir)
                logger.info("profiler trace -> %s (frames 21-30)", cfg.profile_dir)
            slam(*pending)
            if cfg.profile_dir and nf == 31:
                import jax

                jax.profiler.stop_trace()
        pending = item

    if slam is None or nf == 0:
        raise SystemExit(
            f"no frames found: check data.imagedir={cfg.data.imagedir!r}, "
            f"data.depthdir={cfg.data.depthdir!r}, skip/stride/end"
        )
    if pending is not None:
        slam(*pending)
    if cfg.profile_dir and 21 <= nf < 31:
        import jax

        jax.profiler.stop_trace()
    total = time.time() - start
    logger.info("Total time: %.2f s | FPS: %.2f | s/frame: %.4f", total, nf / total, total / nf)
    logger.info("stage timings:\n%s", slam.timer.report())
    if slam.delta:
        logger.info(
            "keyframe removals: %d (frames %s; reconstructed via delta "
            "memos at terminate)", len(slam.delta), sorted(slam.delta),
        )

    pred_traj = slam.terminate()

    gt_traj = None
    if cfg.data.gt_traj:
        gt_traj = load_traj(
            cfg.data.gt_traj, cfg.data.traj_format,
            skip=cfg.data.skip, stride=cfg.data.stride, end=cfg.data.end,
        )

    # multi-host: every process runs the identical SPMD loop, but artifacts
    # are written once (process 0) — concurrent writes to the shared savedir
    # would race
    import jax as _jax

    if _jax.process_index() != 0:
        return 0

    outdir = os.path.join(cfg.data.savedir, cfg.data.name)
    os.makedirs(outdir, exist_ok=True)

    if cfg.save_results:
        slam.get_results(
            rgbs=image_list, dmaps=depth_list, dmaps_gt=depth_list_gt,
            save_path=os.path.join(outdir, "results.pkl"),
        )
        logger.info("results saved to %s", os.path.join(outdir, "results.pkl"))

    if cfg.save_video and slam.visualizer is not None:
        path = slam.visualizer.save_video(filename=cfg.slam.PATCH_GEN)
        if path:
            logger.info("track video saved to %s", path)

    if cfg.save_trajectory:
        save_trajectory_tum_format(pred_traj, os.path.join(outdir, "batrack_traj.txt"))

    if cfg.save_plot:
        plot_trajectory(
            pred_traj, gt_traj=gt_traj,
            title=f"Trajectory Prediction for {cfg.exp_name}",
            filename=os.path.join(outdir, "traj_plot.pdf"),
        )

    if gt_traj is not None:
        ate, rpe_t, rpe_r = eval_metrics(
            pred_traj, gt_traj=gt_traj, seq=cfg.exp_name,
            filename=os.path.join(outdir, "eval_metrics.txt"),
        )
        with open(os.path.join(cfg.data.savedir, "error_sum.txt"), "a+") as f:
            f.write(
                f"{cfg.data.name:<20} | ATE: {ate:.5f}, RPE trans: {rpe_t:.5f}, "
                f"RPE rot: {rpe_r:.5f}\n{ate:.5f}\n{rpe_t:.5f}\n{rpe_r:.5f}\n"
            )
        logger.info("ATE %.5f | RPE trans %.5f | RPE rot %.5f", ate, rpe_t, rpe_r)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
