"""Tests for config loading, dataset streams (binary readers), depth
alignment, and the CLI plumbing on generated fixture data."""

import os
import pickle
import struct

import numpy as np
import pytest

from batrack_tpu.data import (
    cam_read_sintel,
    dataset_rgbd_stream,
    davis_stream,
    load_depth_file,
    sintel_depth_read,
)
from batrack_tpu.depth import align_depth_sequence, fit_frame_scale_shift
from batrack_tpu.utils.config import Config, load_config

TAG_FLOAT = 202021.25


def write_sintel_cam(path, K, E):
    with open(path, "wb") as f:
        f.write(np.float32(TAG_FLOAT).tobytes())
        f.write(np.asarray(K, "float64").tobytes())
        f.write(np.asarray(E, "float64").tobytes())


def write_sintel_dpt(path, depth):
    with open(path, "wb") as f:
        f.write(np.float32(TAG_FLOAT).tobytes())
        f.write(np.int32(depth.shape[1]).tobytes())
        f.write(np.int32(depth.shape[0]).tobytes())
        f.write(np.asarray(depth, np.float32).tobytes())


def test_sintel_binary_readers(tmp_path, rng):
    K = np.diag([300.0, 300.0, 1.0])
    K[0, 2], K[1, 2] = 32, 24
    E = np.hstack([np.eye(3), np.zeros((3, 1))])
    write_sintel_cam(tmp_path / "f.cam", K, E)
    K2, E2 = cam_read_sintel(str(tmp_path / "f.cam"))
    np.testing.assert_allclose(K2, K)
    np.testing.assert_allclose(E2, E)

    depth = rng.uniform(1, 10, (24, 32)).astype(np.float32)
    write_sintel_dpt(tmp_path / "f.dpt", depth)
    out = sintel_depth_read(str(tmp_path / "f.dpt"))
    np.testing.assert_allclose(out, depth)

    out2 = load_depth_file(str(tmp_path / "f.dpt"), mode="sintel")
    assert out2.shape == (24, 32, 1)


def test_davis_stream(tmp_path, rng):
    import cv2

    imgdir = tmp_path / "img"
    depthdir = tmp_path / "depth"
    kdir = tmp_path / "K"
    for d in (imgdir, depthdir, kdir):
        d.mkdir()
    K = np.diag([100.0, 100.0, 1.0])
    K[0, 2], K[1, 2] = 32, 16
    for t in range(4):
        img = rng.integers(0, 255, (34, 66, 3), np.uint8)  # gets cropped to /16
        cv2.imwrite(str(imgdir / f"{t:05d}.png"), img)
        np.save(depthdir / f"{t:05d}.npy", rng.uniform(1, 5, (34, 66)).astype(np.float32))
        np.save(kdir / f"{t:05d}.npy", K)

    frames = list(davis_stream(str(imgdir), str(depthdir), str(kdir)))
    assert frames[-1][0] == -1  # sentinel
    ts, img, depth, depth_gt, intr = frames[0]
    assert img.shape == (32, 64, 3)  # cropped to multiple of 16
    assert depth.shape == (32, 64, 1)
    np.testing.assert_allclose(intr, [100, 100, 32, 16])
    assert len(frames) == 5


def test_config_yaml_and_overrides(tmp_path):
    cfg = load_config("configs/davis_demo.yaml", ["slam.ITER=2", "data.name=foo"])
    assert cfg.slam.ITER == 2
    assert cfg.data.name == "foo"
    assert cfg.slam.PATCHES_PER_FRAME == 400
    assert cfg.model.S == 12
    cfg2 = load_config("configs/sintel.yaml")
    assert cfg2.data.traj_format == "sintel"
    assert cfg2.slam.PATCHES_PER_FRAME == 256


def test_depth_alignment_recovers_scale_shift(rng):
    depth = rng.uniform(2, 20, (6, 40, 50))
    gt_disp = 1.0 / depth
    # relative disparity = affine transform of true disparity
    true_scale, true_shift = 2.0, 0.1
    mono = (gt_disp - true_shift) / true_scale

    s, t, sky = fit_frame_scale_shift(mono[0], depth[0])
    # recovered mono->metric map should be close to the inverse transform
    np.testing.assert_allclose(s, true_scale, rtol=0.05)
    np.testing.assert_allclose(t, true_shift, atol=0.05)

    Ks = [np.diag([100.0, 100.0, 1.0]) for _ in range(6)]
    aligned, K = align_depth_sequence(list(mono), list(depth), Ks, (50, 40))
    # aligned depth is normalized; correlation with gt depth should be high
    a = np.stack(aligned).reshape(-1)
    g = depth.reshape(-1)
    corr = np.corrcoef(a, g)[0, 1]
    assert corr > 0.99
    assert K.shape == (3, 3)


def test_refine_cli_roundtrip(tmp_path, rng):
    """run_refine CLI end-to-end over a fixture results.pkl."""
    from test_refine import T, make_results  # pytest puts tests/ on sys.path

    scene = tmp_path / "scene_a"
    scene.mkdir()
    res = make_results(rng, np.linspace(0.8, 1.2, T))
    with open(scene / "results.pkl", "wb") as f:
        pickle.dump(res, f)

    from batrack_tpu.cli.run_refine import main

    rc = main(["--result_dir", str(tmp_path), "--grid_size", "2", "--niter", "5",
               "--fixed_K"])
    assert rc == 0
    out = scene / "results_refined.pkl"
    assert out.exists()
    with open(out, "rb") as f:
        refined = pickle.load(f)
    assert "dmaps_scaled" in refined

    from batrack_tpu.cli.eval_depth import main as eval_main

    rc = eval_main(["--result_dir", str(tmp_path), "--refined"])
    assert rc == 0
    assert (tmp_path / "eval_depth.txt").exists()


def test_track_visualizer_writes_video(tmp_path, rng):
    from batrack_tpu.utils.visualizer import TrackVisualizer

    viz = TrackVisualizer(save_dir=str(tmp_path), fps=5)
    S, Q = 4, 6
    for t in range(6):
        viz.add_frame(rng.integers(0, 255, (48, 64, 3), np.uint8))
    viz.add_track({
        "fid": 5,
        "targets": rng.uniform(5, 40, (S, Q, 2)).astype(np.float32),
        "weights": np.ones((S, Q), np.float32),
        "static": (rng.uniform(0, 1, (S, Q)) > 0.5).astype(np.float32),
    })
    path = viz.save_video("test")
    assert path is not None
    assert os.path.getsize(path) > 1000


def test_stage_timer():
    from batrack_tpu.utils.profiling import StageTimer

    t = StageTimer()
    with t.timed("a"):
        pass
    with t.timed("a"):
        pass
    with t.timed("b"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    assert "a" in t.report()


class TestNativeLoader:
    """Native C++ dataio vs the Python readers."""

    @pytest.fixture(autouse=True)
    def _check(self):
        from batrack_tpu.data import native_loader

        if not native_loader.available():
            pytest.skip("native dataio not built")

    def test_dpt_cam_parity(self, tmp_path, rng):
        from batrack_tpu.data import native_loader

        depth = rng.uniform(1, 10, (24, 32)).astype(np.float32)
        write_sintel_dpt(tmp_path / "f.dpt", depth)
        np.testing.assert_allclose(native_loader.read_dpt(str(tmp_path / "f.dpt")), depth)

        K = np.diag([300.0, 300.0, 1.0]); K[0, 2], K[1, 2] = 32, 24
        E = np.hstack([np.eye(3), np.ones((3, 1))])
        write_sintel_cam(tmp_path / "f.cam", K, E)
        K2, E2 = native_loader.read_cam(str(tmp_path / "f.cam"))
        np.testing.assert_allclose(K2, K)
        np.testing.assert_allclose(E2, E)

    def test_image_decode_parity(self, tmp_path, rng):
        import cv2

        from batrack_tpu.data import native_loader

        img = rng.integers(0, 255, (30, 40, 3), np.uint8)
        cv2.imwrite(str(tmp_path / "f.png"), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        out = native_loader.read_image(str(tmp_path / "f.png"))
        np.testing.assert_array_equal(out, img)

    def test_prefetch_loader(self, tmp_path, rng):
        import cv2

        from batrack_tpu.data.native_loader import PrefetchLoader

        imgs, deps = [], []
        raw = []
        for t in range(6):
            img = rng.integers(0, 255, (34, 66, 3), np.uint8)
            depth = rng.uniform(0.001, 200, (34, 66)).astype(np.float32)
            ip = tmp_path / f"{t:03d}.png"
            dp = tmp_path / f"{t:03d}.npy"
            cv2.imwrite(str(ip), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
            np.save(dp, depth)
            imgs.append(str(ip)); deps.append(str(dp)); raw.append((img, depth))

        loader = PrefetchLoader(imgs, deps, num_threads=2)
        assert loader.shape == (32, 64)  # cropped to /16
        count = 0
        for idx, img, depth in loader:
            assert idx == count
            np.testing.assert_array_equal(img, raw[idx][0][:32, :64])
            np.testing.assert_allclose(
                depth, np.clip(raw[idx][1][:32, :64], 1e-2, 1e2), rtol=1e-6
            )
            count += 1
        assert count == 6
        loader.close()


class TestNativeStreamParity:
    """VERDICT r1 #8: the native-prefetch build_stream path yields frames
    identical to the Python stream on the same fixture."""

    def _fixture(self, tmp_path, rng, n=4):
        import cv2

        imdir = tmp_path / "rgb"
        ddir = tmp_path / "depth"
        kdir = tmp_path / "calib"
        for d in (imdir, ddir, kdir):
            d.mkdir()
        for t in range(n):
            img = rng.integers(0, 255, (48, 64, 3), np.uint8)
            cv2.imwrite(str(imdir / f"{t:04d}.png"),
                        cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
            np.save(ddir / f"{t:04d}.npy",
                    rng.uniform(1, 9, (48, 64)).astype(np.float32))
            K = np.array([[60.0, 0, 32], [0, 61.0, 24], [0, 0, 1]], np.float32)
            np.save(kdir / f"{t:04d}.npy", K)
        return imdir, ddir, kdir

    def test_native_build_stream_matches_python(self, tmp_path, rng):
        from batrack_tpu.data import native_loader

        if not native_loader.available():
            pytest.skip("native dataio not built")
        from batrack_tpu.cli.run_slam import build_stream
        from batrack_tpu.utils.config import Config

        imdir, ddir, kdir = self._fixture(tmp_path, rng)
        cfg = Config()
        cfg.data.imagedir = str(imdir)
        cfg.data.depthdir = str(ddir)
        cfg.data.calib = str(kdir)
        cfg.data.traj_format = "davis"

        py_frames = list(build_stream(cfg))
        cfg.data.native_prefetch = True
        nat_frames = list(build_stream(cfg))

        assert len(py_frames) == len(nat_frames)
        for (t1, im1, d1, g1, k1), (t2, im2, d2, g2, k2) in zip(
            py_frames, nat_frames
        ):
            assert t1 == t2
            np.testing.assert_array_equal(np.asarray(im1), np.asarray(im2))
            np.testing.assert_allclose(
                np.asarray(d1, np.float32).squeeze(),
                np.asarray(d2, np.float32).squeeze(), rtol=1e-6,
            )
            np.testing.assert_allclose(np.asarray(k1), np.asarray(k2))
