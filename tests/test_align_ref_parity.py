"""Mono-depth alignment golden parity against the *actual* reference.

Imports /root/reference/main/mono_depth/get_mono_depth.py (pure
numpy+cv2, no CUDA) and runs its file-level `align_depth` on a synthetic
directory tree — DepthAnything-style .npy relative disparities against
UniDepth-style .npz {depth, intrinsics} — then asserts our
depth/align.py reproduces every written artifact: aligned depth maps,
the shared K from the median FOV, and (via the depths) the per-frame
scale/shift fits, global median-product pick, and 98th-percentile
normalization (get_mono_depth.py:71-150).

The inputs include a sky-dominated frame (>50% of disparity < 0.01) to
pin the reference's sky-branch behaviour: the branch's fit is computed
but unconditionally overwritten at get_mono_depth.py:95-99 — our
fit_frame_scale_shift reproduces the net (overwritten) semantics.
"""

import importlib.util
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

REF_FILE = "/root/reference/main/mono_depth/get_mono_depth.py"


def _import_reference():
    spec = importlib.util.spec_from_file_location("ref_get_mono_depth", REF_FILE)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_get_mono_depth"] = mod
    spec.loader.exec_module(mod)
    return mod


def _make_inputs(tmp_path, rng):
    T, H, W = 5, 24, 32
    data_dir = tmp_path / "scene"
    mono_root = tmp_path / "mono"
    metric_root = tmp_path / "metric"
    mono_dir = mono_root / "scene"
    metric_dir = metric_root / "scene"
    for d in (data_dir, mono_dir, metric_dir):
        d.mkdir(parents=True)

    img = (rng.uniform(0, 255, (H, W, 3))).astype(np.uint8)
    cv2.imwrite(str(data_dir / "0000.png"), img)

    for t in range(T):
        # mono disparity at 2x resolution so the INTER_NEAREST_EXACT
        # resize path is exercised
        disp = rng.uniform(0.05, 1.2, (2 * H, 2 * W)).astype(np.float32)
        if t == 2:
            # sky-dominated frame: >50% below the 0.01 sky threshold
            disp[: int(1.2 * H)] = rng.uniform(0.0, 0.009, (int(1.2 * H), 2 * W))
        depth = rng.uniform(0.5, 30.0, (H, W)).astype(np.float32)
        # a few near-field pixels to hit the UniDepth-bug guard
        # (metric < 2 & mono < 0.02, get_mono_depth.py:74-75)
        depth[0, :4] = 1.0
        disp[0, :8] = 0.015
        fx = 40.0 + t
        K = np.array([[fx, 0, W / 2], [0, fx, H / 2], [0, 0, 1.0]])
        np.save(mono_dir / f"{t:04d}.npy", disp)
        np.savez(metric_dir / f"{t:04d}.npz", depth=depth, intrinsics=K)
    return data_dir, mono_root, metric_root


def test_align_golden_vs_reference(tmp_path):
    rng = np.random.default_rng(11)
    data_dir, mono_root, metric_root = _make_inputs(tmp_path, rng)
    ref = _import_reference()

    ref_depth_dir = tmp_path / "ref_depth"
    ref_K_dir = tmp_path / "ref_K"
    ref.align_depth(
        str(mono_root), str(metric_root), "scene", str(data_dir),
        str(ref_depth_dir), str(ref_K_dir),
    )

    from batrack_tpu.depth.align import align_depth_dirs

    our_depth_dir = tmp_path / "our_depth"
    our_K_dir = tmp_path / "our_K"
    align_depth_dirs(
        str(mono_root / "scene"), str(metric_root / "scene"), str(data_dir),
        str(our_depth_dir), str(our_K_dir),
    )

    for t in range(5):
        got = np.load(our_depth_dir / f"{t:04d}.npy")
        want = np.load(ref_depth_dir / f"{t:04d}.npy")
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
        got_K = np.load(our_K_dir / f"{t:04d}_intrinsics.npy")
        want_K = np.load(ref_K_dir / f"{t:04d}_intrinsics.npy")
        np.testing.assert_allclose(got_K, want_K, rtol=1e-12)


def test_sky_branch_is_overridden(tmp_path):
    """The reference's sky-masked fit is dead code (overwritten at
    get_mono_depth.py:95-99); our fit must return the UNMASKED fit even
    for a sky-dominated frame."""
    from batrack_tpu.depth.align import fit_frame_scale_shift

    rng = np.random.default_rng(5)
    H, W = 24, 32
    disp = rng.uniform(0.0, 0.009, (H, W)).astype(np.float32)
    disp[:4] = rng.uniform(0.2, 1.0, (4, W))
    depth = rng.uniform(2.5, 30.0, (H, W)).astype(np.float32)

    s, t, sky = fit_frame_scale_shift(disp, depth)
    assert sky > 0.5
    gt = 1.0 / (depth + 1e-8)
    gt_ms = gt - np.median(gt) + 1e-8
    da_ms = disp - np.median(disp) + 1e-8
    want_s = np.median(gt_ms / da_ms)
    want_t = np.median(gt - want_s * disp)
    assert s == pytest.approx(want_s, rel=1e-7)
    assert t == pytest.approx(want_t, rel=1e-7)
