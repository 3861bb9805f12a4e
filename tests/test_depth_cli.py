"""Stage-1 depth-provider CLI smoke: drive the real entry points with real
saved torch checkpoints (random weights, smallest arch) over a tiny image
directory and check the artifacts the downstream stages consume.

Covers the two CLIs the golden-pipeline test can't (it starts from
precomputed depth): `cli.infer_depth` (DepthAnythingV2 -> disparity .npy)
and `cli.infer_metric_depth` (UniDepthV2 -> {depth, fov, intrinsics} .npz,
the align_depth input schema).
"""

import json
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

REF_ROOT = os.environ.get("BATRACK_REFERENCE_ROOT", "/root/reference")


@pytest.fixture(scope="module")
def img_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("frames")
    rng = np.random.default_rng(0)
    for i in range(2):
        img = rng.integers(0, 256, (126, 168, 3), dtype=np.uint8)
        cv2.imwrite(str(d / f"{i:04d}.png"), img)
    return str(d)


@pytest.mark.slow
def test_infer_depth_cli(img_dir, tmp_path):
    from batrack_tpu.utils.refimport import install_reference_stubs

    install_reference_stubs()
    da2 = os.path.join(REF_ROOT, "Depth-Anything")
    if not os.path.isdir(da2):
        pytest.skip("reference Depth-Anything not present")
    if da2 not in sys.path:
        sys.path.insert(0, da2)
    from depth_anything_v2.dpt import DepthAnythingV2 as TorchDA2

    torch.manual_seed(0)
    ckpt = tmp_path / "da2_vits.pth"
    torch.save(
        TorchDA2(encoder="vits", features=64,
                 out_channels=[48, 96, 192, 384]).state_dict(), str(ckpt))

    out_dir = tmp_path / "disp"
    from batrack_tpu.cli.infer_depth import main

    rc = main(["--img_dir", img_dir, "--out_dir", str(out_dir),
               "--checkpoint", str(ckpt), "--encoder", "vits",
               "--input_size", "126"])
    assert rc == 0
    files = sorted(os.listdir(out_dir))
    assert len(files) == 2
    disp = np.load(out_dir / files[0])
    assert disp.shape == (126, 168) and np.isfinite(disp).all()
    assert (disp >= 0).all()


@pytest.mark.slow
def test_infer_metric_depth_cli(img_dir, tmp_path):
    from test_unidepth import _install_stubs

    _install_stubs()
    ud = os.path.join(REF_ROOT, "UniDepth")
    if not os.path.isdir(ud):
        pytest.skip("reference UniDepth not present")
    if ud not in sys.path:
        sys.path.insert(0, ud)
    from unidepth.models.unidepthv2.unidepthv2 import UniDepthV2 as TorchUD

    with open(os.path.join(ud, "configs/config_v2_vits14.json")) as f:
        config = json.load(f)
    torch.manual_seed(0)
    ckpt = tmp_path / "ud_vits.pth"
    torch.save(TorchUD(config).state_dict(), str(ckpt))

    out_dir = tmp_path / "metric"
    from batrack_tpu.cli.infer_metric_depth import main

    rc = main(["--img_dir", img_dir, "--out_dir", str(out_dir),
               "--checkpoint", str(ckpt), "--arch", "vits",
               "--resolution_level", "0"])
    assert rc == 0
    files = sorted(f for f in os.listdir(out_dir) if f.endswith(".npz"))
    assert len(files) == 2
    z = np.load(out_dir / files[0])
    assert set(z.files) >= {"depth", "fov", "intrinsics"}
    assert z["depth"].shape == (126, 168) and (z["depth"] > 0).all()
    assert z["intrinsics"].shape == (3, 3)
    assert 10.0 < float(z["fov"]) < 175.0


def test_align_depth_cli(img_dir, tmp_path):
    """Full stage-1 chain tail: provider-schema inputs -> cli.align_depth ->
    normalized metric depth .npy + shared K (the run_slam data.depthdir/
    data.calib inputs). The alignment math itself is golden-tested in
    test_align_ref_parity; this drives the scene-loop CLI wrapper."""
    rng = np.random.default_rng(1)
    depth_dir, data_dir = tmp_path / "depth", tmp_path / "data"
    scene = "clip0"
    mono = depth_dir / "depthAny_disp" / scene
    metric = depth_dir / "unidepthv2" / scene
    mono.mkdir(parents=True)
    metric.mkdir(parents=True)
    (data_dir / scene).mkdir(parents=True)
    K = np.array([[150.0, 0, 84], [0, 150.0, 63], [0, 0, 1]], np.float32)
    for i in range(2):
        depth = rng.uniform(2.0, 6.0, (126, 168)).astype(np.float32)
        disp = (1.0 / depth) * 1.7 + 0.05  # mono disparity, scaled+shifted
        np.save(mono / f"{i:04d}.npy", disp)
        np.savez(metric / f"{i:04d}.npz", depth=depth, intrinsics=K,
                 fov=np.float32(58.0))
        img = rng.integers(0, 256, (126, 168, 3), dtype=np.uint8)
        cv2.imwrite(str(data_dir / scene / f"{i:04d}.png"), img)

    from batrack_tpu.cli.align_depth import main

    rc = main(["--depth_dir", str(depth_dir), "--data_dir", str(data_dir)])
    assert rc == 0
    out = depth_dir / "unidepth_da" / scene
    outs = sorted(os.listdir(out))
    assert len(outs) == 2
    aligned = np.load(out / outs[0])
    assert aligned.shape == (126, 168)
    assert np.isfinite(aligned).all() and (aligned > 0).all()
    k_dir = depth_dir / "unidepth_da_intrinsics" / scene
    k_files = sorted(os.listdir(k_dir))
    assert k_files
    K_out = np.load(k_dir / k_files[0])
    assert K_out.shape == (3, 3) and K_out[0, 0] > 0
