"""End-to-end DepthAnythingV2 parity vs the imported reference network.

Imports the ACTUAL reference net (/root/reference/Depth-Anything/
depth_anything_v2/dpt.py:153-220, torch CPU, random init) and asserts our
Flax DepthAnythingV2 reproduces its full forward — DINOv2 trunk (12 blocks,
pos-embed add, final norm at the 4 intermediate taps), DPT head (projections,
resize convs, fusion pyramid, output convs) — through `convert_da2_checkpoint`.
This closes the converter gap the block-level tests in test_dpt.py leave
open: a wiring/converter bug upstream of the tested sub-blocks fails here.

Run at 518x518 (= the pretrain grid, 37x37 patches) so the pos-embed
interpolation branch is exact on both sides; the interpolated-resolution
branch is covered separately with its own calibrated bound since torch's
bicubic kernel (A=-0.75) differs from jax.image.resize's Keys kernel.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from batrack_tpu.depth.dpt import DepthAnythingV2, convert_da2_checkpoint
from batrack_tpu.utils.refimport import install_reference_stubs

REF_ROOT = os.environ.get("BATRACK_REFERENCE_ROOT", "/root/reference")
DA2_ROOT = os.path.join(REF_ROOT, "Depth-Anything")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DA2_ROOT), reason="reference Depth-Anything not present"
)

VITS = dict(features=64, out_channels=(48, 96, 192, 384))


@pytest.fixture(scope="module")
def nets():
    install_reference_stubs()
    if DA2_ROOT not in sys.path:
        sys.path.insert(0, DA2_ROOT)
    from depth_anything_v2.dpt import DepthAnythingV2 as TorchDA2

    torch.manual_seed(0)
    tnet = TorchDA2(encoder="vits", features=VITS["features"],
                    out_channels=list(VITS["out_channels"])).eval()
    params = convert_da2_checkpoint(tnet.state_dict(), "vits")
    jnet = DepthAnythingV2(arch="vits", **VITS)
    return tnet, jnet, params


def _forward_both(nets, x_nchw):
    tnet, jnet, params = nets
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x_nchw)).numpy()  # (1, H, W)
    ours = np.asarray(jnet.apply(params, jnp.asarray(
        np.transpose(x_nchw, (0, 2, 3, 1))
    )))
    return ref, ours


def test_full_forward_parity_pretrain_grid(nets, rng):
    """518x518: every stage exact-semantics; converter + wiring must match."""
    x = rng.normal(size=(1, 3, 518, 518)).astype(np.float32)
    ref, ours = _forward_both(nets, x)
    assert ref.shape == ours.shape == (1, 518, 518)
    scale = np.abs(ref).max()
    err = np.abs(ref - ours).max() / max(scale, 1e-6)
    # measured 7.7e-7: f32 drift across 12 blocks + the conv pyramid
    assert err < 1e-5, f"relative max err {err} (scale {scale})"


def test_full_forward_parity_interpolated_grid(nets, rng):
    """280x392 (20x28 patches): exercises the pos-embed interpolation branch
    (dinov2.py:179-211) — torch-EXACT bicubic since r4
    (`_torch_bicubic_matrix`, A=-0.75, scale-factor mode with the +0.1
    offset), so this grid is as tight as the no-interp one and guards the
    interpolation semantics against regression (e.g. back to
    jax.image.resize's Keys A=-0.5 kernel, which measured 5.8e-3 here)."""
    x = rng.normal(size=(1, 3, 280, 392)).astype(np.float32)
    ref, ours = _forward_both(nets, x)
    assert ref.shape == ours.shape == (1, 280, 392)
    scale = np.abs(ref).max()
    err = np.abs(ref - ours).max() / max(scale, 1e-6)
    assert err < 1e-5, f"relative max err {err} (scale {scale})"  # measured 2.2e-6


ARCH_CONFIGS = {
    "vitb": dict(features=128, out_channels=(96, 192, 384, 768)),
    "vitl": dict(features=256, out_channels=(256, 512, 1024, 1024)),
}


@pytest.mark.slow
@pytest.mark.parametrize("arch", ["vitb", "vitl"])
def test_full_forward_parity_other_arches(arch, rng):
    """vitb/vitl converters + wiring end-to-end (run_videos_v2.py:41-46
    model_configs) at the cheap interpolated grid (the vits tests cover
    both grids; the per-arch deltas are dims/taps, not semantics)."""
    install_reference_stubs()
    if DA2_ROOT not in sys.path:
        sys.path.insert(0, DA2_ROOT)
    from depth_anything_v2.dpt import DepthAnythingV2 as TorchDA2

    cfg = ARCH_CONFIGS[arch]
    torch.manual_seed(0)
    tnet = TorchDA2(encoder=arch, features=cfg["features"],
                    out_channels=list(cfg["out_channels"])).eval()
    params = convert_da2_checkpoint(tnet.state_dict(), arch)
    jnet = DepthAnythingV2(arch=arch, **cfg)

    x = rng.normal(size=(1, 3, 280, 392)).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x)).numpy()
    ours = np.asarray(jnet.apply(params, jnp.asarray(
        np.transpose(x, (0, 2, 3, 1)))))
    assert ref.shape == ours.shape == (1, 280, 392)
    scale = np.abs(ref).max()
    err = np.abs(ref - ours).max() / max(scale, 1e-6)
    assert err < 1e-4, f"{arch}: relative max err {err} (scale {scale})"
