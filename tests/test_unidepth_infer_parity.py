"""Full UniDepthV2.infer parity vs the imported reference model.

Builds the ACTUAL reference UniDepthV2 (torch CPU, random init, the shipped
config_v2_vitl14.json architecture) and drives its full `infer` path
(/root/reference/UniDepth/unidepth/models/unidepthv2/unidepthv2.py:202-284):
shape-constrained resize, encoder taps/stacking, camera/global/depth decoder,
postprocess resize + K rescale, spherical backprojection — against our
`batrack_tpu.depth.unidepth.infer` through `convert_unidepth_checkpoint`.
This closes the gap the decoder-only parity test leaves open (VERDICT r3 #4b):
an encoder-converter or infer-plumbing bug passes that test but fails here.

Two grids:
  * 518x518 with pixels_bounds pinned to the 37x37 pretrain grid — the
    pos-embed interpolation branch is a no-op on both sides, so every stage
    has exact semantics (tight bound);
  * 210x280 at small bounds — exercises the resize-in (antialiased
    downscale on both sides), pos-embed interpolation (torch-EXACT bicubic
    since r4, `_torch_bicubic_matrix` size mode), postprocess resize-out
    and K/ratio rescale, plus the gt-intrinsics rays branch; bounded by
    the same random-init logdepth layer-norm amplifier as the pretrain
    grid (measured depth 1.1e-3, K 3.4e-6).
"""

import json
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from batrack_tpu.depth.unidepth import (UniDepthV2, convert_unidepth_checkpoint,
                                        infer)
from test_unidepth import _install_stubs

REF_ROOT = os.environ.get("BATRACK_REFERENCE_ROOT", "/root/reference")
UD_ROOT = os.path.join(REF_ROOT, "UniDepth")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(UD_ROOT), reason="reference UniDepth not present"
)


def _build_reference(pixels_bounds, arch="vitl"):
    _install_stubs()
    if UD_ROOT not in sys.path:
        sys.path.insert(0, UD_ROOT)
    from unidepth.models.unidepthv2.unidepthv2 import UniDepthV2 as TorchUD

    with open(os.path.join(UD_ROOT, f"configs/config_v2_{arch}14.json")) as f:
        config = json.load(f)
    config["data"]["shape_constraints"]["pixels_bounds"] = list(pixels_bounds)
    torch.manual_seed(0)
    net = TorchUD(config).eval()
    net.resolution_level = 0  # level 0 -> bound = pixels_bounds[0]
    return net


@pytest.fixture(scope="module", params=["vitl", "vits"])
def small_nets(request):
    """Both released checkpoint families at tiny network resolution
    (144-patch bound) — vits uses the reference's own
    config_v2_vits14.json (12-block dim-384 trunk, identical decoder)."""
    arch = request.param
    tnet = _build_reference((144, 144), arch)
    params = convert_unidepth_checkpoint(tnet.state_dict(), arch=arch)
    return tnet, UniDepthV2(arch=arch, use_nystrom=False), params


def _run_reference(tnet, image_u8, K=None):
    rgb = torch.from_numpy(image_u8).permute(2, 0, 1)
    K_t = None if K is None else torch.from_numpy(np.asarray(K, np.float32))
    with torch.no_grad():
        out = tnet.infer(rgb, K_t)
    return {k: v.squeeze(0).numpy() for k, v in out.items()}


@pytest.mark.slow
def test_infer_parity_pretrain_grid(rng):
    """518x518 at the 37x37 pretrain grid: exact-semantics path."""
    tnet = _build_reference((1369, 1369))
    params = convert_unidepth_checkpoint(tnet.state_dict())
    jnet = UniDepthV2(use_nystrom=False)

    img = rng.integers(0, 256, (518, 518, 3), dtype=np.uint8)
    ref = _run_reference(tnet, img)
    ours = infer(jnet, params, img, pixels_bounds=(1369, 1369),
                 resolution_level=0)

    # depth tolerance note: the decoder layer-norms logdepth over the FULL
    # spatial map before exp (decoder.py:505-508). Under random init the
    # pre-norm logdepth std is tiny, so the norm amplifies f32 drift by
    # 1/std — measured: K/confidence agree to ~1e-5/4e-5 while depth sits at
    # 3.2e-3 with zero-mean spatially-white log-diff (pure round-off through
    # the amplifier, vanishing under trained weights whose logdepth has O(1)
    # variance). A wiring/converter bug produces O(1) errors, far above this.
    for key, tol in [("depth", 1e-2), ("confidence", 1e-3)]:
        r, o = ref[key][0] if ref[key].ndim == 3 else ref[key], ours[key]
        err = np.abs(r - o).max() / max(np.abs(r).max(), 1e-6)
        assert err < tol, f"{key}: rel max err {err}"
    k_err = np.abs(ref["intrinsics"] - ours["intrinsics"]).max() / np.abs(
        ref["intrinsics"]).max()
    assert k_err < 1e-4, f"K: rel err {k_err}"  # measured 1.2e-5
    # points = spherical backprojection through the predicted K
    p_ref = np.transpose(ref["points"], (1, 2, 0))
    p_err = np.abs(p_ref - ours["points"]).max() / max(
        np.abs(p_ref).max(), 1e-6)
    assert p_err < 1e-2, f"points: rel err {p_err}"


@pytest.mark.parametrize("with_K", [False, True], ids=["predK", "gtK"])
def test_infer_parity_resized(small_nets, rng, with_K):
    """210x280 at a 144-patch bound: resize-in/out, K rescale, torch-exact
    pos-embed interpolation, gt-rays branch. Bounds sit just above the
    measured values (depth 1.1e-3 — the logdepth layer-norm amplifier under
    random init; K 3.4e-6)."""
    tnet, jnet, params = small_nets
    img = rng.integers(0, 256, (210, 280, 3), dtype=np.uint8)
    K = np.array([[300.0, 0, 140], [0, 300.0, 105], [0, 0, 1]], np.float32) \
        if with_K else None

    ref = _run_reference(tnet, img, K)
    ours = infer(jnet, params, img, intrinsics=K, pixels_bounds=(144, 144),
                 resolution_level=0)

    r_depth = ref["depth"][0] if ref["depth"].ndim == 3 else ref["depth"]
    d_err = np.abs(r_depth - ours["depth"]).max() / np.abs(r_depth).max()
    assert d_err < 5e-3, f"depth rel err {d_err}"
    if with_K:
        np.testing.assert_allclose(ours["intrinsics"], K, rtol=1e-6)
    else:
        k_err = np.abs(ref["intrinsics"] - ours["intrinsics"]).max() / np.abs(
            ref["intrinsics"]).max()
        assert k_err < 1e-4, f"K rel err {k_err}"
