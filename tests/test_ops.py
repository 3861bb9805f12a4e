"""Golden tests for sampling/correlation ops against straightforward numpy
references (SURVEY.md §4c: patchify/corr checked vs pure numpy)."""

import jax.numpy as jnp
import numpy as np
import pytest

from batrack_tpu.ops import (
    avg_pool2d,
    bilinear_sample2d,
    build_pyramid,
    corr_sample_pyramid,
    interpolate_bilinear,
    patchify,
)


def np_bilinear(im, x, y):
    """Reference bilinear sampling, clamped indices (model_utils.py:75-169)."""
    B, C, H, W = im.shape
    x0 = np.floor(x)
    y0 = np.floor(y)
    x1, y1 = x0 + 1, y0 + 1
    x0c = np.clip(x0, 0, W - 1).astype(int)
    x1c = np.clip(x1, 0, W - 1).astype(int)
    y0c = np.clip(y0, 0, H - 1).astype(int)
    y1c = np.clip(y1, 0, H - 1).astype(int)
    out = np.zeros((B, C, x.shape[1]))
    for b in range(B):
        for n in range(x.shape[1]):
            i00 = im[b, :, y0c[b, n], x0c[b, n]]
            i01 = im[b, :, y0c[b, n], x1c[b, n]]
            i10 = im[b, :, y1c[b, n], x0c[b, n]]
            i11 = im[b, :, y1c[b, n], x1c[b, n]]
            w00 = (x1[b, n] - x[b, n]) * (y1[b, n] - y[b, n])
            w01 = (x[b, n] - x0[b, n]) * (y1[b, n] - y[b, n])
            w10 = (x1[b, n] - x[b, n]) * (y[b, n] - y0[b, n])
            w11 = (x[b, n] - x0[b, n]) * (y[b, n] - y0[b, n])
            out[b, :, n] = w00 * i00 + w01 * i01 + w10 * i10 + w11 * i11
    return out


def test_bilinear_sample2d_matches_numpy(rng):
    im = rng.normal(size=(2, 3, 20, 30)).astype(np.float32)
    x = rng.uniform(-2, 32, size=(2, 17)).astype(np.float32)
    y = rng.uniform(-2, 22, size=(2, 17)).astype(np.float32)
    out = bilinear_sample2d(jnp.asarray(im), jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(out, np_bilinear(im, x, y), rtol=1e-4, atol=1e-4)


def test_bilinear_sample2d_inbounds(rng):
    im = jnp.ones((1, 1, 10, 10))
    x = jnp.asarray([[-1.0, 5.0, 9.6]])
    y = jnp.asarray([[5.0, 5.0, 5.0]])
    _, inb = bilinear_sample2d(im, x, y, return_inbounds=True)
    np.testing.assert_array_equal(np.asarray(inb[0]), [0.0, 1.0, 0.0])


def test_patchify_r0_is_bilinear_sample(rng):
    """radius=0 patchify == bilinear interpolation (the SLAM path,
    batrack.py:321-323)."""
    im = rng.normal(size=(1, 3, 24, 32)).astype(np.float32)
    coords = np.stack(
        [rng.uniform(1, 30, size=(1, 9)), rng.uniform(1, 22, size=(1, 9))], -1
    ).astype(np.float32)
    out = patchify(jnp.asarray(im), jnp.asarray(coords), 0)  # (1, 9, 3, 1, 1)
    ref = np_bilinear(im, coords[..., 0], coords[..., 1])  # (1, 3, 9)
    np.testing.assert_allclose(out[0, :, :, 0, 0].T, ref[0], rtol=1e-4, atol=1e-4)


def test_patchify_integer_coords(rng):
    im = rng.normal(size=(1, 2, 16, 16)).astype(np.float32)
    coords = jnp.asarray([[[5.0, 7.0]]])
    out = patchify(jnp.asarray(im), coords, 1)  # (1, 1, 2, 3, 3)
    np.testing.assert_allclose(out[0, 0], im[0][:, 6:9, 4:7], rtol=1e-5, atol=1e-5)


def test_corr_fused_matches_full_volume(rng):
    """Fused gather-correlation == materialised volume + bilinear sampling
    (CorrBlock.corr/sample, blocks.py:326-385)."""
    S, C, H, W, N = 3, 16, 16, 24, 7
    fmaps = rng.normal(size=(S, C, H, W)).astype(np.float32)
    targets = rng.normal(size=(S, N, C)).astype(np.float32)
    coords = np.stack(
        [rng.uniform(4, 19, size=(S, N)), rng.uniform(4, 11, size=(S, N))], -1
    ).astype(np.float32)
    radius, levels = 2, 2

    pyramid = build_pyramid(jnp.asarray(fmaps), levels)
    out = corr_sample_pyramid(pyramid, jnp.asarray(targets), jnp.asarray(coords), radius)

    # reference path: full (S, N, H, W) volume then the CorrBlock.sample
    # window (blocks.py:343-369): zero-padded grid_sample bilinear taps, and
    # the transposed delta layout — window element [i, j] samples the volume
    # at (x + off_i, y + off_j)
    d = 2 * radius + 1
    expected = []
    for lvl in range(levels):
        fm = np.asarray(pyramid[lvl])
        _, _, Hl, Wl = fm.shape
        vol = np.einsum("snc,schw->snhw", targets, fm) / np.sqrt(C)
        lvl_out = np.zeros((S, N, d, d), np.float32)
        for s in range(S):
            for n in range(N):
                cx, cy = coords[s, n] / (2**lvl)
                for i, dx in enumerate(range(-radius, radius + 1)):
                    for j, dy in enumerate(range(-radius, radius + 1)):
                        x, y = cx + dx, cy + dy
                        x0, y0 = int(np.floor(x)), int(np.floor(y))
                        wx, wy = x - x0, y - y0
                        def at(yy, xx):
                            if 0 <= yy < Hl and 0 <= xx < Wl:
                                return vol[s, n, yy, xx]
                            return 0.0
                        lvl_out[s, n, i, j] = (
                            (1 - wy) * (1 - wx) * at(y0, x0)
                            + (1 - wy) * wx * at(y0, x0 + 1)
                            + wy * (1 - wx) * at(y0 + 1, x0)
                            + wy * wx * at(y0 + 1, x0 + 1)
                        )
        expected.append(lvl_out.reshape(S, N, d * d))
    expected = np.concatenate(expected, -1)
    np.testing.assert_allclose(out, expected, rtol=1e-3, atol=1e-3)


def test_avg_pool2d(rng):
    x = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)
    out = avg_pool2d(jnp.asarray(x), 2, 2)
    ref = x.reshape(2, 3, 4, 2, 4, 2).mean(axis=(3, 5))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_interpolate_bilinear_identity(rng):
    x = rng.normal(size=(3, 10, 12)).astype(np.float32)
    out = interpolate_bilinear(jnp.asarray(x), (10, 12))
    np.testing.assert_allclose(out, x, rtol=1e-5, atol=1e-5)


def test_interpolate_align_corners_endpoints(rng):
    x = rng.normal(size=(1, 4, 4)).astype(np.float32)
    out = np.asarray(interpolate_bilinear(jnp.asarray(x), (7, 7), align_corners=True))
    np.testing.assert_allclose(out[:, 0, 0], x[:, 0, 0], rtol=1e-5)
    np.testing.assert_allclose(out[:, -1, -1], x[:, -1, -1], rtol=1e-5)


@pytest.mark.slow
def test_pallas_corr_matches_xla(rng):
    """Fused Pallas correlation kernel (interpret mode) == XLA path within
    bf16 feature-map tolerance, including far out-of-range coords."""
    from batrack_tpu.ops.pallas_corr import corr_sample_pyramid_pallas

    S, C, N, H, W = 3, 128, 70, 32, 48
    fmaps = jnp.asarray(rng.normal(size=(S, C, H, W)).astype(np.float32))
    targets = jnp.asarray(rng.normal(size=(S, N, C)).astype(np.float32))
    coords = jnp.asarray(
        np.stack(
            [rng.uniform(-10, W + 10, (S, N)), rng.uniform(-10, H + 10, (S, N))], -1
        ).astype(np.float32)
    )
    pyr = build_pyramid(fmaps, 3)
    ref = corr_sample_pyramid(pyr, targets, coords, 3)  # (S, N, LRR)
    out = corr_sample_pyramid_pallas(
        pyr, jnp.moveaxis(targets, 0, 1), coords, 3, interpret=True
    )  # track-major (N, S, LRR)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(out), 0, 1), np.asarray(ref), atol=2e-2
    )

    # contract="mxu" variant (measured-negative on hardware, kept for the
    # record — ROOFLINE.md r4): same semantics, bf16-target tolerance
    out_mxu = corr_sample_pyramid_pallas(
        pyr, jnp.moveaxis(targets, 0, 1), coords, 3, interpret=True,
        contract="mxu",
    )
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(out_mxu), 0, 1), np.asarray(ref), atol=3e-2
    )

    # fmap_dtype="int8" variant (measured near-neutral on hardware — the
    # kernel is load-ISSUE-bound, not byte-bound; ROOFLINE.md r5): same
    # semantics within the per-level symmetric-quantisation budget
    # (~amax/254 per element, averaged ~sqrt(C) down by the channel sum)
    out_i8 = corr_sample_pyramid_pallas(
        pyr, jnp.moveaxis(targets, 0, 1), coords, 3, interpret=True,
        fmap_dtype="int8",
    )
    d = np.abs(np.moveaxis(np.asarray(out_i8), 0, 1) - np.asarray(ref))
    scale = np.abs(np.asarray(ref)).max()
    assert d.max() / scale < 2e-2, d.max() / scale
    assert np.sqrt((d ** 2).mean()) / scale < 3e-3


def test_fused_qkv_attention_matches_dense(rng):
    """Packed-qkv Pallas attention (interpret mode) == dense multi-head
    softmax attention, including the padded-key masking path."""
    from batrack_tpu.ops.pallas_attention import fused_qkv_attention

    B, N, H, d = 3, 200, 8, 48
    C = H * d
    qkv = jnp.asarray(rng.normal(size=(B, N, 3 * C)).astype(np.float32))
    scale = d ** -0.5

    q, k, v = [
        np.moveaxis(
            np.asarray(qkv[..., i * C:(i + 1) * C]).reshape(B, N, H, d), 1, 2
        )
        for i in range(3)
    ]
    logits = np.einsum("bhqd,bhkd->bhqk", q, k) * scale
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.moveaxis(np.einsum("bhqk,bhkd->bhqd", p, v), 1, 2).reshape(B, N, C)

    out = fused_qkv_attention(qkv, H, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)

    # key_mask path: inactive keys excluded from every query's softmax
    # (the production space-attention call when n_wind > 1 always passes
    # the active-track mask, mdtracker.py; semantics must match the flash
    # path's segment ids)
    mask = rng.uniform(size=N) > 0.3
    logits_m = np.where(mask[None, None, None, :], logits, -1e30)
    pm = np.exp(logits_m - logits_m.max(-1, keepdims=True))
    pm /= pm.sum(-1, keepdims=True)
    ref_m = np.moveaxis(
        np.einsum("bhqk,bhkd->bhqd", pm, v), 1, 2).reshape(B, N, C)
    out_m = fused_qkv_attention(
        qkv, H, scale, interpret=True, key_mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out_m), ref_m, atol=2e-5)

    # slim (B, Nk, 2C) K/V-only kv source (what the track-sharded wrapper
    # all-gathers, parallel/shard_kernels.py) == the full packed-qkv source
    out_slim = fused_qkv_attention(
        qkv, H, scale, interpret=True, kv=qkv[:, :, C:])
    np.testing.assert_allclose(np.asarray(out_slim), ref, atol=2e-5)


def test_chunked_attention_key_mask_matches_dense(rng):
    """Masked chunked (online-softmax) attention == masked dense softmax."""
    import jax
    import jax.numpy as jnp2

    from batrack_tpu.tracker.blocks import _chunked_attention

    B, H, N, D = 2, 3, 50, 16
    q, k, v = (jnp.asarray(rng.normal(size=(B, H, N, D)).astype(np.float32))
               for _ in range(3))
    mask = jnp.asarray(rng.uniform(size=N) > 0.3)
    scale = D ** -0.5

    attn = jnp2.einsum("bhqd,bhkd->bhqk", q, k) * scale
    attn = jnp2.where(mask[None, None, None, :], attn, -1e30)
    ref = jnp2.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(attn, -1), v)

    out = _chunked_attention(q, k, v, scale, chunk=16, key_mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
