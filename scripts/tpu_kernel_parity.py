"""Real-TPU kernel parity: Pallas kernels vs XLA reference paths.

Run on hardware (NOT interpret mode) and paste the output into
TPU_PARITY.md. See that file for the acceptance rationale.
"""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() not in ("cpu", "gpu"), (
        "this script records HARDWARE parity; run it on the TPU"
    )
    rng = np.random.default_rng(0)

    # ---- se3 sanity
    from batrack_tpu.geometry import se3

    # log returns the principal branch (|angle| <= pi, lietorch convention,
    # quaternion.py::so3_log) — keep sampled rotation norms inside it, else
    # the roundtrip "error" is the 2*pi branch gap, not a numerics problem.
    xi = np.asarray(rng.normal(size=(256, 6)), np.float32)
    wn = np.linalg.norm(xi[:, 3:], axis=-1, keepdims=True)
    xi[:, 3:] *= np.minimum(1.0, 3.0 / np.maximum(wn, 1e-9))
    xi = jnp.asarray(xi)
    r = jax.jit(lambda x: se3.log(se3.exp(x)))(xi)
    print(f"se3 exp/log roundtrip max err: {float(jnp.abs(r - xi).max()):.2e}")
    g = jax.jit(lambda x: se3.exp(x))(xi)
    g2 = jax.jit(lambda x: se3.exp(se3.log(x)))(g)
    print(f"se3 group roundtrip max err:   {float(jnp.abs(g2 - g).max()):.2e}")

    # ---- pallas corr kernel vs XLA path (incl. out-of-bounds coords)
    from batrack_tpu.ops.corr import build_pyramid, corr_sample_pyramid
    from batrack_tpu.ops.pallas_corr import corr_sample_pyramid_pallas

    S, C, H, W, N = 4, 128, 96, 128, 512
    fmaps = jnp.asarray(rng.normal(size=(S, C, H, W)), jnp.float32)
    targets = jnp.asarray(rng.normal(size=(S, N, C)), jnp.float32)
    coords = jnp.asarray(
        np.stack([rng.uniform(-8, W + 8, (S, N)),
                  rng.uniform(-8, H + 8, (S, N))], -1), jnp.float32)
    pyr = build_pyramid(fmaps, 4)
    a = jax.jit(lambda: corr_sample_pyramid(pyr, targets, coords, 3))()
    b = jax.jit(lambda: corr_sample_pyramid_pallas(
        pyr, jnp.moveaxis(targets, 0, 1), coords, 3))()
    b = jnp.moveaxis(b, 0, 1)
    err = float(jnp.abs(a - b).max())
    scale = float(jnp.abs(a).max())
    print(f"pallas corr vs XLA: abs {err:.4f}, rel {err / scale:.2e} "
          f"(S={S} C={C} {H}x{W} N={N} r=3 L=4, oob coords)")

    # ---- flash attention vs dense (production space-attention shape)
    from batrack_tpu.tracker.blocks import _tpu_flash_attention

    B, Hh, Nq, D = 12, 8, 2400, 48
    q = jnp.asarray(rng.normal(size=(B, Hh, Nq, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Hh, Nq, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Hh, Nq, D)), jnp.float32)
    scale_a = D ** -0.5

    def dense(q, k, v):
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale_a
        attn = jax.nn.softmax(attn, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", attn, v)

    fl = jax.jit(lambda q, k, v: _tpu_flash_attention(q, k, v, scale_a))(q, k, v)
    dn = jax.jit(dense)(q, k, v)
    print(f"flash vs dense attention: abs {float(jnp.abs(fl - dn).max()):.2e} "
          f"(B={B} h={Hh} N={Nq} d={D})")

    # ---- masked flash (key_mask -> segment ids) vs masked dense
    mask = jnp.asarray(rng.uniform(size=Nq) > 0.3)

    def dense_masked(q, k, v):
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale_a
        attn = jnp.where(mask[None, None, None, :], attn, -1e30)
        return jnp.einsum(
            "bhqk,bhkd->bhqd", jax.nn.softmax(attn, axis=-1), v)

    flm = jax.jit(
        lambda q, k, v: _tpu_flash_attention(q, k, v, scale_a, mask))(q, k, v)
    dnm = jax.jit(dense_masked)(q, k, v)
    err_m = float(jnp.abs(flm - dnm).max())
    print(f"masked flash vs masked dense: abs {err_m:.2e} "
          f"({int(mask.sum())}/{Nq} keys active)")

    # ---- fused packed-qkv kernel: parity + timing A/B vs the XLA layout
    # path (reshape -> head split -> flash -> head merge). Both consume the
    # same (B, N, 3C) qkv activation, exactly what Attention.__call__ swaps.
    import time

    from batrack_tpu.ops.pallas_attention import fused_qkv_attention

    C = Hh * D
    qkv = jnp.asarray(rng.normal(size=(B, Nq, 3 * C)), jnp.float32)

    def xla_path(x):
        t = x.reshape(B, Nq, 3, Hh, D)
        qq, kk, vv = jnp.moveaxis(t, 2, 0)
        qq, kk, vv = (jnp.moveaxis(a, 1, 2) for a in (qq, kk, vv))
        o = _tpu_flash_attention(qq, kk, vv, scale_a)
        return jnp.moveaxis(o, 1, 2).reshape(B, Nq, C)

    def dense_path(x):
        t = x.reshape(B, Nq, 3, Hh, D)
        qq, kk, vv = jnp.moveaxis(t, 2, 0)
        qq, kk, vv = (jnp.moveaxis(a, 1, 2) for a in (qq, kk, vv))
        return jnp.moveaxis(dense(qq, kk, vv), 1, 2).reshape(B, Nq, C)

    def dense_path_masked(x):
        t = x.reshape(B, Nq, 3, Hh, D)
        qq, kk, vv = jnp.moveaxis(t, 2, 0)
        qq, kk, vv = (jnp.moveaxis(a, 1, 2) for a in (qq, kk, vv))
        return jnp.moveaxis(
            dense_masked(qq, kk, vv), 1, 2).reshape(B, Nq, C)

    fns = {
        "fused_qkv(pallas)": jax.jit(
            lambda x: fused_qkv_attention(x, Hh, scale_a)),
        "split+flash(xla)": jax.jit(xla_path),
        "split+dense(xla)": jax.jit(dense_path),
    }
    ref_o = fns["split+dense(xla)"](qkv)
    fu_o = fns["fused_qkv(pallas)"](qkv)
    print(f"fused qkv vs dense: abs {float(jnp.abs(fu_o - ref_o).max()):.2e} "
          f"(packed B={B} N={Nq} 3C={3 * C})")

    fu_m = jax.jit(
        lambda x: fused_qkv_attention(x, Hh, scale_a, key_mask=mask))(qkv)
    dn_m = jax.jit(
        lambda x: dense_path_masked(x))(qkv)
    print(f"masked fused qkv vs masked dense: abs "
          f"{float(jnp.abs(fu_m - dn_m).max()):.2e} "
          f"({int(mask.sum())}/{Nq} keys active)")

    reps = 30
    for name, fn in fns.items():
        o = fn(qkv)
        float(o[0, 0, 0])  # warm + sync (block_until_ready lies on axon)
        t0 = time.time()
        for _ in range(reps):
            o = fn(qkv)
        float(o[0, 0, 0])
        dt = (time.time() - t0) / reps * 1000
        print(f"  {name}: {dt:.2f} ms/block (x{reps}, incl. amortised "
              f"dispatch)")

    # bf16 variants (the production compute dtype)
    qkv16 = qkv.astype(jnp.bfloat16)
    for name, fn in fns.items():
        o = fn(qkv16)
        float(o[0, 0, 0].astype(jnp.float32))
        t0 = time.time()
        for _ in range(reps):
            o = fn(qkv16)
        float(o[0, 0, 0].astype(jnp.float32))
        dt = (time.time() - t0) / reps * 1000
        print(f"  {name} bf16: {dt:.2f} ms/block")

    # ---- shard_map-wrapped kernels on HARDWARE (1-device ("track",) mesh):
    # parity + per-chip cost of the multi-chip code path vs the plain
    # kernels (VERDICT r3 #1 — the one measurable piece of the scaling
    # story on a single-chip tunnel). The wrapper adds pad/mask plumbing
    # and, for attention, the all-gather machinery even at n_devices=1.
    from batrack_tpu.parallel import get_mesh
    from batrack_tpu.parallel.shard_kernels import (
        corr_sample_pyramid_sharded, fused_qkv_attention_sharded)

    mesh1 = get_mesh(1, ("track",))

    def timed_ms(fn, sync, reps=reps, warmup=2):
        for _ in range(warmup):
            o = fn()
        sync(o)
        t0 = time.time()
        for _ in range(reps):
            o = fn()
        sync(o)
        return (time.time() - t0) / reps * 1000

    # corr: plain vs sharded on the SAME inputs
    tgt_tm = jnp.moveaxis(targets, 0, 1)  # (N, S, C) track-major
    plain_corr = jax.jit(
        lambda: corr_sample_pyramid_pallas(pyr, tgt_tm, coords, 3))
    shard_corr = jax.jit(
        lambda: corr_sample_pyramid_sharded(pyr, tgt_tm, coords, 3, mesh1))
    c_p, c_s = plain_corr(), shard_corr()
    err = float(jnp.abs(c_p - c_s).max())
    ms_p = timed_ms(plain_corr, lambda o: float(o[0, 0, 0]))
    ms_s = timed_ms(shard_corr, lambda o: float(o[0, 0, 0]))
    print(f"sharded corr (1-dev mesh) vs plain: abs {err:.2e}; "
          f"{ms_s:.2f} vs {ms_p:.2f} ms "
          f"({(ms_s / ms_p - 1) * 100:+.1f}% mesh overhead)")

    # attention: plain fused vs sharded fused, bf16 production dtype
    plain_att = jax.jit(lambda: fused_qkv_attention(qkv16, Hh, scale_a))
    shard_att = jax.jit(
        lambda: fused_qkv_attention_sharded(qkv16, Hh, scale_a, mesh1))
    a_p, a_s = plain_att(), shard_att()
    err = float(jnp.abs(a_p.astype(jnp.float32)
                        - a_s.astype(jnp.float32)).max())
    sync_a = lambda o: float(o[0, 0, 0].astype(jnp.float32))  # noqa: E731
    ms_p = timed_ms(plain_att, sync_a)
    ms_s = timed_ms(shard_att, sync_a)
    print(f"sharded fused qkv (1-dev mesh) vs plain bf16: abs {err:.2e}; "
          f"{ms_s:.2f} vs {ms_p:.2f} ms "
          f"({(ms_s / ms_p - 1) * 100:+.1f}% mesh overhead)")


if __name__ == "__main__":
    main()
