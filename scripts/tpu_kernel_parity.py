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

    xi = jnp.asarray(rng.normal(size=(256, 6)), jnp.float32)
    r = jax.jit(lambda x: se3.log(se3.exp(x)))(xi)
    print(f"se3 exp/log roundtrip max err: {float(jnp.abs(r - xi).max()):.2e}")

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


if __name__ == "__main__":
    main()
