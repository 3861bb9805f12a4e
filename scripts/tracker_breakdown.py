"""Per-component device timing of the tracker forward at production shapes.

Times each hot component of the MDTracker forward standalone on the current
backend (run on the TPU chip), multiplies by its calls-per-forward, and
compares the sum against the measured full forward — the residual is layout/
embedding/small-op glue. This is the measurement behind ROOFLINE.md's
tracker table; re-run after any kernel change.

Usage: timeout 900 python scripts/tracker_breakdown.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from batrack_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from batrack_tpu.ops.corr import build_pyramid  # noqa: E402
from batrack_tpu.ops.pallas_corr import corr_sample_pyramid_pallas  # noqa: E402
from batrack_tpu.tracker.adapter import MDTrackerAdapter  # noqa: E402
from batrack_tpu.tracker.blocks import BasicEncoder, UpdateFormer  # noqa: E402
from batrack_tpu.utils.config import Config  # noqa: E402


def _flush(x):
    # the tunneled backend's block_until_ready returns early; a scalar fetch
    # is the only reliable queue drain (same workaround as bench.py)
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.ravel(leaf)[0])


def timeit(fn, *args, reps=10, warmup=3):
    for _ in range(warmup):
        _flush(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _flush(out)
    return (time.perf_counter() - t0) / reps * 1000.0


def main():
    cfg = Config()
    m = cfg.model
    dtype = jnp.dtype(m.compute_dtype)
    S, C, N = m.S, m.latent_dim, 2400      # production: 400 patches x 6 appends
    h4, w4 = m.interp_shape[0] // m.stride, m.interp_shape[1] // m.stride
    input_dim = 130 + m.corr_levels * (2 * m.corr_radius + 1) ** 2 + C + 2
    rng = np.random.default_rng(0)
    rows = []

    # ---- full forward (production adapter config) ------------------------
    ad = MDTrackerAdapter(m)
    HT, WD = 480, 640
    window = jnp.asarray(rng.uniform(0, 255, (S, 4, HT, WD)), jnp.float32)
    window = window.at[:, 3].set(
        jnp.asarray(rng.uniform(2.0, 8.0, (S, HT, WD)), jnp.float32))
    queries = jnp.asarray(np.stack([
        rng.integers(0, S, N).astype(np.float32),
        rng.uniform(8, WD - 8, N), rng.uniform(8, HT - 8, N),
        rng.uniform(2.0, 8.0, N)], -1), jnp.float32)
    win_p, q_p = ad._prepare(window, queries)
    ad.params = jax.jit(ad.model.init)(jax.random.PRNGKey(0), win_p, q_p)
    full = timeit(
        lambda: ad._apply(ad.params, window, queries, None, reuse=0)[0].tracks,
        reps=5)
    rows.append(("full forward", full, 1, full))

    # ---- UpdateFormer (main: 4 calls/forward; dyn: 2 at half depth) ------
    uf = UpdateFormer(
        space_depth=m.space_depth, time_depth=m.time_depth,
        input_dim=input_dim, hidden_size=m.hidden_size,
        num_heads=m.num_heads, output_dim=C + 3, mlp_ratio=4.0,
        add_space_attn=m.add_space_attn, dtype=dtype,
        use_flash=m.use_flash_attention)
    x = jnp.asarray(rng.normal(0, 1, (1, N, S, input_dim)), jnp.float32)
    ufp = jax.jit(uf.init)(jax.random.PRNGKey(0), x)
    f_uf = jax.jit(uf.apply)
    t_uf = timeit(f_uf, ufp, x)
    n_uf = m.I + m.static_iters * (m.time_depth_dyn / m.time_depth)
    rows.append((f"UpdateFormer ({m.time_depth}t/{m.space_depth}s)",
                 t_uf, n_uf, t_uf * n_uf))

    # ---- corr pyramid (6 iterations/forward) ------------------------------
    fmaps = jnp.asarray(rng.normal(0, 1, (S, C, h4, w4)), dtype)
    targets = jnp.asarray(rng.normal(0, 1, (N, S, C)), dtype)
    coords = jnp.asarray(
        np.stack([rng.uniform(0, w4, (S, N)), rng.uniform(0, h4, (S, N))], -1),
        jnp.float32)

    def corr_call(fm, tg, cd):
        pyr = build_pyramid(fm, m.corr_levels)
        return corr_sample_pyramid_pallas(pyr, tg, cd, m.corr_radius)

    f_corr = jax.jit(corr_call)
    t_corr = timeit(f_corr, fmaps, targets, coords)
    n_corr = m.I + m.static_iters
    rows.append(("corr pyramid (pallas)", t_corr, n_corr, t_corr * n_corr))

    # ---- fnet on the 2 new frames (cross-append cache) --------------------
    enc = BasicEncoder(output_dim=C, stride=m.stride, dtype=dtype)
    frames = jnp.asarray(
        rng.normal(0, 1, (2, m.interp_shape[0], m.interp_shape[1], 3)),
        jnp.float32)
    ep = jax.jit(enc.init)(jax.random.PRNGKey(0), frames)
    f_enc = jax.jit(enc.apply)
    t_enc = timeit(f_enc, ep, frames)
    rows.append(("fnet (2 new frames)", t_enc, 1, t_enc))

    # ---- report ------------------------------------------------------------
    acc = sum(r[3] for r in rows[1:])
    print(f"backend={jax.default_backend()} dtype={dtype} "
          f"N={N} S={S} grid={h4}x{w4}")
    for name, per, cnt, tot in rows:
        print(f"  {name:38s} {per:8.2f} ms/call x {cnt:4.1f} = {tot:7.1f} ms")
    print(f"  {'accounted (components)':38s} {'':8s}   {'':6s}   {acc:7.1f} ms")
    print(f"  {'residual (glue/layout/embeds)':38s} {'':8s}   {'':6s} "
          f"  {rows[0][3] - acc:7.1f} ms")


if __name__ == "__main__":
    main()
