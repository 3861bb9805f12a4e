"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from batrack_tpu.parallel import get_mesh, sharded_ba_iteration
from batrack_tpu.ba import BAProblem, ba_iteration
from batrack_tpu.geometry import projective, se3


def make_problem(rng, E=1024):
    N, M = 8, 12
    xs = np.cumsum(rng.normal(size=(N, 6)) * 0.03, axis=0).astype(np.float32)
    xs[0] = 0
    poses = se3.exp(jnp.asarray(xs))
    patches = jnp.asarray(
        np.stack(
            [rng.uniform(100, 500, N * M), rng.uniform(100, 300, N * M),
             1 / rng.uniform(2, 8, N * M)], -1
        ),
        jnp.float32,
    )
    intr = jnp.tile(jnp.asarray([300.0, 300.0, 320.0, 180.0]), (N, 1))
    kk = jnp.asarray(rng.integers(0, N * M, E), jnp.int32)
    ii = kk // M
    jj = jnp.asarray(rng.integers(0, N, E), jnp.int32)
    targets, valid, _ = projective.transform(poses, patches, intr, ii, jj, kk)
    targets = targets + jnp.asarray(rng.normal(size=(E, 2)), jnp.float32)
    return BAProblem(
        poses=poses, patches=patches, monodisp=patches[:, 2], intrinsics=intr,
        targets=targets, weights=jnp.ones_like(targets), ii=ii, jj=jj, kk=kk,
        valid=valid, t0=jnp.asarray(1, jnp.int32), n=jnp.asarray(N, jnp.int32),
        base_k=jnp.asarray(0, jnp.int32),
    )


KW = dict(window=8, patch_window=8, patches_per_frame=12,
          bounds=(0.0, 0.0, 640.0, 360.0), ep=1.0, loss="huber", alpha=0.05)


def test_devices_available():
    assert len(jax.devices()) == 8, jax.devices()


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_sharded_ba_matches_single(rng, n_dev):
    prob = make_problem(rng)
    mesh = get_mesh(n_dev, ("edge",))
    p1, q1 = ba_iteration(prob, **KW)
    p2, q2 = sharded_ba_iteration(prob, mesh, "edge", **KW)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=2e-4)


def test_sharded_ba_structure_only(rng):
    prob = make_problem(rng)
    mesh = get_mesh(4, ("edge",))
    p1, q1 = ba_iteration(prob, structure_only=True, **KW)
    p2, q2 = sharded_ba_iteration(prob, mesh, "edge", structure_only=True, **KW)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=2e-4)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)


def test_sharded_tracker_matches_single(rng):
    from batrack_tpu.parallel.sharded_tracker import sharded_tracker_apply
    from batrack_tpu.tracker.mdtracker import MDTracker, TrackerParams

    p = TrackerParams(S=4, iters=1, static_iters=1, interp_shape=(32, 48))
    model = MDTracker(p)
    T, H, W, N = 4, 32, 48, 16
    window = jnp.asarray(rng.uniform(0, 255, (T, 4, H, W)), jnp.float32)
    window = window.at[:, 3].set(jnp.asarray(rng.uniform(2, 6, (T, H, W)), jnp.float32))
    queries = jnp.asarray(
        np.stack([np.zeros(N), rng.uniform(5, W - 5, N), rng.uniform(5, H - 5, N),
                  rng.uniform(2, 6, N)], -1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), window, queries)

    ref = model.apply(params, window, queries)[:5]
    mesh = get_mesh(4, ("track",))
    out = sharded_tracker_apply(model, params, window, queries, mesh, "track")
    # sharded reductions reorder float accumulation and the iterative
    # refinement amplifies it; parity to ~0.05 px is the meaningful bar
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-2)


def test_dryrun_multichip():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_sharded_space_attention_block_parity(rng):
    """Strict PRE-amplification parity: one UpdateFormer block under the
    track sharding must match unsharded to float noise (1e-5), so a real
    divergence cannot hide behind the iterative-refinement chaos budget
    that the e2e tracker test (5e-2) must allow."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from batrack_tpu.tracker.blocks import UpdateFormer

    model = UpdateFormer(space_depth=1, time_depth=1, input_dim=456,
                         hidden_size=384, num_heads=8, output_dim=131)
    x = jnp.asarray(rng.normal(size=(1, 16, 4, 456)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    ref = model.apply(params, x)

    mesh = get_mesh(4, ("track",))

    @jax.jit
    def fwd(x):
        x = jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(None, "track"))
        )
        return model.apply(params, x)

    np.testing.assert_allclose(np.asarray(ref), np.asarray(fwd(x)), atol=1e-5)


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_patch_sharded_slot_ba_matches_single(rng, n_dev):
    """The production multi-chip BA layout: patch axis sharded, distributed
    Schur (parallel/sharded_slot_ba.py) == single-device slot solver."""
    import functools

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from batrack_tpu.ba.slot_solver import (
        SlotGraph, slot_ba_iteration, slot_ba_iteration_fm,
    )
    from test_slot_ba import KW, M, N, build_case

    poses, patches, monodisp, intr, graph, prob = build_case(rng)
    p1, q1 = slot_ba_iteration(
        poses, patches, monodisp, intr, graph,
        prob.t0, prob.n, prob.base_k, kf_stride=2, **KW,
    )

    mesh = get_mesh(n_dev, ("patch",))
    core = functools.partial(
        slot_ba_iteration_fm, kf_stride=2, axis_name="patch",
        shard_mode="patches", **KW,
    )
    g_spec = SlotGraph(targets=P(None, None, "patch"),
                       weights=P(None, None, "patch"),
                       valid=P(None, None, "patch"), slot_start=P())

    def step(poses, p_fm, md_fm, intr, graph):
        return core(poses, p_fm, md_fm, intr, graph,
                    prob.t0, prob.n, prob.base_k // M)

    p2, q2_fm = shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(None, "patch"), P(None, "patch"), P(), g_spec),
        out_specs=(P(), P(None, "patch")),
    )(poses, patches.reshape(N, M, 3), monodisp.reshape(N, M), intr, graph)

    # exact in f64 (9e-13, measured); in f32 the psum's partial-sum order
    # differs from the single-device reduction and the Schur solve amplifies
    # the reorder noise ~1e3x (same budget as test_slot_ba.py's flat-vs-slot)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(q1), np.asarray(q2_fm).reshape(-1, 3), atol=2e-3
    )
