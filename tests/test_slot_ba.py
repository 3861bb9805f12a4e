"""Slot-structured BA == flat-edge BA on identical factor graphs."""

import jax.numpy as jnp
import numpy as np
import pytest

from batrack_tpu.ba import BAProblem, ba_iteration
from batrack_tpu.ba.slot_solver import SlotGraph, slot_ba_iteration
from batrack_tpu.geometry import projective, se3

N, M = 24, 16          # frames, patches/frame
R, NS, S, KF = 3, 2, 4, 2   # ring slots, source slots, window, stride
W, PF = 8, 6           # pose window, patch window (frames)


def build_case(rng, n=14, t0=6, empty_slot=False):
    xs = np.cumsum(rng.normal(size=(N, 6)) * 0.02, axis=0).astype(np.float32)
    xs[0] = 0
    poses = se3.exp(jnp.asarray(xs))
    patches = jnp.asarray(
        np.stack(
            [rng.uniform(60, 580, N * M), rng.uniform(60, 300, N * M),
             1 / rng.uniform(2, 8, N * M)], -1,
        ),
        jnp.float32,
    )
    intr = jnp.tile(jnp.asarray([300.0, 300.0, 320.0, 180.0]), (N, 1))
    monodisp = patches[:, 2] * jnp.asarray(
        np.exp(rng.normal(size=(N * M,)) * 0.05), jnp.float32
    )

    # slot starts: appends at n=10, 12, 14 -> windows start at n-S
    starts = np.array([n - S - 2 * KF, n - S - KF, n - S], np.int32)
    if empty_slot:
        starts[0] = -1
    slot_start = jnp.asarray(starts)

    targets = rng.uniform(50, 400, (R, NS, M, S, 2)).astype(np.float32)
    weights = (rng.uniform(0, 1, (R, NS, M, S, 1)) > 0.3).astype(np.float32)
    weights = np.repeat(weights, 2, axis=-1)
    valid = (rng.uniform(0, 1, (R, NS, M, S)) > 0.2).astype(np.float32)
    if empty_slot:
        valid[0] = 0.0
    graph = SlotGraph(
        targets=jnp.asarray(targets),
        weights=jnp.asarray(weights),
        valid=jnp.asarray(valid),
        slot_start=slot_start,
    )

    # flat equivalent
    ii, jj, kk, tgt, wgt, val = [], [], [], [], [], []
    for r in range(R):
        for qs in range(NS):
            for m in range(M):
                for s in range(S):
                    if starts[r] < 0:
                        i = j = 0
                        ok = 0.0
                    else:
                        i = starts[r] + qs * KF
                        j = starts[r] + s
                        ok = valid[r, qs, m, s] * (i < n) * (j < n)
                    ii.append(i)
                    jj.append(j)
                    kk.append(i * M + m)
                    tgt.append(targets[r, qs, m, s])
                    wgt.append(weights[r, qs, m, s])
                    val.append(ok)
    prob = BAProblem(
        poses=poses, patches=patches, monodisp=monodisp, intrinsics=intr,
        targets=jnp.asarray(np.stack(tgt)), weights=jnp.asarray(np.stack(wgt)),
        ii=jnp.asarray(ii, jnp.int32), jj=jnp.asarray(jj, jnp.int32),
        kk=jnp.asarray(kk, jnp.int32), valid=jnp.asarray(val, jnp.float32),
        t0=jnp.asarray(t0, jnp.int32), n=jnp.asarray(n, jnp.int32),
        base_k=jnp.asarray(max(n - PF, 0) * M, jnp.int32),
    )
    return poses, patches, monodisp, intr, graph, prob


KW = dict(window=W, patch_window=PF, patches_per_frame=M,
          bounds=(0.0, 0.0, 640.0, 360.0), ep=1.0, loss="huber", alpha=0.05)


@pytest.mark.parametrize("structure_only", [False, True])
@pytest.mark.parametrize("empty_slot", [False, True])
def test_slot_matches_flat(rng, structure_only, empty_slot):
    poses, patches, monodisp, intr, graph, prob = build_case(
        rng, empty_slot=empty_slot
    )
    p1, q1 = ba_iteration(prob, structure_only=structure_only, **KW)
    p2, q2 = slot_ba_iteration(
        poses, patches, monodisp, intr, graph,
        prob.t0, prob.n, prob.base_k,
        kf_stride=KF, structure_only=structure_only, **KW,
    )
    # exact in f64 (7e-13); fp32 reorder noise is amplified ~1e3x by the
    # Schur solve, hence the tolerance
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-3)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=2e-3)


def test_slot_matches_flat_warmup(rng):
    """Early-sequence case: slot windows clipped at frame 0, small t0."""
    poses, patches, monodisp, intr, graph, prob = build_case(rng, n=7, t0=1)
    p1, q1 = ba_iteration(prob, **KW)
    p2, q2 = slot_ba_iteration(
        poses, patches, monodisp, intr, graph,
        prob.t0, prob.n, prob.base_k, kf_stride=KF, **KW,
    )
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-3)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=2e-3)
