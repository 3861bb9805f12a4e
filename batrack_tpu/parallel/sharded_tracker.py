"""Track-sharded tracker inference over a device mesh.

The tracker's compute is dominated by per-track work (correlation sampling,
flow embeddings, time-attention), which shards over the query axis with no
communication; only the space-attention blocks mix tracks, and GSPMD inserts
the all-gathers when the track axis carries a sharding constraint. Feature
maps are replicated (they are small relative to per-track state at SLAM
sizes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from batrack_tpu.tracker.mdtracker import MDTracker


@functools.lru_cache(maxsize=8)
def make_sharded_tracker_fn(model: MDTracker, mesh: Mesh, axis: str = "track"):
    """Jitted tracker forward with the query axis sharded over `axis`.

    Cached on (model, mesh, axis) so repeated calls reuse the compiled
    executable instead of re-tracing (MDTracker is a hashable frozen Flax
    module; Mesh hashes by device assignment)."""

    @jax.jit
    def fwd(params, window, q):
        q = jax.lax.with_sharding_constraint(q, NamedSharding(mesh, P(axis, None)))
        outs = model.apply(params, window, q)[:5]
        # keep outputs sharded over tracks (last axis N for (T, N, ...) arrays)
        def constrain(x):
            if x.ndim >= 2:
                spec = [None] * x.ndim
                spec[1] = axis
                return jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, P(*spec))
                )
            return x

        return tuple(constrain(o) for o in outs)

    return fwd


def sharded_tracker_apply(
    model: MDTracker,
    params,
    window_rgbd: jnp.ndarray,
    queries: jnp.ndarray,
    mesh: Mesh,
    axis: str = "track",
):
    """One sharded tracker forward (compiled function cached per mesh)."""
    fwd = make_sharded_tracker_fn(model, mesh, axis)
    with mesh:
        return fwd(params, window_rgbd, queries)
