"""Device-mesh helpers.

Axis conventions for this framework (its parallelizable dimensions are not
LLM-style TP/PP but map onto the same mesh machinery):

  'edge'  — factor-graph edges (the dominant axis: residuals, Jacobians and
            Hessian-block assembly are embarrassingly parallel; only reduced
            Schur blocks cross the interconnect).
  'track' — tracker queries (correlation, flow embeddings and time-attention
            are per-track; space-attention all-gathers across it).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def get_mesh(
    n_devices: Optional[int] = None, axis_names: Sequence[str] = ("edge",)
) -> Mesh:
    """1D (or reshaped) mesh over the first n devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    devs = np.asarray(devices[:n])
    if len(axis_names) == 1:
        return Mesh(devs, axis_names)
    # split n into a 2D grid biased toward the first axis
    a = int(np.floor(np.sqrt(n)))
    while n % a:
        a -= 1
    return Mesh(devs.reshape(a, n // a), axis_names)


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host entry: jax.distributed.initialize with env-var fallback.

    Call once per host process before any mesh is built (run_slam does this
    when data.distributed is set). With no arguments JAX resolves the
    coordinator from the cluster environment (GKE/Cloud TPU metadata or
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID). No-op if
    the runtime is already initialized or the job is single-process.
    """
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        # already initialized (or single-process local run) — keep going
        pass


def get_host_chip_mesh(axis_names: Sequence[str] = ("host", "chip")) -> Mesh:
    """2-axis (host, chip) mesh: rows = processes, columns = local chips.

    Sharding a data axis over the full ('host','chip') tuple keeps each
    psum's chip-local reduction on ICI and sends only the reduced
    (W,W,6,6)-block partials across DCN — the layout the distributed Schur
    in parallel/sharded_slot_ba.py is designed for.
    """
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n_hosts = max(d.process_index for d in devs) + 1
    arr = np.asarray(devs).reshape(n_hosts, -1)
    return Mesh(arr, axis_names)
