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
    if n > len(devices):
        raise ValueError(
            f"requested a {n}-device mesh but only {len(devices)} devices "
            f"are visible — a silent truncation would run at lower "
            f"parallelism than configured"
        )
    devs = np.asarray(devices[:n])
    if len(axis_names) == 1:
        return Mesh(devs, axis_names)
    # split n into a 2D grid biased toward the first axis (the dominant
    # one by this module's convention): it gets the LARGER factor
    a = int(np.floor(np.sqrt(n)))
    while n % a:
        a -= 1
    return Mesh(devs.reshape(n // a, a), axis_names)


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host entry: jax.distributed.initialize with env-var fallback.

    Call once per host process BEFORE any other JAX use (run_slam does this
    when slam.distributed is set). With no explicit arguments JAX resolves
    the coordinator from the cluster environment (GKE/Cloud TPU metadata,
    SLURM/OMPI, or JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID). No-op for a plain single-process local run (no
    coordinator configuration anywhere) and when the runtime is already
    initialized.

    Must not touch jax.devices()/process_count() before initializing:
    querying them initializes the local backend, after which
    jax.distributed.initialize always fails (the round-1 version of this
    helper had exactly that bug and silently fell back to single-host).
    """
    import os

    try:
        from jax._src import distributed as _dist

        if _dist.global_state.client is not None:
            return  # runtime already initialized — idempotent
    except (ImportError, AttributeError):  # pragma: no cover - jax internals
        pass
    has_explicit = coordinator_address is not None or num_processes is not None
    env_keys = (
        "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
        "JAX_NUM_PROCESSES", "SLURM_JOB_ID", "OMPI_COMM_WORLD_SIZE",
        "TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS",
    )
    in_cluster = any(os.environ.get(k) for k in env_keys)
    if not (has_explicit or in_cluster):
        return  # single-process local run: nothing to initialize
    # jax.distributed.initialize resolves cluster environments (SLURM, OMPI,
    # Cloud TPU metadata) itself but does NOT read the plain
    # JAX_NUM_PROCESSES / JAX_PROCESS_ID variables — fill them in explicitly
    # so the documented env-var contract actually works
    # (tests/test_cli_e2e.py::test_run_slam_main_two_process_distributed)
    if coordinator_address is None:
        coordinator_address = os.environ.get(
            "JAX_COORDINATOR_ADDRESS") or os.environ.get("COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    # raise loudly on failure — a silent fallback to single-host is the
    # worst outcome for a job the user asked to distribute
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def replicate_pytree_for_mesh(tree, mesh: Mesh):
    """Convert a pytree of process-local arrays into GLOBAL fully-replicated
    arrays over `mesh` when the mesh spans multiple processes.

    A multi-controller jit over a cross-process mesh requires global arrays;
    numpy / uncommitted scalar inputs auto-replicate, but long-lived device
    state (the SLAM ring buffers) is created process-local by init_state and
    must be promoted once. Every process must hold identical values (true
    for freshly-initialized or checkpoint-loaded state). No-op on
    single-process meshes, so the single-host path is untouched."""
    if all(d.process_index == jax.process_index() for d in mesh.devices.flat):
        return tree
    from jax.sharding import NamedSharding, PartitionSpec

    rep = NamedSharding(mesh, PartitionSpec())
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(rep, np.asarray(x)),
        tree,
    )


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
