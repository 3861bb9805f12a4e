"""REAL multi-process validation of the multi-host layer.

Spawns two OS processes (2 'hosts' x 4 virtual CPU chips each), runs
jax.distributed.initialize + get_host_chip_mesh, and executes the
patch-sharded slot BA step over the ('host','chip') mesh with genuine
cross-process collectives (the psum crosses the process boundary exactly
where DCN would sit on a real pod). The replicated pose output must match
a single-process reference.

This is the CPU-testable analogue SURVEY.md §4e prescribes for multi-node
logic; it exercises init_distributed, the (host, chip) device grid, tuple
-axis PartitionSpecs and the distributed-Schur psum path end to end.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
import numpy as np

import jax

port, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)
assert jax.process_count() == 2, jax.process_count()
import functools

import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

sys.path.insert(0, os.environ["BATRACK_REPO"])
sys.path.insert(0, os.path.join(os.environ["BATRACK_REPO"], "tests"))
from batrack_tpu.ba.slot_solver import SlotGraph, slot_ba_iteration, slot_ba_iteration_fm
from batrack_tpu.parallel.mesh import get_host_chip_mesh
from test_slot_ba import KW, M, N, build_case

mesh = get_host_chip_mesh()
assert mesh.devices.shape == (2, 4), mesh.devices.shape

rng = np.random.default_rng(0)
poses, patches, monodisp, intr, graph, prob = build_case(rng)

# single-process reference (local devices only)
p_ref, q_ref = slot_ba_iteration(
    poses, patches, monodisp, intr, graph,
    prob.t0, prob.n, prob.base_k, kf_stride=2, **KW,
)

axis = ("host", "chip")
core = functools.partial(
    slot_ba_iteration_fm, kf_stride=2, axis_name=axis,
    shard_mode="patches", **KW,
)
g_spec = SlotGraph(targets=P(None, None, axis), weights=P(None, None, axis),
                   valid=P(None, None, axis), slot_start=P())
in_specs = (P(), P(None, axis), P(None, axis), P(), g_spec)

def to_global(x, spec):
    sh = NamedSharding(mesh, spec)
    xa = np.asarray(x)
    return jax.make_array_from_callback(xa.shape, sh, lambda idx: xa[idx])

args = (np.asarray(poses), np.asarray(patches).reshape(N, M, 3),
        np.asarray(monodisp).reshape(N, M), np.asarray(intr), graph)
gargs = jax.tree.map(to_global, args, in_specs,
                     is_leaf=lambda x: isinstance(x, np.ndarray))

def step(poses, p_fm, md_fm, intr, graph):
    return core(poses, p_fm, md_fm, intr, graph,
                prob.t0, prob.n, prob.base_k // M)

fn = jax.jit(shard_map(step, mesh=mesh, in_specs=in_specs,
                       out_specs=(P(), P(None, axis))))
p2, q2 = fn(*gargs)
# pose output is replicated -> addressable everywhere
p2 = np.asarray(jax.device_get(p2))
d = np.abs(p2 - np.asarray(p_ref)).max()
assert d < 1e-3, f"pose divergence across processes: {d}"
print(f"proc {pid}: multihost slot BA ok, |dpose| = {d:.2e}", flush=True)
"""


TRACKER_WORKER = r"""
import os, sys
import numpy as np

import jax

port, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)
assert jax.process_count() == 2, jax.process_count()
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

sys.path.insert(0, os.environ["BATRACK_REPO"])
from batrack_tpu.parallel.sharded_tracker import sharded_tracker_apply
from batrack_tpu.tracker.mdtracker import MDTracker, TrackerParams

# the space-attention all-gather over the track axis is THE collective that
# carries the tracker scaling story (parallel/sharded_tracker.py); sharding
# 16 tracks over 2 processes x 4 chips puts that all-gather on a genuine
# process boundary. Same shapes/tolerances as the single-process
# test_parallel.py::test_sharded_tracker_matches_single.
p = TrackerParams(S=4, iters=1, static_iters=1, interp_shape=(32, 48))
model = MDTracker(p)
T, H, W, N = 4, 32, 48, 16
rng = np.random.default_rng(0)
window = jnp.asarray(rng.uniform(0, 255, (T, 4, H, W)), jnp.float32)
window = window.at[:, 3].set(
    jnp.asarray(rng.uniform(2, 6, (T, H, W)), jnp.float32))
queries_np = np.stack(
    [np.zeros(N), rng.uniform(5, W - 5, N), rng.uniform(5, H - 5, N),
     rng.uniform(2, 6, N)], -1).astype(np.float32)
params = model.init(jax.random.PRNGKey(0), window, jnp.asarray(queries_np))

# local single-process reference (identical on both processes: same seeds)
ref = [np.asarray(o) for o in model.apply(params, window, jnp.asarray(queries_np))[:5]]

mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("track",))
q_sh = NamedSharding(mesh, P("track", None))
queries_g = jax.make_array_from_callback(
    queries_np.shape, q_sh, lambda idx: queries_np[idx])
out = sharded_tracker_apply(model, params, window, queries_g, mesh, "track")

tols = [2e-4, 2e-4, 2e-2, 1e-5, 1e-5]
for o, r, tol in zip(out, ref, tols):
    # outputs are track-sharded global arrays: each process checks ITS
    # addressable shards against the replicated local reference slice
    checked = 0
    for sh in o.addressable_shards:
        np.testing.assert_allclose(np.asarray(sh.data), r[sh.index], atol=tol)
        checked += 1
    assert checked > 0
print(f"proc {pid}: multihost sharded tracker ok", flush=True)
"""


FULL_LOOP_WORKER = r"""
import os, sys
import numpy as np

import jax

port, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)
assert jax.process_count() == 2
sys.path.insert(0, os.environ["BATRACK_REPO"])
sys.path.insert(0, os.path.join(os.environ["BATRACK_REPO"], "tests"))
from batrack_tpu.parallel.mesh import get_host_chip_mesh
from batrack_tpu.slam import BATrack, OracleTracker, StaticDims
from test_slam_e2e import HT, INTR, WD, gt_trajectory, plane_depth, small_config

# the INTEGRATED production loop across a real process boundary: ingest,
# oracle-tracker append/gating, patch-sharded slot dual-BA (its psum
# crosses processes), culling, point cloud, terminate — BATrack(mesh=...)
# promotes its state to global replicated arrays automatically
# (parallel/mesh.py::replicate_pytree_for_mesh), everything else is the
# unmodified production code path.
T = 20
rng = np.random.default_rng(3)
poses_gt = gt_trajectory(T)
depths = np.stack([plane_depth(p) for p in poses_gt])
images = rng.uniform(0, 255, size=(T, HT, WD, 3)).astype(np.float32)

mesh = get_host_chip_mesh()
assert mesh.devices.shape == (2, 4), mesh.devices.shape

def run(mesh_arg):
    cfg = small_config()
    dims = StaticDims.from_config(cfg, HT, WD)
    slam = BATrack(cfg, HT, WD, seed=0, mesh=mesh_arg)
    slam.tracker = OracleTracker(poses_gt, INTR, dims, noise=0.0)
    for t in range(T):
        slam(t, images[t], depths[t], INTR)
    return slam.terminate()

p_multi, ts = run(mesh)
p_single, _ = run(None)  # per-process local single-device reference
d = np.abs(np.asarray(p_multi) - np.asarray(p_single)).max()
assert d < 1e-3, f"2-process full-loop trajectory diverged: {d}"
print(f"proc {pid}: multihost full SLAM loop ok, |dtraj| = {d:.2e}", flush=True)
"""


def _run_two_process(tmp_path, worker_src, ok_marker, timeout=420):
    # bind-then-release has a TOCTOU window (another process could grab the
    # port before the workers do) — acceptable in this single-user
    # container; a shared-CI setup should retry on coordinator bind failure
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "PALLAS_AXON_POOL_IPS": "",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "BATRACK_REPO": REPO,
        "PYTHONPATH": REPO,
    })
    script = tmp_path / "worker.py"
    script.write_text(worker_src)

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(port), str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out.decode())
    finally:
        # a hung distributed init must not leak workers holding the
        # coordinator port into later tests/sessions
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert ok_marker in out


@pytest.mark.slow
def test_two_process_host_chip_mesh(tmp_path):
    _run_two_process(tmp_path, WORKER, "multihost slot BA ok")


@pytest.mark.slow
def test_two_process_sharded_tracker(tmp_path):
    """The track-sharded tracker (its space-attention all-gather is the
    collective that dominates the scaling story) across a REAL process
    boundary, equal to the single-process forward (VERDICT r4 #4)."""
    _run_two_process(tmp_path, TRACKER_WORKER, "multihost sharded tracker ok",
                     timeout=600)


@pytest.mark.slow
def test_two_process_full_slam_loop(tmp_path):
    """The INTEGRATED SLAM loop (BATrack + oracle tracker + patch-sharded
    slot backend) across 2 processes x 4 chips on the ('host','chip') mesh,
    trajectory-equal to the single-process run (VERDICT r4 #4, the 'short
    full loop' extension)."""
    _run_two_process(tmp_path, FULL_LOOP_WORKER, "multihost full SLAM loop ok",
                     timeout=600)


def test_init_distributed_noop_without_cluster(monkeypatch):
    """Plain local run: init_distributed must not call
    jax.distributed.initialize (and must not have touched process_count
    first — doing so initializes the backend and breaks multi-host init)."""
    import jax

    from batrack_tpu.parallel.mesh import init_distributed

    for k in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
              "JAX_NUM_PROCESSES", "SLURM_JOB_ID", "OMPI_COMM_WORLD_SIZE",
              "TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(k, raising=False)
    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: calls.append(kw))
    init_distributed()
    assert calls == []


def test_init_distributed_calls_initialize_with_config(monkeypatch):
    import jax

    from batrack_tpu.parallel.mesh import init_distributed

    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: calls.append(kw))
    # explicit arguments
    init_distributed("10.0.0.1:1234", 2, 0)
    # env-var configuration
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    init_distributed()
    assert len(calls) == 2
    assert calls[0]["coordinator_address"] == "10.0.0.1:1234"


def test_compile_cache_env_semantics(monkeypatch, tmp_path):
    from batrack_tpu.utils.compile_cache import enable_compile_cache

    monkeypatch.setenv("BATRACK_COMPILE_CACHE", "off")
    assert enable_compile_cache() is None
    monkeypatch.setenv("BATRACK_COMPILE_CACHE", "1")
    d = enable_compile_cache()
    assert d is not None and d.endswith("batrack_tpu_xla")  # not a dir named '1'
    monkeypatch.setenv("BATRACK_COMPILE_CACHE", str(tmp_path / "c"))
    assert enable_compile_cache() == str(tmp_path / "c")
