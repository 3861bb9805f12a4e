"""Multi-chip scaling: mesh construction + sharded BA / tracker.

The reference is strictly single-GPU (SURVEY.md §2: no distributed code in
executed paths); distribution here is a new TPU-native capability built on
jax.sharding meshes, shard_map and XLA collectives.
"""

from batrack_tpu.parallel.mesh import (
    get_host_chip_mesh,
    get_mesh,
    init_distributed,
)
from batrack_tpu.parallel.sharded_ba import sharded_ba_iteration, sharded_slam_update
from batrack_tpu.parallel.sharded_slot_ba import sharded_slot_slam_update

__all__ = [
    "get_mesh",
    "get_host_chip_mesh",
    "init_distributed",
    "sharded_ba_iteration",
    "sharded_slam_update",
    "sharded_slot_slam_update",
]
