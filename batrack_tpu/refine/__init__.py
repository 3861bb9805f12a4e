"""Stage-3 dense global alignment (depth scale grids + pose polish), JAX/optax.

Rebuild of main/global_refine/ — the most autodiff-heavy stage of the
reference pipeline, here one jitted loss + Adam step.
"""

from batrack_tpu.refine.refine_net import (
    RefineData,
    RefineParams,
    align_depth_maps,
    build_refine_data,
    get_results,
    init_params,
    scaled_dmaps,
    total_loss,
)
from batrack_tpu.refine.trainer import global_alignment_loop

__all__ = [
    "RefineData",
    "RefineParams",
    "align_depth_maps",
    "build_refine_data",
    "init_params",
    "total_loss",
    "scaled_dmaps",
    "get_results",
    "global_alignment_loop",
]
