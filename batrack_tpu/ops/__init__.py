"""TPU-friendly tensor ops: sampling/gather, fused correlation, embeddings.

Replaces the reference's CUDA altcorr extension (main/backend/altcorr/) and
torch sampling helpers with XLA-native gathers and MXU contractions.
"""

from batrack_tpu.ops import corr, embeddings, sampling
from batrack_tpu.ops.corr import build_pyramid, corr_sample_pyramid
from batrack_tpu.ops.sampling import (
    avg_pool2d,
    bilinear_sample2d,
    interpolate_bilinear,
    patchify,
)

__all__ = [
    "corr",
    "embeddings",
    "sampling",
    "bilinear_sample2d",
    "patchify",
    "interpolate_bilinear",
    "avg_pool2d",
    "build_pyramid",
    "corr_sample_pyramid",
]
