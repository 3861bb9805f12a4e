"""TPU-native differentiable geometry: Lie groups + projective ops.

Replaces the reference's compiled lietorch extension
(main/backend/lietorch/, C++/CUDA) with pure-JAX elementwise math that XLA
fuses directly into the surrounding compute graph.
"""

from batrack_tpu.geometry import projective, quaternion, se3, sim3, so3
from batrack_tpu.geometry.se3 import SE3
from batrack_tpu.geometry.sim3 import RxSO3, Sim3
from batrack_tpu.geometry.so3 import SO3

__all__ = [
    "SE3",
    "SO3",
    "Sim3",
    "RxSO3",
    "se3",
    "so3",
    "sim3",
    "quaternion",
    "projective",
]
