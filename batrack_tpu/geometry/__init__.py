"""TPU-native differentiable geometry: Lie groups + projective ops.

Replaces the reference's compiled lietorch extension
(main/backend/lietorch/, C++/CUDA) with pure-JAX elementwise math that XLA
fuses directly into the surrounding compute graph.
"""

import jax.numpy as _jnp

from batrack_tpu.geometry import projective, quaternion, se3, sim3, so3
from batrack_tpu.geometry.se3 import SE3
from batrack_tpu.geometry.sim3 import RxSO3, Sim3
from batrack_tpu.geometry.so3 import SO3

def cat(group_list, axis=0):
    """Concatenate wrapped Lie-group elements (lietorch groups.py:314-317)."""
    cls = type(group_list[0])
    return cls(_jnp.concatenate([g.data for g in group_list], axis=axis))


def stack(group_list, axis=0):
    """Stack wrapped Lie-group elements (lietorch groups.py:319-322)."""
    cls = type(group_list[0])
    return cls(_jnp.stack([g.data for g in group_list], axis=axis))


__all__ = [
    "cat",
    "stack",
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
