"""Robust RGB-D bundle adjustment (Gauss-Newton + Schur), TPU-native.

Replaces the reference main/backend/ba.py (torch + torch_scatter) with
static-shape JAX. alpha > 0 adds the mono-disparity prior of BA_rgbd_droid;
alpha = 0 reproduces the plain BA() semantics.
"""

from batrack_tpu.ba.solver import BAProblem, ba_iteration, robust_weight

__all__ = ["BAProblem", "ba_iteration", "robust_weight"]
