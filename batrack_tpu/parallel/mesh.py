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
