"""batrack_tpu: a TPU-native dynamic-scene SLAM + reconstruction framework.

A ground-up JAX/XLA/Pallas rebuild with the capabilities of BA-Track
(wrchen530/batrack): motion-decoupled point tracking, robust RGB-D bundle
adjustment with Schur elimination, dense global depth alignment, and
evaluation tooling — designed for TPU (static shapes, fused jitted steps,
mesh sharding for multi-chip scaling).
"""

__version__ = "0.1.0"
