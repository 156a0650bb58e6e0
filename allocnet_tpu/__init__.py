"""allocnet_tpu: TPU-native learning-based trajectory optimization.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
KumarRobotics/AllocNet (RA-L 2024): learned time allocation + batched
corridor-constrained min-jerk/min-snap QP, end-to-end differentiable,
designed for batch-of-scenarios execution on TPU device meshes.
"""

__version__ = "0.1.0"

from allocnet_tpu.config import AllocNetConfig, QPConfig, SolverConfig  # noqa: F401
