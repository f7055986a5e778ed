"""Fused Pallas TPU kernels for the hot paths (SURVEY.md section 7, item 6)."""

from differential_equations_resnet_tpu.ops.pallas.fused_integrator import (  # noqa: F401
    fused_euler_3x3,
    fused_euler_eligible,
)
