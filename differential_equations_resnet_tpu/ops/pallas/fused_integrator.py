"""Fused multi-layer forward-Euler integrator kernel (placeholder gate).

The fused kernel keeps the state y resident in VMEM across all L integrator
steps, eliminating the per-layer HBM round trip of the unfused scan.  The
actual Pallas implementation lands in `fused_euler_3x3`; until then the gate
`fused_euler_eligible` returns False so model code transparently uses the XLA
scan path.
"""

from __future__ import annotations

import jax


def fused_euler_eligible(x: jax.Array, blocks) -> bool:
    """Whether the fused Pallas path supports this (shape, dtype) combination."""
    return False


def fused_euler_3x3(x: jax.Array, blocks, h: float, gamma: float) -> jax.Array:
    raise NotImplementedError(
        "Fused Pallas integrator not yet implemented; use the XLA scan path."
    )
