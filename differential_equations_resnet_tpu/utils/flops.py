"""Analytic FLOP accounting for MFU / roofline reporting.

Counts MODEL FLOPs (the nominal dense-conv arithmetic: 2 * rows * k*k*Cin*Cout
per convolution), NOT implementation FLOPs — the space-to-depth packed layout
executes 4x the nominal conv FLOPs by design (3/4 structural zeros,
ops/s2d.py), and counting those would inflate utilization the way marketing
numbers do.  MFU = model FLOPs / wall time / chip peak, the convention of the
PaLM paper and the scaling book.

The reference has no utilization accounting of any kind (its perf story is
wall-clock notebook prints — SURVEY.md section 5.1/6); this module feeds
bench.py's `model_tflops` / `mfu` / `pct_of_practical_floor` fields.
"""

from __future__ import annotations

from typing import Any


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def single_block_forward_flops(config: Any, batch_size: int) -> int:
    """Nominal forward-pass FLOPs of a single-block ODE-ResNet
    (models/single_block_resnet.py), walking the same static stage plan as
    the model itself.  Elementwise work (bias, relu, residual add, GAP,
    normalization) is omitted — it is O(rows*C) against the convs'
    O(rows*k^2*C^2) and under 1% at every shipped config."""
    from differential_equations_resnet_tpu.models.single_block_resnet import (
        stage_plans,
    )

    height, width, c_in = config.image_shape
    k = config.kernel_size
    sh, sw = config.strides[0]
    height, width = _ceil_div(height, sh), _ceil_div(width, sw)
    channels = config.filters_per_block[0]
    flops = 2 * batch_size * height * width * k * k * c_in * channels

    field_evals = {"euler": 1, "midpoint": 2, "rk4": 4}[config.integrator]
    for plan in stage_plans(config):
        if plan.pool:
            height, width = height // 2, width // 2
        if plan.has_conv_block:
            psh, psw = plan.strides
            height, width = _ceil_div(height, psh), _ceil_div(width, psw)
            rows = batch_size * height * width
            # main kxk conv + 1x1 shortcut (models/single_block_resnet.py
            # _apply_conv_block).
            flops += 2 * rows * (k * k + 1) * plan.in_channels * plan.filters
            channels = plan.filters
        rows = batch_size * height * width
        flops += (
            plan.num_identity * field_evals
            * 2 * rows * k * k * channels * channels
        )
    if config.include_top:
        flops += 2 * batch_size * channels * config.num_classes
    return int(flops)


def single_block_train_flops(config: Any, batch_size: int) -> int:
    """Nominal train-step FLOPs: forward + backward.  The backward pass costs
    ~2x the forward (one cotangent conv per activation input + one
    filter-gradient contraction per kernel — the standard 3x-forward rule)."""
    return 3 * single_block_forward_flops(config, batch_size)


# Chip peak dense-matmul rates for MFU denominators, in FLOP/s.
# TPU v5e: 197 TFLOPS bf16 (public spec).  MFU is conventionally reported
# against the chip's peak rate regardless of the precision the program runs
# at; fp32 runs below this peak, so fp32 MFU numbers are conservative.
PEAK_FLOPS = {
    "tpu_v5e_bf16": 197e12,
}


def mfu(flops_per_step: float, steps_per_sec: float,
        peak: float = PEAK_FLOPS["tpu_v5e_bf16"]) -> float:
    """Model-FLOPs utilization: achieved model FLOP/s over chip peak."""
    return flops_per_step * steps_per_sec / peak
