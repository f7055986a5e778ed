"""Observability: per-layer gradient mean-norm telemetry, CSV logging, and
TensorBoard-compatible scalar summaries.

The gradient telemetry is the reference repo's *product* (SURVEY.md section
5.5): a scalar ||grad||_2 / size(grad) per convolutional layer, logged every
`summaries_frequency` steps.  The reference extracts these by fragile
positional indexing over the flat grads-and-vars list
(`training/training.py:385-409`, the hard-coded `i*20+2` stride); here the
layer structure is explicit in the params pytree, so per-layer norms over the
stacked (L, ...) arrays are one vectorized reduction — computed on device
inside the jitted train step.

Naming matches the reference CSV columns exactly
(`numerical_results/csv/*gradient_history.csv`):
``conv1_kernel_gradient_mean_norm``, then
``res{stage}_{block}_branch2_kernel_gradient_mean_norm`` per residual layer.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence

import numpy as np
import jax.numpy as jnp

from differential_equations_resnet_tpu.models.blocks import ConvParams
from differential_equations_resnet_tpu.models.bottleneck_resnet import (
    BottleneckResNetConfig,
)
from differential_equations_resnet_tpu.models.single_block_resnet import (
    SingleBlockResNetConfig,
    stage_plans,
)
from differential_equations_resnet_tpu.ops.antisymmetric import (
    Antisym3x3DenseParams,
    Antisym3x3Params,
    AntisymKxKParams,
    num_cross_pairs,
)


def _mean_norm(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.linalg.norm(x.reshape(-1)) / x.size


def _kernel_leaves(block_grads):
    """The 'kernel' leaves of one residual layer's grads: the packed
    antisymmetric parameters (a, b, c, d, cross — the reference's 19 merged
    kernel variables, training/training.py:395-403) or the dense conv kernel.
    Biases are excluded, as in the reference metrics."""
    if isinstance(block_grads, (Antisym3x3Params, Antisym3x3DenseParams)):
        return [block_grads.a, block_grads.b, block_grads.c, block_grads.d,
                block_grads.cross]
    if isinstance(block_grads, AntisymKxKParams):
        # General k x k (anti-)centrosymmetric layer: every diag/cross entry
        # is a free parameter.
        return [block_grads.diag, block_grads.cross]
    if isinstance(block_grads, ConvParams):
        return [block_grads.kernel]
    if isinstance(block_grads, dict):  # bottleneck block: 3x3 mid-conv only
        return _kernel_leaves(block_grads["conv2"])
    raise TypeError(f"Unsupported block grads type {type(block_grads)}.")


def _per_layer_free_size(block_grads, stacked: bool) -> int:
    """Trainable-DOF count of one layer's kernel leaves (ignoring a leading
    stacked-layer axis when ``stacked``).  The dense-lower layout stores
    9*C*C cross entries but only 9*C*(C-1)/2 are free — the rest are
    structural zeros with zero gradients — so the mean-norm divisor counts
    free DOF and the dense and packed layouts report identical telemetry
    (the reference divides by variable size, ‖∇‖₂/size)."""
    if isinstance(block_grads, (Antisym3x3Params, Antisym3x3DenseParams)):
        channels = block_grads.a.shape[-1]
        return 4 * channels + 9 * num_cross_pairs(channels)
    if isinstance(block_grads, dict):
        return _per_layer_free_size(block_grads["conv2"], stacked)
    leaves = _kernel_leaves(block_grads)
    start = 1 if stacked else 0
    return sum(int(np.prod(leaf.shape[start:])) for leaf in leaves)


def _stacked_mean_norms(block_grads) -> jnp.ndarray:
    """(L,) per-layer mean norms over stacked block grads (one reduction)."""
    leaves = _kernel_leaves(block_grads)
    sq = sum(
        jnp.sum(jnp.square(leaf), axis=tuple(range(1, leaf.ndim)))
        for leaf in leaves
    )
    return jnp.sqrt(sq) / _per_layer_free_size(block_grads, stacked=True)


# ---------------------------------------------------------------------------
# Names (static, host-side)
# ---------------------------------------------------------------------------


def gradient_metric_names(config) -> List[str]:
    names = ["conv1_kernel_gradient_mean_norm"]
    if isinstance(config, SingleBlockResNetConfig):
        for s, plan in enumerate(stage_plans(config)):
            stage = s + 2
            block = 0
            if plan.has_conv_block:
                names.append(f"res{stage}_{block}_branch2_kernel_gradient_mean_norm")
                block = 1
            for i in range(plan.num_identity):
                names.append(
                    f"res{stage}_{block + i}_branch2_kernel_gradient_mean_norm"
                )
    elif isinstance(config, BottleneckResNetConfig):
        for stage_idx, num_blocks in enumerate(config.blocks_per_stage):
            stage = stage_idx + 2
            for b in range(num_blocks):
                names.append(f"res{stage}_{b}_branch2b_kernel_gradient_mean_norm")
    else:
        raise TypeError(f"Unsupported config type {type(config)}.")
    return names


# ---------------------------------------------------------------------------
# Values (device-side, called inside the jitted step)
# ---------------------------------------------------------------------------


def gradient_mean_norms(grads, config) -> jnp.ndarray:
    """Per-layer gradient mean norms, ordered as `gradient_metric_names`."""
    values = [_mean_norm(grads["stem"].kernel)]
    if isinstance(config, SingleBlockResNetConfig):
        for plan, sg in zip(stage_plans(config), grads["stages"]):
            if plan.has_conv_block:
                values.append(_mean_norm(sg["conv_main"].kernel))
            if sg["blocks"] is not None:
                values.append(_stacked_mean_norms(sg["blocks"]))
    elif isinstance(config, BottleneckResNetConfig):
        for sg in grads["stages"]:
            conv2 = sg["conv_block"]["conv2"]
            leaves = _kernel_leaves(conv2)
            sq = sum(jnp.sum(jnp.square(leaf)) for leaf in leaves)
            values.append(jnp.sqrt(sq) / _per_layer_free_size(conv2, stacked=False))
            if sg["identity_blocks"] is not None:
                values.append(_stacked_mean_norms(sg["identity_blocks"]))
    else:
        raise TypeError(f"Unsupported config type {type(config)}.")
    return jnp.concatenate([jnp.atleast_1d(v) for v in values])


# ---------------------------------------------------------------------------
# Loggers
# ---------------------------------------------------------------------------


def add_moments_summary(writer: "SummaryWriter", name: str, value, step: int) -> None:
    """Log mean / stddev / max / min of a tensor — parity with
    `training/tf_variable_summaries.py:3-22` (`add_moments_summary`)."""
    arr = np.asarray(value)
    writer.scalar(f"{name}/mean", float(arr.mean()), step)
    writer.scalar(f"{name}/stddev", float(arr.std()), step)
    writer.scalar(f"{name}/max", float(arr.max()), step)
    writer.scalar(f"{name}/min", float(arr.min()), step)


def add_mean_norm_summary(
    writer: "SummaryWriter", name: str, value, step: int, order: int = 2
) -> None:
    """Log ||v||_order / size(v) — parity with
    `training/tf_variable_summaries.py:24-38` (`add_mean_norm_summary`)."""
    arr = np.asarray(value).reshape(-1)
    writer.scalar(
        f"{name}/mean_norm",
        float(np.linalg.norm(arr, ord=order) / arr.size),
        step,
    )


class CsvLogger:
    """Space-delimited CSV logger, column-compatible with the reference's
    gradient_history / evaluation_metrics files
    (`training/training.py:195-220,585-586,618-619`)."""

    def __init__(self, path: str, fieldnames: Sequence[str], delimiter: str = " "):
        self.path = path
        self.fieldnames = list(fieldnames)
        self.delimiter = delimiter
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        write_header = not (os.path.exists(path) and os.path.getsize(path) > 0)
        self._fp = open(path, "a", buffering=1)
        if write_header:
            self._fp.write(self.delimiter.join(self.fieldnames) + "\n")

    def log(self, values: Sequence) -> None:
        if len(values) != len(self.fieldnames):
            raise ValueError(
                f"Expected {len(self.fieldnames)} values, got {len(values)}."
            )
        self._fp.write(self.delimiter.join(str(v) for v in values) + "\n")

    def close(self) -> None:
        self._fp.close()


class SummaryWriter:
    """Scalar summary writer.  Uses TensorBoard (via torch/tensorboardX) when
    available, falling back to JSONL scalars — the rebuild of the reference's
    tf.summary scalars (`training/training.py:411-448`,
    `training/tf_variable_summaries.py`)."""

    def __init__(self, log_dir: str, use_tensorboard: Optional[bool] = None):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._tb = None
        self._jsonl = None
        if use_tensorboard is None or use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter as TBWriter

                self._tb = TBWriter(log_dir=log_dir)
            except Exception:
                if use_tensorboard:
                    raise
        if self._tb is None:
            self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a", buffering=1)

    def scalar(self, tag: str, value: float, step: int) -> None:
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), int(step))
        else:
            self._jsonl.write(
                json.dumps({"tag": tag, "value": float(value), "step": int(step)})
                + "\n"
            )

    def scalars(self, values: dict, step: int) -> None:
        for tag, value in values.items():
            self.scalar(tag, value, step)

    def flush(self) -> None:
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        if self._jsonl is not None:
            self._jsonl.close()
