"""Quantized (dynamic w8a8 int8) inference for single-block ODE-ResNets.

A TPU-native extension with no reference counterpart (the reference serves
the same fp32 graph it trains, `models/tfkeras_resnets.py` +
`training/training.py:752-779`): the identity-block trunk — where all the
FLOPs are — runs its convs int8 x int8 -> int32 on the MXU with static
per-output-channel weight scales and dynamic per-tensor activation scales
(`ops/quantize.py`).  Measured 1.93x over bf16 on the 64Lx128F b256 trunk
at 3.6e-3 relative output error (docs/RESULTS.md section 2c).

Scope: single-device serving.  The stem, per-stage conv blocks, and head
stay in the compute dtype (one conv each — negligible FLOPs, and the head
feeds the softmax where quantization error matters most).  Stages narrower
than ``min_channels`` fall back to the regular apply path: the win only
materializes at the full MXU lane width (full-model measured, b=256,
value-synced: 64Lx128F 1.68x = 7,246 -> 12,203 img/s; 64Lx64F 1.00x;
64Lx16F 1.02x — docs/RESULTS.md section 2c), so the default gate is
C >= 128, and the fallback keeps the s2d packed fast path for narrow
trunks.  Lower ``min_channels`` only to re-measure on other hardware.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from differential_equations_resnet_tpu.models.blocks import (
    apply_fc_activation,
    batch_norm,
    dense,
    global_average_pool,
    max_pool_2x2,
)
from differential_equations_resnet_tpu.models.single_block_resnet import (
    SingleBlockResNetConfig,
    _apply_conv_block,
    _apply_identity_blocks,
    _dense_blocks,
    stage_plans,
)
from differential_equations_resnet_tpu.ops.conv import conv2d_same
from differential_equations_resnet_tpu.ops.integrators import get_integrator
from differential_equations_resnet_tpu.ops.quantize import (
    QuantizedConvParams,
    dynamic_int8_conv_same,
    quantize_kernel_per_cout,
)


def _apply_identity_blocks_int8(x, sp, ss, config):
    """The identity-block stack with dynamic w8a8 convs: quantize the
    stacked dense kernels once (per-c_out scales), scan the integrator with
    the int8 conv as the field.  BatchNorm (inference form, running stats)
    follows the conv inside the field exactly as in the fp path."""
    blocks = sp["blocks"]
    if blocks is None:
        return x
    dense_blocks = _dense_blocks(blocks, config)
    qp = quantize_kernel_per_cout(dense_blocks.kernel, dense_blocks.bias)
    step = get_integrator(config.integrator)

    if not config.use_batch_norm:

        def field(y, p: QuantizedConvParams):
            return jax.nn.relu(dynamic_int8_conv_same(y, p))

        def body(y, p):
            return step(field, y, config.h, p), None

        y, _ = jax.lax.scan(body, x, qp)
        return y

    # BN trunk (euler-only, mirroring _apply_identity_blocks's BN branch):
    # conv -> BN(running stats) -> relu -> h* -> add.
    def bn_body(y, inputs):
        p, bn_p, bn_s = inputs
        z = dynamic_int8_conv_same(y, p)
        z, _ = batch_norm(z, bn_p, bn_s, train=False)
        return y + config.h * jax.nn.relu(z), None

    y, _ = jax.lax.scan(bn_body, x, (qp, sp["blocks_bn"], ss["blocks_bn"]))
    return y


def apply_single_block_resnet_quantized(
    params,
    state,
    x: jax.Array,
    config: SingleBlockResNetConfig,
    min_channels: int = 128,
    return_logits: bool = False,
):
    """Inference forward pass with int8 identity-block trunks.

    Mirrors `apply_single_block_resnet(train=False)` stage by stage; stages
    at least ``min_channels`` wide run `_apply_identity_blocks_int8`, the
    rest take the regular (s2d-gated) path.  Returns the output only — the
    model state is read (BN running stats), never updated."""
    if config.tp_mesh is not None or config.pp_mesh is not None:
        raise ValueError(
            "quantized inference is a single-device serving path; build the "
            "model without tp_mesh/pp_mesh (shard the batch outside instead)."
        )
    plans = stage_plans(config)
    x = x.astype(config.compute_dtype)
    if config.subtract_mean is not None:
        x = x - jnp.asarray(config.subtract_mean, x.dtype)
    if config.divide_by_stddev is not None:
        x = x / jnp.asarray(config.divide_by_stddev, x.dtype)

    x = conv2d_same(
        x,
        params["stem"].kernel,
        strides=tuple(config.strides[0]),
        bias=params["stem"].bias,
    )
    if config.use_batch_norm:
        x, _ = batch_norm(x, params["stem_bn"], state["stem_bn"], train=False)
    x = jax.nn.relu(x)

    for plan, sp, ss in zip(plans, params["stages"], state["stages"]):
        if plan.pool:
            x = max_pool_2x2(x)
        if plan.has_conv_block:
            sp = dict(sp, _strides=plan.strides)
            x, _ = _apply_conv_block(x, sp, ss, config, train=False)
        if x.shape[-1] >= min_channels:
            x = _apply_identity_blocks_int8(x, sp, ss, config)
        else:
            x, _ = _apply_identity_blocks(x, sp, ss, config, train=False)

    if config.include_top:
        x = global_average_pool(x)
        x = dense(x.astype(jnp.float32), params["head"])
        if not return_logits:
            x = apply_fc_activation(x, config.fc_activation)
    return x


def make_quantized_forward(
    model,
    params,
    model_state: Any = None,
    min_channels: int = 128,
    return_logits: bool = False,
):
    """Build a jitted ``fn(images) -> output`` serving the model with int8
    trunks.  ``model`` is a SingleBlockResNet; ``model_state`` defaults to
    the empty state of a BN-free model."""
    if model_state is None:
        model_state = {"stages": [{} for _ in stage_plans(model.config)]}

    @jax.jit
    def forward(x):
        return apply_single_block_resnet_quantized(
            params,
            model_state,
            x,
            model.config,
            min_channels=min_channels,
            return_logits=return_logits,
        )

    return forward
