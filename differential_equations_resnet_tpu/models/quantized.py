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


# ---------------------------------------------------------------------------
# Bottleneck family (ResNet-50/101/152)
# ---------------------------------------------------------------------------
#
# Measured per-stage on ResNet-50 shapes (224x224 input, b=32, slope-timed
# identity-block chains, docs/RESULTS.md section 2c): stage2 (28x28,
# mid=128) 1.05x — the bf16 emitter already runs ~200 TF there; stage3
# (14x14, mid=256) 2.39x; stage4 (7x7, mid=512) 2.19x.  The win boundary
# for this family is therefore the MID width, default gate 256.

BOTTLENECK_MIN_MID_CHANNELS = 256


def _q_block_params(p, config, filters):
    """Pre-quantize one bottleneck block's three conv weights per-c_out
    (outside any scan — re-quantizing per step measured a 0.69x LOSS on
    ResNet-50 b=32, where the per-call O(9 C^2) VPU reductions rival the
    small-batch convs; quantized once they are free).  Works on stacked
    (L, ...) identity params too (the reductions preserve leading axes).
    BN params/state pass through untouched."""
    from differential_equations_resnet_tpu.models.bottleneck_resnet import (
        _mid_is_antisym,
    )
    from differential_equations_resnet_tpu.ops.antisymmetric import (
        materialize_3x3_from_dense,
    )

    if _mid_is_antisym(config, filters):
        k2 = materialize_3x3_from_dense(p["conv2"], config.gamma)
        b2 = p["conv2"].bias
    else:
        k2, b2 = p["conv2"].kernel, p["conv2"].bias
    q = {
        "conv1": quantize_kernel_per_cout(p["conv1"].kernel, p["conv1"].bias),
        "conv2": quantize_kernel_per_cout(k2, b2),
        "conv3": quantize_kernel_per_cout(p["conv3"].kernel, p["conv3"].bias),
    }
    for name in ("bn1", "bn2", "bn3"):
        if name in p:
            q[name] = p[name]
    return q


def _apply_bottleneck_main_int8(x, qp, s, config, strides):
    """`_apply_bottleneck_main` (bottleneck_resnet.py) with pre-quantized
    w8a8 convs; BatchNorm in inference form (running stats)."""
    if config.version == 1:
        strides_1x1, strides_kxk = strides, (1, 1)
    else:  # 1.5
        strides_1x1, strides_kxk = (1, 1), strides

    y = dynamic_int8_conv_same(x, qp["conv1"], strides=strides_1x1)
    if config.use_batch_norm:
        y, _ = batch_norm(y, qp["bn1"], s["bn1"], train=False)
    y = jax.nn.relu(y)

    y = dynamic_int8_conv_same(y, qp["conv2"], strides=strides_kxk)
    if config.use_batch_norm:
        y, _ = batch_norm(y, qp["bn2"], s["bn2"], train=False)
    y = jax.nn.relu(y)

    y = dynamic_int8_conv_same(y, qp["conv3"])
    if config.use_batch_norm:
        y, _ = batch_norm(y, qp["bn3"], s["bn3"], train=False)
    return y


def apply_resnet_quantized(
    params,
    state,
    x: jax.Array,
    config,
    min_mid_channels: int = BOTTLENECK_MIN_MID_CHANNELS,
    return_logits: bool = False,
):
    """Bottleneck-family inference with w8a8 blocks where the mid width is
    at least ``min_mid_channels`` (narrower stages take the regular path —
    measured break-even at mid=128).  Mirrors `apply_resnet(train=False)`;
    the stem stays in the compute dtype."""
    from differential_equations_resnet_tpu.models.bottleneck_resnet import (
        _apply_bottleneck_main,
        _mid_is_antisym,
        max_pool,
    )

    x = x.astype(config.compute_dtype)
    if config.subtract_mean is not None:
        x = x - jnp.asarray(config.subtract_mean, x.dtype)
    if config.divide_by_stddev is not None:
        x = x / jnp.asarray(config.divide_by_stddev, x.dtype)

    from differential_equations_resnet_tpu.ops.conv import conv2d_valid

    x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    x = conv2d_valid(
        x, params["stem"].kernel, strides=(2, 2), bias=params["stem"].bias
    )
    if config.use_batch_norm:
        x, _ = batch_norm(x, params["stem_bn"], state["stem_bn"], train=False)
    x = jax.nn.relu(x)
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    x = max_pool(x, (3, 3), (2, 2))

    for stage_idx, (sp, ss, filters) in enumerate(
        zip(params["stages"], state["stages"], config.filters_per_block)
    ):
        strides = (1, 1) if stage_idx == 0 else (2, 2)
        mid_width = filters[0] if _mid_is_antisym(config, filters) else filters[1]
        quantized = mid_width >= min_mid_channels

        if quantized:
            main = _apply_bottleneck_main_int8(
                x,
                _q_block_params(sp["conv_block"], config, filters),
                ss["conv_block"],
                config,
                strides,
            )
            shortcut = dynamic_int8_conv_same(
                x,
                quantize_kernel_per_cout(
                    sp["shortcut"].kernel, sp["shortcut"].bias
                ),
                strides=strides,
            )
        else:
            main, _ = _apply_bottleneck_main(
                x, sp["conv_block"], ss["conv_block"], config, filters,
                strides, train=False,
            )
            shortcut = conv2d_same(
                x, sp["shortcut"].kernel, strides=strides,
                bias=sp["shortcut"].bias,
            )
        if config.use_batch_norm:
            shortcut, _ = batch_norm(
                shortcut, sp["bn_shortcut"], ss["bn_shortcut"], train=False
            )
        x = jax.nn.relu(main + shortcut)

        if sp["identity_blocks"] is not None:
            if quantized:
                q_blocks = _q_block_params(
                    sp["identity_blocks"], config, filters
                )

                def body(y, inputs):
                    qp, s_in = inputs
                    main = _apply_bottleneck_main_int8(
                        y, qp, s_in, config, (1, 1)
                    )
                    return jax.nn.relu(main + y), None

                xs = (q_blocks, ss["identity_blocks"])
            else:

                def body(y, inputs):
                    p, s_in = inputs
                    main, _ = _apply_bottleneck_main(
                        y, p, s_in, config, filters, (1, 1), train=False
                    )
                    return jax.nn.relu(main + y), None

                xs = (sp["identity_blocks"], ss["identity_blocks"])

            x, _ = jax.lax.scan(body, x, xs)

    if config.include_top:
        x = global_average_pool(x)
        x = dense(x.astype(jnp.float32), params["head"])
        if not return_logits:
            x = apply_fc_activation(x, config.fc_activation)
    return x


def apply_quantized(params, state, x, config, return_logits: bool = False):
    """Family dispatch: the quantized forward for either model family with
    each family's measured default gate."""
    if isinstance(config, SingleBlockResNetConfig):
        return apply_single_block_resnet_quantized(
            params, state, x, config, return_logits=return_logits
        )
    return apply_resnet_quantized(
        params, state, x, config, return_logits=return_logits
    )


def make_quantized_forward(
    model,
    params,
    model_state: Any = None,
    min_channels: Optional[int] = None,
    return_logits: bool = False,
):
    """Build a jitted ``fn(images) -> output`` serving the model with int8
    trunks.  ``model`` is a SingleBlockResNet or BottleneckResNet;
    ``model_state`` defaults to the empty state of a BN-free single-block
    model.  ``min_channels`` overrides the family's measured default gate
    (trunk width 128 for single-block, mid width 256 for bottleneck)."""
    single = isinstance(model.config, SingleBlockResNetConfig)
    if model_state is None:
        if not single or getattr(model.config, "use_batch_norm", False):
            raise ValueError(
                "make_quantized_forward needs model_state for models with "
                "BatchNorm running statistics (the bottleneck family, and "
                "single-block configs with use_batch_norm=True)."
            )
        model_state = {"stages": [{} for _ in stage_plans(model.config)]}

    @jax.jit
    def forward(x):
        if single:
            return apply_single_block_resnet_quantized(
                params, model_state, x, model.config,
                return_logits=return_logits,
                **({} if min_channels is None
                   else {"min_channels": min_channels}),
            )
        return apply_resnet_quantized(
            params, model_state, x, model.config,
            return_logits=return_logits,
            **({} if min_channels is None
               else {"min_mid_channels": min_channels}),
        )

    return forward
