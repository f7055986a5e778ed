"""Bottleneck ResNet-50/101/152 with optional antisymmetric 3x3 mid-convs.

Functional rebuild of `models/tfkeras_resnets.py:606-818`
(`build_resnet` / `get_resnet_build_function` / `bottleneck_identity_block` /
`bottleneck_conv_block`), including the v1 vs v1.5 striding variants and the
ResNet-50/101/152 presets.  Identity blocks within a stage are identical and
run as one `lax.scan` over stacked parameters.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from differential_equations_resnet_tpu.models.blocks import (
    apply_fc_activation,
    batch_norm,
    dense,
    global_average_pool,
    init_batch_norm,
    init_conv,
    init_dense,
    max_pool,
)
from differential_equations_resnet_tpu.ops.antisymmetric import init_antisym_3x3_dense
from differential_equations_resnet_tpu.ops.conv import (
    antisym_conv2d_3x3,
    conv2d_same,
    conv2d_valid,
)

Filters = Tuple[int, Optional[int], int]

_PRESETS = {
    # reference models/tfkeras_resnets.py:719-745
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
    "resnet152": (3, 8, 36, 3),
}
_PRESET_FILTERS: Tuple[Filters, ...] = (
    (64, 64, 256),
    (128, 128, 512),
    (256, 256, 1024),
    (512, 512, 2048),
)


@dataclasses.dataclass(frozen=True)
class BottleneckResNetConfig:
    """Mirrors `get_resnet_build_function`'s keyword surface
    (models/tfkeras_resnets.py:698-712)."""

    image_shape: Tuple[int, int, int] = (224, 224, 3)
    kernel_type: str = "antisymmetric"
    include_top: bool = True
    fc_activation: Optional[str] = "softmax"
    num_classes: Optional[int] = None
    l2_regularization: float = 0.0
    subtract_mean: Optional[Any] = None
    divide_by_stddev: Optional[Any] = None
    version: float = 1
    blocks_per_stage: Tuple[int, int, int, int] = (3, 4, 6, 3)
    filters_per_block: Tuple[Filters, ...] = _PRESET_FILTERS
    use_batch_norm: bool = True
    gamma: float = 0.0
    compute_dtype: Any = jnp.float32
    int8_forward: bool = False  # run the wide blocks' stride-1 main-path
                                # convs dynamic-w8a8 int8 on the MXU
                                # (ops/quantize.py conv_int8_same), backward
                                # per int8_backward.  Gated on the block's
                                # MID width >= int8_min_mid_channels — the
                                # same gate as quantized serving, where the
                                # stage probes measured 2.2-2.4x at mid >=
                                # 256 (docs/RESULTS.md section 2c); narrower
                                # stages take the fp path.  Strided convs
                                # (the conv-block downsamplers) stay fp: the
                                # int8 backward's transposed-kernel adjoint
                                # is stride-1 SAME only.
    int8_backward: str = "ste"  # 'ste' (fp adjoints) / 'dgrad' (int8 data-
                                # gradient conv) / 'wgrad' (int8 weight-
                                # gradient conv, noise-free data gradient —
                                # the convergent mode) / 'full' (both convs
                                # int8, int8 saved residuals) — the same
                                # modes as the single-block family
                                # (ops/quantize.py conv_int8_same).
    int8_min_mid_channels: int = 256

    def __post_init__(self):
        if self.include_top and self.num_classes is None:
            raise ValueError(
                "You must pass a positive integer for `num_classes` if "
                "`include_top` is `True`."
            )
        if self.version not in (1, 1.5):
            raise ValueError("Supported values for `version` are 1 and 1.5.")
        if self.int8_backward not in ("ste", "dgrad", "wgrad", "full"):
            raise ValueError(
                f"int8_backward must be 'ste', 'dgrad', 'wgrad', or 'full', "
                f"got {self.int8_backward!r}."
            )
        if self.int8_backward != "ste" and not self.int8_forward:
            raise ValueError(
                "int8_backward='dgrad'/'wgrad'/'full' requires "
                "int8_forward=True (the backward quantizes against the "
                "forward's int8 kernel)."
            )

    @property
    def name(self) -> str:
        return f"resnet_{self.kernel_type}"


def resnet_preset(
    preset: str, num_classes: int, antisymmetric_mid: bool = False, **overrides
) -> BottleneckResNetConfig:
    """ResNet-50/101/152 preset configs.  With ``antisymmetric_mid=True`` the
    3x3 mid-conv filter count is `None`, enabling the antisymmetric kernel
    (reference bottleneck blocks, models/tfkeras_resnets.py:163-177)."""
    if preset not in _PRESETS:
        raise ValueError(
            "`preset` must be one of 'resnet50', 'resnet101', 'resnet152', "
            f"but you passed preset={preset!r}."
        )
    filters = tuple(
        (f0, None if antisymmetric_mid else f1, f2)
        for (f0, f1, f2) in _PRESET_FILTERS
    )
    return BottleneckResNetConfig(
        blocks_per_stage=_PRESETS[preset],
        filters_per_block=filters,
        use_batch_norm=True,
        num_classes=num_classes,
        kernel_type="antisymmetric" if antisymmetric_mid else "regular",
        **overrides,
    )


def _mid_is_antisym(config: BottleneckResNetConfig, filters: Filters) -> bool:
    # reference: antisymmetric AND num_filters[1] is None
    return config.kernel_type == "antisymmetric" and filters[1] is None


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _init_bottleneck_block(key, config, in_channels, filters: Filters, dtype):
    """Parameters of one bottleneck block's main path (1x1, 3x3, 1x1)."""
    k1, k2, k3 = jax.random.split(key, 3)
    f0, f1, f2 = filters
    p = {"conv1": init_conv(k1, (1, 1), in_channels, f0, dtype=dtype)}
    s = {}
    if _mid_is_antisym(config, filters):
        # Dense-lower layout: at bottleneck widths (C up to 512) the
        # packed layout's scatter materialization costs more than the
        # block's convs (see Antisym3x3DenseParams); init draws are
        # bit-identical to the packed init on the same key.
        p["conv2"] = init_antisym_3x3_dense(k2, f0, dtype=dtype)
        mid_out = f0
    else:
        p["conv2"] = init_conv(k2, (3, 3), f0, f1, dtype=dtype)
        mid_out = f1
    p["conv3"] = init_conv(k3, (1, 1), mid_out, f2, dtype=dtype)
    if config.use_batch_norm:
        p["bn1"], s["bn1"] = init_batch_norm(f0, dtype)
        p["bn2"], s["bn2"] = init_batch_norm(mid_out, dtype)
        p["bn3"], s["bn3"] = init_batch_norm(f2, dtype)
    return p, s


def init_resnet(key: jax.Array, config: BottleneckResNetConfig):
    """Returns (params, state)."""
    dtype = jnp.float32
    keys = jax.random.split(key, 2 + 2 * len(config.blocks_per_stage))
    k_iter = iter(keys)

    params = {"stem": init_conv(next(k_iter), (7, 7), config.image_shape[-1], 64, dtype=dtype)}
    state = {}
    if config.use_batch_norm:
        params["stem_bn"], state["stem_bn"] = init_batch_norm(64, dtype)

    in_channels = 64
    stage_params, stage_state = [], []
    for stage_idx, (num_blocks, filters) in enumerate(
        zip(config.blocks_per_stage, config.filters_per_block)
    ):
        sp, ss = {}, {}
        # Conv block (with 1x1 shortcut projection).
        kc, kshort = jax.random.split(next(k_iter))
        sp["conv_block"], ss["conv_block"] = _init_bottleneck_block(
            kc, config, in_channels, filters, dtype
        )
        sp["shortcut"] = init_conv(kshort, (1, 1), in_channels, filters[2], dtype=dtype)
        if config.use_batch_norm:
            sp["bn_shortcut"], ss["bn_shortcut"] = init_batch_norm(filters[2], dtype)
        in_channels = filters[2]
        # Stacked identity blocks.
        n_id = num_blocks - 1
        if n_id > 0:
            bkeys = jax.random.split(next(k_iter), n_id)
            blocks = [
                _init_bottleneck_block(bk, config, in_channels, filters, dtype)
                for bk in bkeys
            ]
            sp["identity_blocks"] = jax.tree.map(
                lambda *xs: jnp.stack(xs), *[b[0] for b in blocks]
            )
            ss["identity_blocks"] = jax.tree.map(
                lambda *xs: jnp.stack(xs), *[b[1] for b in blocks]
            )
        else:
            next(k_iter)
            sp["identity_blocks"] = None
            ss["identity_blocks"] = None
        stage_params.append(sp)
        stage_state.append(ss)
    params["stages"] = stage_params
    state["stages"] = stage_state

    if config.include_top:
        params["head"] = init_dense(
            next(k_iter), config.filters_per_block[-1][2], config.num_classes, dtype
        )
    return params, state


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------


def _block_int8(config, filters) -> bool:
    """Whether this block's stride-1 main-path convs run the int8 training
    path: the flag is on and the MID width clears the serving-calibrated
    gate (stage probes measured the w8a8 win at mid >= 256 — docs/RESULTS.md
    section 2c; training shares the gate since the conv shapes are
    identical)."""
    mid_width = filters[0] if _mid_is_antisym(config, filters) else filters[1]
    return config.int8_forward and mid_width >= config.int8_min_mid_channels


def _conv_or_int8(y, kernel, bias, strides, q, backward):
    """Stride-1 convs take the w8a8 path when the block qualifies; strided
    convs always stay fp (the int8 backward's transposed-kernel adjoint is
    stride-1 SAME only)."""
    if q and strides == (1, 1):
        from differential_equations_resnet_tpu.ops.quantize import (
            conv_int8_same,
        )

        b = bias if bias is not None else jnp.zeros(
            (kernel.shape[-1],), jnp.float32
        )
        return conv_int8_same(y, kernel, b, "per_tensor", backward)
    return conv2d_same(y, kernel, strides=strides, bias=bias)


def _apply_bottleneck_main(x, p, s, config, filters, strides, train):
    """Main path of a bottleneck block: 1x1 -> kxk -> 1x1 with BN/relu,
    striding per version (reference bottleneck_conv_block:338-345)."""
    if config.version == 1:
        strides_1x1, strides_kxk = strides, (1, 1)
    else:  # 1.5
        strides_1x1, strides_kxk = (1, 1), strides
    q = _block_int8(config, filters)
    bwd = config.int8_backward
    new_s = {}
    y = _conv_or_int8(x, p["conv1"].kernel, p["conv1"].bias, strides_1x1, q, bwd)
    if config.use_batch_norm:
        y, new_s["bn1"] = batch_norm(y, p["bn1"], s["bn1"], train)
    y = jax.nn.relu(y)

    if _mid_is_antisym(config, filters):
        if q and strides_kxk == (1, 1):
            # Materialize the dense antisymmetric kernel (the scatter's VJP
            # folds dk back onto the packed params) and run it w8a8; the
            # per-tensor scale preserves the skew structure exactly
            # (quantize_kernel_per_tensor's docstring).
            from differential_equations_resnet_tpu.ops.antisymmetric import (
                materialize_3x3_from_dense,
            )

            kernel = materialize_3x3_from_dense(p["conv2"], config.gamma)
            y = _conv_or_int8(
                y, kernel, p["conv2"].bias, strides_kxk, q, bwd
            )
        else:
            y = antisym_conv2d_3x3(
                y, p["conv2"], gamma=config.gamma, strides=strides_kxk
            )
    else:
        y = _conv_or_int8(
            y, p["conv2"].kernel, p["conv2"].bias, strides_kxk, q, bwd
        )
    if config.use_batch_norm:
        y, new_s["bn2"] = batch_norm(y, p["bn2"], s["bn2"], train)
    y = jax.nn.relu(y)

    y = _conv_or_int8(y, p["conv3"].kernel, p["conv3"].bias, (1, 1), q, bwd)
    if config.use_batch_norm:
        y, new_s["bn3"] = batch_norm(y, p["bn3"], s["bn3"], train)
    return y, new_s


def apply_resnet(
    params,
    state,
    x: jax.Array,
    config: BottleneckResNetConfig,
    train: bool = False,
    return_logits: bool = False,
):
    """Forward pass.  Returns (output, new_state)."""
    x = x.astype(config.compute_dtype)
    if config.subtract_mean is not None:
        x = x - jnp.asarray(config.subtract_mean, x.dtype)
    if config.divide_by_stddev is not None:
        x = x / jnp.asarray(config.divide_by_stddev, x.dtype)

    new_state = {"stages": []}
    # Stem: ZeroPad(3) + 7x7/2 VALID + BN + relu + ZeroPad(1) + 3x3/2 maxpool
    # (reference models/tfkeras_resnets.py:775-787).
    x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    x = conv2d_valid(x, params["stem"].kernel, strides=(2, 2), bias=params["stem"].bias)
    if config.use_batch_norm:
        x, new_state["stem_bn"] = batch_norm(x, params["stem_bn"], state["stem_bn"], train)
    x = jax.nn.relu(x)
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    x = max_pool(x, (3, 3), (2, 2))

    for stage_idx, (sp, ss, filters) in enumerate(
        zip(params["stages"], state["stages"], config.filters_per_block)
    ):
        strides = (1, 1) if stage_idx == 0 else (2, 2)
        stage_new_ss = {}
        # Conv block with projection shortcut, final relu(add).
        main, stage_new_ss["conv_block"] = _apply_bottleneck_main(
            x, sp["conv_block"], ss["conv_block"], config, filters, strides, train
        )
        shortcut = conv2d_same(
            x, sp["shortcut"].kernel, strides=strides, bias=sp["shortcut"].bias
        )
        if config.use_batch_norm:
            shortcut, stage_new_ss["bn_shortcut"] = batch_norm(
                shortcut, sp["bn_shortcut"], ss["bn_shortcut"], train
            )
        x = jax.nn.relu(main + shortcut)

        # Identity blocks: scan over the stacked stack.
        if sp["identity_blocks"] is not None:

            def body(y, inputs):
                p, s_in = inputs
                main, s_out = _apply_bottleneck_main(
                    y, p, s_in, config, filters, (1, 1), train
                )
                return jax.nn.relu(main + y), s_out

            x, id_new_ss = jax.lax.scan(
                body, x, (sp["identity_blocks"], ss["identity_blocks"])
            )
            stage_new_ss["identity_blocks"] = id_new_ss
        else:
            stage_new_ss["identity_blocks"] = None
        new_state["stages"].append(stage_new_ss)

    if config.include_top:
        x = global_average_pool(x)
        x = dense(x.astype(jnp.float32), params["head"])
        if not return_logits:
            x = apply_fc_activation(x, config.fc_activation)
    if not config.use_batch_norm:
        new_state = state
    return x, new_state


class BottleneckResNet:
    def __init__(self, config: BottleneckResNetConfig):
        self.config = config

    def init(self, key: jax.Array):
        return init_resnet(key, self.config)

    def apply(self, params, state, x, train=False, return_logits=False):
        return apply_resnet(
            params, state, x, self.config, train=train, return_logits=return_logits
        )

    @property
    def name(self) -> str:
        return self.config.name


def build_resnet(config=None, **kwargs) -> BottleneckResNet:
    """API-parity constructor (reference `build_resnet`,
    models/tfkeras_resnets.py:606-696).

    Accepts either a `BottleneckResNetConfig` or the reference's keyword
    surface, including ``preset='resnet50'|'resnet101'|'resnet152'``."""
    if config is None:
        preset = kwargs.pop("preset", None)
        if preset is not None:
            kwargs["blocks_per_stage"] = _PRESETS[preset]
        if "blocks_per_stage" in kwargs:
            kwargs["blocks_per_stage"] = tuple(kwargs["blocks_per_stage"])
        if "filters_per_block" in kwargs:
            kwargs["filters_per_block"] = tuple(
                tuple(f) for f in kwargs["filters_per_block"]
            )
        config = BottleneckResNetConfig(**kwargs)
    elif kwargs:
        raise TypeError("Pass either a config object or keyword arguments, not both.")
    from differential_equations_resnet_tpu.models.blocks import cached_model

    return cached_model(_MODEL_CACHE, config, BottleneckResNet)


_MODEL_CACHE: dict = {}


def get_resnet_build_function(**kwargs):
    """Factory form (reference `get_resnet_build_function`,
    models/tfkeras_resnets.py:698-818)."""
    return lambda: build_resnet(**kwargs)
