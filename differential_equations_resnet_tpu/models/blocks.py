"""Functional building blocks shared by the model families.

Parameters are plain pytrees (NamedTuples of arrays); every block is a pure
function.  Initializers reproduce TF-1.12 Keras semantics: `he_normal` is a
truncated normal with stddev sqrt(2/fan_in) (no TF-2 correction factor), conv
biases start at zero, BatchNorm uses eps=1e-3 / momentum=0.99.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from differential_equations_resnet_tpu.ops.antisymmetric import he_truncated_normal


class ConvParams(NamedTuple):
    kernel: jax.Array               # (kh, kw, c_in, c_out) HWIO
    bias: Optional[jax.Array] = None


class DenseParams(NamedTuple):
    kernel: jax.Array               # (d_in, d_out)
    bias: jax.Array


class BatchNormParams(NamedTuple):
    scale: jax.Array                # gamma, (C,)
    offset: jax.Array               # beta, (C,)


class BatchNormState(NamedTuple):
    mean: jax.Array                 # running mean, (C,)
    var: jax.Array                  # running variance, (C,)


BN_EPSILON = 1e-3     # Keras BatchNormalization default (TF 1.12).
BN_MOMENTUM = 0.99


def init_conv(
    key: jax.Array,
    kernel_size: Tuple[int, int],
    c_in: int,
    c_out: int,
    use_bias: bool = True,
    dtype=jnp.float32,
) -> ConvParams:
    fan_in = kernel_size[0] * kernel_size[1] * c_in
    kernel = he_truncated_normal(
        key, (kernel_size[0], kernel_size[1], c_in, c_out), fan_in, dtype
    )
    bias = jnp.zeros((c_out,), dtype) if use_bias else None
    return ConvParams(kernel=kernel, bias=bias)


def init_dense(key: jax.Array, d_in: int, d_out: int, dtype=jnp.float32) -> DenseParams:
    kernel = he_truncated_normal(key, (d_in, d_out), d_in, dtype)
    return DenseParams(kernel=kernel, bias=jnp.zeros((d_out,), dtype))


def init_batch_norm(channels: int, dtype=jnp.float32):
    params = BatchNormParams(
        scale=jnp.ones((channels,), dtype), offset=jnp.zeros((channels,), dtype)
    )
    state = BatchNormState(
        mean=jnp.zeros((channels,), dtype), var=jnp.ones((channels,), dtype)
    )
    return params, state


def batch_norm(
    x: jax.Array,
    params: BatchNormParams,
    state: BatchNormState,
    train: bool,
) -> Tuple[jax.Array, BatchNormState]:
    """Channel-axis batch normalization with Keras running-stat semantics."""
    if train:
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axis=axes)
        var = jnp.var(x, axis=axes)
        new_state = BatchNormState(
            mean=BN_MOMENTUM * state.mean + (1.0 - BN_MOMENTUM) * mean,
            var=BN_MOMENTUM * state.var + (1.0 - BN_MOMENTUM) * var,
        )
    else:
        mean, var = state.mean, state.var
        new_state = state
    inv = jax.lax.rsqrt(var.astype(x.dtype) + jnp.asarray(BN_EPSILON, x.dtype))
    y = (x - mean.astype(x.dtype)) * inv * params.scale.astype(x.dtype)
    return y + params.offset.astype(x.dtype), new_state


def dense(x: jax.Array, params: DenseParams) -> jax.Array:
    return (
        jnp.dot(x, params.kernel.astype(x.dtype), preferred_element_type=x.dtype)
        + params.bias.astype(x.dtype)
    )


def global_average_pool(x: jax.Array) -> jax.Array:
    """NHWC -> NC (reference head: GlobalAveragePooling2D,
    models/tfkeras_resnets.py:595-597)."""
    return jnp.mean(x, axis=(1, 2))


def max_pool_2x2(x: jax.Array) -> jax.Array:
    """Keras MaxPooling2D(pool_size=2, strides=None) — VALID padding."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    )


def max_pool(x: jax.Array, window: Tuple[int, int], strides: Tuple[int, int]) -> jax.Array:
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, window[0], window[1], 1),
        window_strides=(1, strides[0], strides[1], 1),
        padding="VALID",
    )


def apply_fc_activation(x: jax.Array, fc_activation: Optional[str]) -> jax.Array:
    if fc_activation is None:
        return x
    if fc_activation == "softmax":
        return jax.nn.softmax(x, axis=-1)
    fn = getattr(jax.nn, fc_activation, None)
    if fn is None:
        raise ValueError(f"Unsupported fc_activation {fc_activation!r}.")
    return fn(x)


def l2_kernel_penalty(params, weight: float) -> jax.Array:
    """Keras-style L2 kernel regularization: ``weight * sum(k**2)`` over every
    KERNEL parameter — dense conv/fc kernels and the antisymmetric layers'
    free variables (a, b, c, d, cross / diag, cross) — excluding biases,
    BatchNorm parameters, and the constant gamma center, exactly as the
    reference's `kernel_regularizer=l2(l2_regularization)` wiring
    (models/tfkeras_resnets.py:568-597,781-807; the antisymmetric layer
    passes the regularizer to its free variables only,
    layers/tfkeras_layer_Conv2DAntisymmetric3By3.py:123,223-244 with the
    dependent mirrors and center at regularizer=None, :152,257)."""
    from differential_equations_resnet_tpu.ops.antisymmetric import (
        Antisym3x3DenseParams,
        Antisym3x3Params,
        AntisymKxKParams,
    )

    leaves = []

    def collect(p):
        if isinstance(p, (ConvParams, DenseParams)):
            leaves.append(p.kernel)
        elif isinstance(p, (Antisym3x3Params, Antisym3x3DenseParams)):
            # Dense layout: the structural zeros contribute 0 to the sum, so
            # the penalty equals the packed layout's exactly.
            leaves.extend([p.a, p.b, p.c, p.d, p.cross])
        elif isinstance(p, AntisymKxKParams):
            leaves.extend([p.diag, p.cross])
        elif isinstance(p, dict):
            for v in p.values():
                collect(v)
        elif isinstance(p, (list, tuple)):
            for v in p:
                collect(v)
        # BatchNormParams, bare arrays (biases), None: not regularized.

    collect(params)
    if not leaves:
        return jnp.zeros((), jnp.float32)
    return weight * sum(jnp.sum(jnp.square(leaf.astype(jnp.float32))) for leaf in leaves)


def cached_model(cache: dict, config, ctor):
    """Value-keyed model-wrapper cache with an unhashable-config fallback.

    Model wrappers are stateless (config only), so equal configs can share
    one object — which makes the memoized step builders
    (train/train_step.py `make_*`) hit for equal configurations and the XLA
    executables compile once per process.  Configs carrying unhashable
    fields (e.g. an ndarray subtract_mean) fall back to a fresh wrapper."""
    try:
        cached = cache.get(config)
    except TypeError:
        return ctor(config)
    if cached is None:
        cached = cache[config] = ctor(config)
    return cached
