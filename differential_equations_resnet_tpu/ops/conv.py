"""Convolution wrappers (NHWC / HWIO), the TPU-native replacement for the
reference's `tf.nn.conv2d` calls
(`layers/tfkeras_layer_Conv2DAntisymmetric3By3.py:157-171`).

All convs are expressed through `lax.conv_general_dilated`, which XLA lowers
onto the MXU; the antisymmetric variant materializes the dense kernel from the
packed parameters inline so that XLA fuses the scatter into the conv's operand
producer instead of re-executing a many-node assembly subgraph per step (the
reference's central performance pathology).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from differential_equations_resnet_tpu.ops.antisymmetric import (
    Antisym3x3Params,
    Antisym3x3DenseParams,
    materialize_3x3,
    materialize_3x3_from_dense,
)

DIMENSION_NUMBERS = ("NHWC", "HWIO", "NHWC")


def conv2d_same(
    x: jax.Array,
    kernel: jax.Array,
    strides: Tuple[int, int] = (1, 1),
    bias: Optional[jax.Array] = None,
    preferred_element_type=None,
) -> jax.Array:
    """2-D convolution, NHWC input, HWIO kernel, zero ("SAME") padding."""
    out = jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=strides,
        padding="SAME",
        dimension_numbers=DIMENSION_NUMBERS,
        preferred_element_type=preferred_element_type,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def conv2d_valid(
    x: jax.Array,
    kernel: jax.Array,
    strides: Tuple[int, int] = (1, 1),
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """2-D convolution with VALID padding (used by the bottleneck stem after
    explicit ZeroPadding, reference `models/tfkeras_resnets.py:775-787`)."""
    out = jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=strides,
        padding="VALID",
        dimension_numbers=DIMENSION_NUMBERS,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def antisym_conv2d_3x3(
    x: jax.Array,
    params: Antisym3x3Params,
    gamma: float = 0.0,
    strides: Tuple[int, int] = (1, 1),
) -> jax.Array:
    """Antisymmetric 3x3 conv: materialize K from packed params, conv, + bias.

    Functional equivalent of `Conv2DAntisymmetric3By3.call`
    (`layers/tfkeras_layer_Conv2DAntisymmetric3By3.py:157-171`).  Accepts
    either parameter layout; the dense-lower layout materializes without a
    scatter (the right choice at large C — see Antisym3x3DenseParams)."""
    if isinstance(params, Antisym3x3DenseParams):
        kernel = materialize_3x3_from_dense(params, gamma)
    else:
        kernel = materialize_3x3(params, gamma)
    return conv2d_same(x, kernel, strides=strides, bias=params.bias)


def euler_relu_step(y: jax.Array, kernel: jax.Array, bias: jax.Array, h: float):
    """One forward-Euler residual step ``y + h * relu(conv(y, K) + b)`` with a
    memory-lean custom VJP.  ``bias`` must be an array: the VJP produces a
    dense bias cotangent, so a ``None`` bias would surface as an opaque
    custom_vjp pytree-structure error under ``grad`` — pass ``jnp.zeros(C)``
    for a bias-free step instead.

    XLA's autodiff of the step saves the fp32 pre-activation z per layer for
    the backward relu'; across an L-layer scan that is L*|y| of extra HBM
    residual traffic.  Here the backward needs only the SIGN of z, so the
    residual is a bool mask (1 byte/elem instead of 4), and the two linear
    cotangents are built by `jax.linear_transpose` of the conv (abstract —
    no forward recompute):

        g_z = h * relu'(z) * g
        dy  = g + conv_transpose(g_z, K)
        dK  = correlate(y, g_z)
        db  = sum(g_z)
    """
    if bias is None:
        raise ValueError(
            "euler_relu_step requires an array bias (got None); pass "
            "jnp.zeros(channels) for a bias-free step."
        )
    return _euler_relu_step(y, kernel, bias, h)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _euler_relu_step(y, kernel, bias, h):
    z = conv2d_same(y, kernel, bias=bias)
    return y + h * jax.nn.relu(z)


def _euler_relu_fwd(y, kernel, bias, h):
    z = conv2d_same(y, kernel, bias=bias)
    return y + h * jax.nn.relu(z), (y, kernel, z > 0)


def _euler_relu_bwd(h, residuals, g):
    y, kernel, mask = residuals
    g_z = jnp.where(mask, h * g, 0.0).astype(g.dtype)
    (dy_conv,) = jax.linear_transpose(
        lambda yy: conv2d_same(yy, kernel), y
    )(g_z)
    (dk,) = jax.linear_transpose(
        lambda kk: conv2d_same(y, kk), kernel
    )(g_z)
    db = jnp.sum(g_z, axis=(0, 1, 2))
    return g + dy_conv, dk, db


_euler_relu_step.defvjp(_euler_relu_fwd, _euler_relu_bwd)


def conv_relu_field(y: jax.Array, kernel: jax.Array, bias: jax.Array):
    """One ODE field evaluation ``relu(conv(y, K) + b)`` with the same
    memory-lean custom VJP as :func:`euler_relu_step` — default autodiff
    would save the fp32 pre-activation z, but the backward relu' needs only
    its SIGN, so the residual is a bool mask (1 byte/elem instead of 4).

    This is the building block of the multi-eval integrators
    (midpoint/rk4): each Runge-Kutta stage evaluation inside the depth scan
    saves (stage input, mask) instead of (stage input, fp32 z), so across
    L layers the saved-residual HBM traffic drops by ~(stages * 3)/(stages *
    1.25) relative to plain autodiff.  ``bias`` must be an array (see the
    euler_relu_step note — a None bias surfaces as an opaque custom_vjp
    pytree error under grad)."""
    if bias is None:
        raise ValueError(
            "conv_relu_field requires an array bias (got None); pass "
            "jnp.zeros(channels) for a bias-free field."
        )
    return _conv_relu_field(y, kernel, bias)


@jax.custom_vjp
def _conv_relu_field(y, kernel, bias):
    return jax.nn.relu(conv2d_same(y, kernel, bias=bias))


def _conv_relu_field_fwd(y, kernel, bias):
    z = conv2d_same(y, kernel, bias=bias)
    return jax.nn.relu(z), (y, kernel, z > 0)


def _conv_relu_field_bwd(residuals, g):
    y, kernel, mask = residuals
    g_z = jnp.where(mask, g, 0.0).astype(g.dtype)
    (dy,) = jax.linear_transpose(
        lambda yy: conv2d_same(yy, kernel), y
    )(g_z)
    (dk,) = jax.linear_transpose(
        lambda kk: conv2d_same(y, kk), kernel
    )(g_z)
    db = jnp.sum(g_z, axis=(0, 1, 2))
    return dy, dk, db


_conv_relu_field.defvjp(_conv_relu_field_fwd, _conv_relu_field_bwd)
