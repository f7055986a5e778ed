"""Dynamic w8a8 int8 quantization for the conv path.

The reference has no quantization story (its inference path is the same
fp32 graph as training, `models/tfkeras_resnets.py` + `tf.nn.conv2d`); this
module is a TPU-native extension: the v5e MXU runs int8 x int8 -> int32 at
2x its bf16 FLOP rate (measured on this chip: 434 TOPS matmul vs 184
TFLOPS bf16 — docs/RESULTS.md section 2c), and the residual-stream HBM
traffic halves.  Measured on the 64Lx128F trunk (b=256): the full dynamic
w8a8 euler stack runs 1.93x faster than bf16 (16.6 vs 32.0 ms/pass,
298 effective TOPS) at 3.6e-3 relative L2 output error — including the
per-step quantize/rescale overhead, which XLA fuses into the surrounding
elementwise work.

Scheme (shared by inference and the int8-forward training steps below):
  - weights: static symmetric per-output-channel int8; scales from the
    dense materialized kernel (the antisymmetric structure is a training
    constraint — at inference the dense kernel is just numbers);
  - activations: dynamic symmetric per-tensor int8, absmax computed
    in-graph per conv input (one VPU reduction — no calibration pass, no
    accuracy cliff from stale static ranges as the residual stream's
    scale grows over depth);
  - accumulation: int32 on the MXU, rescaled to the compute dtype with
    the product of the two scales.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class QuantizedConvParams(NamedTuple):
    """Per-output-channel symmetric int8 conv weights.

    ``kernel_q``: int8, (..., kh, kw, c_in, c_out) — any leading stack axes.
    ``scale``:    fp32, (..., c_out) — dequantization scale per c_out.
    ``bias``:     fp32, (..., c_out) or None — NOT quantized (it adds into
                  the int32->fp rescaled accumulator, so quantizing it buys
                  nothing and costs accuracy).
    """

    kernel_q: jax.Array
    scale: jax.Array
    bias: Optional[jax.Array] = None


def quantize_kernel_per_cout(
    kernel: jax.Array, bias: Optional[jax.Array] = None
) -> QuantizedConvParams:
    """Symmetric per-output-channel int8 quantization of an HWIO kernel
    (optionally with leading stack axes, e.g. the (L, 3, 3, C, C) stacked
    trunk kernels)."""
    k = kernel.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(k), axis=(-4, -3, -2))
    # All-zero channels (possible mid-training or from pruning) would give
    # scale 0 and 0/0 below; floor at the smallest normal instead.
    scale = jnp.maximum(absmax, jnp.finfo(jnp.float32).tiny) / 127.0
    kq = jnp.clip(
        jnp.round(k / scale[..., None, None, None, :]), -127, 127
    ).astype(jnp.int8)
    b = None if bias is None else bias.astype(jnp.float32)
    return QuantizedConvParams(kernel_q=kq, scale=scale, bias=b)


def quantize_kernel_per_tensor(
    kernel: jax.Array, bias: Optional[jax.Array] = None
) -> QuantizedConvParams:
    """Symmetric per-TENSOR int8 quantization of an HWIO kernel (optionally
    with leading stack axes).

    One scale for the whole kernel, so the map k -> q(k) is odd-symmetric
    (``jnp.round(-x) == -jnp.round(x)``, clip is symmetric at ±127): a
    skew-centrosymmetric / channel-antisymmetric kernel quantizes to an
    EXACTLY skew-centrosymmetric int8 kernel, and the dequantized conv
    matrix stays antisymmetric — the stability property the architecture is
    built on (SURVEY.md §overview).  Per-output-channel scales
    (:func:`quantize_kernel_per_cout`) break that pairing (q(K)[...,i,j]*s_j
    != -rot180(q(K)[...,j,i])*s_i), which measured as DIVERGENCE when the
    quantized forward is in the training loop at scaled learning rates
    (docs/RESULTS.md section 6f) — training uses this per-tensor variant;
    serving keeps per-c_out (better pointwise accuracy, no feedback loop)."""
    k = kernel.astype(jnp.float32)
    spatial = tuple(range(k.ndim - 4, k.ndim))
    absmax = jnp.max(jnp.abs(k), axis=spatial)
    scale = jnp.maximum(absmax, jnp.finfo(jnp.float32).tiny) / 127.0
    kq = jnp.clip(
        jnp.round(k / scale[..., None, None, None, None]), -127, 127
    ).astype(jnp.int8)
    # Broadcast the scalar scale to (..., c_out) so QuantizedConvParams
    # consumers (dynamic_int8_conv_same's per-c_out rescale) need no case
    # split.
    scale = jnp.broadcast_to(scale[..., None], (*scale.shape, k.shape[-1]))
    b = None if bias is None else bias.astype(jnp.float32)
    return QuantizedConvParams(kernel_q=kq, scale=scale, bias=b)


def quantize_activations_per_tensor(y: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Dynamic symmetric per-tensor int8 quantization: returns (y_q, scale)
    with ``y ~= y_q * scale``."""
    yf = y.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(yf))
    scale = jnp.maximum(absmax, jnp.finfo(jnp.float32).tiny) / 127.0
    yq = jnp.clip(jnp.round(yf / scale), -127, 127).astype(jnp.int8)
    return yq, scale


def dynamic_int8_conv_same(
    y: jax.Array,
    qp: QuantizedConvParams,
    strides: Tuple[int, int] = (1, 1),
) -> jax.Array:
    """SAME 3x3/kxk conv in dynamic w8a8: quantize ``y`` per tensor, run the
    conv int8 x int8 -> int32 on the MXU, rescale by (activation scale x
    per-c_out weight scale), add the fp32 bias, return in ``y.dtype``.

    ``qp`` must be unstacked (kernel_q (kh, kw, c_in, c_out), scale (c_out,))
    — inside a depth scan the stacked params arrive pre-sliced."""
    yq, s_y = quantize_activations_per_tensor(y)
    zi = jax.lax.conv_general_dilated(
        yq,
        qp.kernel_q,
        window_strides=strides,
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    z = zi.astype(jnp.float32) * (s_y * qp.scale)
    if qp.bias is not None:
        z = z + qp.bias
    return z.astype(y.dtype)


# --- int8-forward TRAINING steps (straight-through estimator) -------------
#
# The forward conv runs dynamic w8a8 on the MXU exactly as at inference
# (weights re-quantized per layer per step — they change every update; the
# O(9 C^2) quantization reductions are noise next to the conv's
# O(N H W 9 C^2) MACs at training batch sizes); the BACKWARD is the plain
# bf16/fp32 path of `ops/conv.py`, i.e. quantization is differentiated as
# the identity (STE).  The bias needs no STE at all: it adds into the
# rescaled fp accumulator, so db = sum(g_z) is exact.  Gradient formulas and
# the memory-lean bool-mask residual are shared with the fp steps — the
# custom VJPs below reuse `ops.conv`'s backward functions verbatim, with the
# relu mask taken from the QUANTIZED pre-activation (what the forward
# actually computed).  No reference counterpart (the reference trains fp32
# only, `training/training.py`); this is the training-side extension of the
# serving path measured in docs/RESULTS.md section 2c.
#
# Weight scales default to PER-TENSOR here (unlike serving's per-c_out):
# per-c_out scales break the quantized kernel's exact skew-centrosymmetry
# and measured as divergence once the quantized forward is inside the
# training feedback loop at scaled learning rates — see
# quantize_kernel_per_tensor's docstring and docs/RESULTS.md section 6f.


def euler_relu_step_int8(
    y: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    h: float,
    weight_scale: str = "per_tensor",
):
    """One forward-Euler step ``y + h * relu(int8conv(y, K) + b)`` with the
    dynamic-w8a8 forward conv and the STE (bf16/fp32) backward of
    :func:`differential_equations_resnet_tpu.ops.conv.euler_relu_step`.

    ``weight_scale``: 'per_tensor' (default — preserves the antisymmetric
    structure exactly; the stable choice in the training loop) or
    'per_cout' (serving's scheme; measured divergent at depth — section
    6f).  ``bias`` must be an array (see euler_relu_step's note); pass
    ``jnp.zeros(C)`` for a bias-free step."""
    if bias is None:
        raise ValueError(
            "euler_relu_step_int8 requires an array bias (got None); pass "
            "jnp.zeros(channels) for a bias-free step."
        )
    return _euler_relu_step_int8(y, kernel, bias, h, weight_scale)


def _int8_preactivation(y, kernel, bias, weight_scale):
    if weight_scale == "per_tensor":
        qp = quantize_kernel_per_tensor(kernel, bias)
    elif weight_scale == "per_cout":
        qp = quantize_kernel_per_cout(kernel, bias)
    else:
        raise ValueError(
            f"weight_scale must be 'per_tensor' or 'per_cout', got "
            f"{weight_scale!r}."
        )
    return dynamic_int8_conv_same(y, qp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _euler_relu_step_int8(y, kernel, bias, h, weight_scale):
    z = _int8_preactivation(y, kernel, bias, weight_scale)
    return y + h * jax.nn.relu(z)


def _euler_relu_int8_fwd(y, kernel, bias, h, weight_scale):
    z = _int8_preactivation(y, kernel, bias, weight_scale)
    return y + h * jax.nn.relu(z), (y, kernel, z > 0)


def conv_relu_field_int8(
    y: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    weight_scale: str = "per_tensor",
):
    """One ODE field evaluation ``relu(int8conv(y, K) + b)`` — the int8-
    forward analogue of
    :func:`differential_equations_resnet_tpu.ops.conv.conv_relu_field`, for
    the multi-eval integrators (midpoint/rk4).  STE backward, bool-mask
    residual, per-tensor weight scales by default (see euler_relu_step_int8)."""
    if bias is None:
        raise ValueError(
            "conv_relu_field_int8 requires an array bias (got None); pass "
            "jnp.zeros(channels) for a bias-free field."
        )
    return _conv_relu_field_int8(y, kernel, bias, weight_scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _conv_relu_field_int8(y, kernel, bias, weight_scale):
    return jax.nn.relu(_int8_preactivation(y, kernel, bias, weight_scale))


def _conv_relu_field_int8_fwd(y, kernel, bias, weight_scale):
    z = _int8_preactivation(y, kernel, bias, weight_scale)
    return jax.nn.relu(z), (y, kernel, z > 0)


def _defvjps():
    # Deferred import: ops.conv is a sibling leaf module (no cycle in
    # practice), but keeping the import local makes the dependency
    # direction explicit — quantize borrows conv's backward functions
    # (quantization is differentiated as the identity, so the STE backward
    # IS the fp backward; the extra leading nondiff args are dropped).
    from differential_equations_resnet_tpu.ops import conv as _conv

    _euler_relu_step_int8.defvjp(
        _euler_relu_int8_fwd,
        lambda h, weight_scale, res, g: _conv._euler_relu_bwd(h, res, g),
    )
    _conv_relu_field_int8.defvjp(
        _conv_relu_field_int8_fwd,
        lambda weight_scale, res, g: _conv._conv_relu_field_bwd(res, g),
    )


_defvjps()
