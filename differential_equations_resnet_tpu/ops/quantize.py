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


def _dynamic_int8_conv_parts(
    y: jax.Array,
    qp: QuantizedConvParams,
    strides: Tuple[int, int] = (1, 1),
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(z, y_q, s_y): the dynamic-w8a8 conv output plus the quantized
    activations it consumed — the int8 training backward reuses (y_q, s_y)
    as its saved residual (1 B/element instead of the 2-4 B fp
    activation)."""
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
    return z.astype(y.dtype), yq, s_y


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
    return _dynamic_int8_conv_parts(y, qp, strides)[0]


def transpose_int8_kernel(kernel_q: jax.Array) -> jax.Array:
    """The kernel of the ADJOINT conv: rot180 in (kh, kw) + (c_in, c_out)
    swap — ``linear_transpose(conv2d_same(., K))`` equals
    ``conv2d_same(., transpose(K))`` for stride-1 SAME odd-sized kernels.
    A pure int8 relayout (exact, no arithmetic), so the backward data-
    gradient conv runs w8a8 on the MXU with zero extra quantization error.

    For an antisymmetric kernel quantized with ONE per-tensor scale this
    is exactly ``-kernel_q`` (the skew pairing survives integer rounding —
    quantize_kernel_per_tensor's docstring), i.e. the backward integrates
    the SAME stable operator backwards; the relayout form is used so
    'regular'/'centrosymmetric' trunks get a correct adjoint too."""
    return kernel_q[..., ::-1, ::-1, :, :].swapaxes(-1, -2)


def _int8_dgrad(g_z, kernel_q, k_scale, out_dtype):
    """Data-gradient conv in w8a8: quantize the masked cotangent per
    tensor, conv against the transposed int8 kernel, rescale.  Returns
    (dy_conv, g_q, s_g) so the weight gradient can reuse the quantized
    cotangent (one quantization feeds both backward convs)."""
    g_q, s_g = quantize_activations_per_tensor(g_z)
    di = jax.lax.conv_general_dilated(
        g_q,
        transpose_int8_kernel(kernel_q),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return (di.astype(jnp.float32) * (s_g * k_scale)).astype(out_dtype), g_q, s_g


def _int8_wgrad(y_q, g_q, kernel_hw=(3, 3)):
    """Weight-gradient correlation in int8 x int8 -> int32:
    ``dk[h, w, i, o] = sum_{n,r,c} y_pad[n, r+h-p, c+w-p, i] * g[n, r, c, o]``
    for the odd-k SAME stride-1 conv (p = k//2 per spatial dim) — expressed
    as a conv whose batch axis is the contraction (lhs spec CHWN: images' N
    is the reduced feature, c_in is the conv batch; rhs spec IHWO: the
    cotangent's N contracts, c_out is the output feature; out spec
    HWNC = HWIO).  ``kernel_hw`` is the PRIMAL kernel's spatial shape: the
    output spatial extent is ``H + 2*(k//2) - H + 1 = k`` per dim, so the
    padding must come from the kernel — hardcoding 3x3 padding silently
    produced a (3, 3, C, C)-shaped dk for 5x5 kernels (round-4 VERDICT
    weak #1).

    Measured A/B at the 128Lx128F b256 MFU peak (round 4, device-resident
    epoch, interleaved): this conv form and the per-tap
    :func:`_int8_wgrad_taps` land at IDENTICAL throughput (5.112 vs 5.112
    steps/s) — the wgrad shape is operand-traffic-bound either way, so the
    'full'-vs-'dgrad' gap lives in the int8 wgrad's extra quantized-operand
    reads, not in the lowering.  The conv form stays as production (one op);
    the dot form is kept as a bit-exact independent oracle of these
    dimension numbers."""
    kh, kw = kernel_hw
    return jax.lax.conv_general_dilated(
        y_q,
        g_q,
        window_strides=(1, 1),
        padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=("CHWN", "IHWO", "HWNC"),
        preferred_element_type=jnp.int32,
    )


def _int8_wgrad_taps(y_q, g_q, kernel_hw=(3, 3)):
    """The same odd-k weight-gradient correlation as :func:`_int8_wgrad`,
    expressed as kh*kw int8 x int8 -> int32 ``dot_general``s — one per
    kernel tap, each a plain (C_in, N*H*W) @ (N*H*W, C_out) matmul over the
    overlap region of the shifted activation and the cotangent (SAME zero
    padding contributes nothing, so slicing BOTH operands to the overlap is
    exact and materializes no padded copy).  Bit-identical to the conv form
    (integer arithmetic) and measured at IDENTICAL throughput at the MFU
    peak — kept as the independent oracle pinning the conv form's
    dimension numbers, and as the recorded negative result for the "hand
    the MXU a plain matmul" hypothesis (docs/RESULTS.md section 6g)."""
    n, hh, ww, _ = y_q.shape
    kh, kw = kernel_hw
    contract = (((0, 1, 2), (0, 1, 2)), ((), ()))
    rows = []
    for dh in range(-(kh // 2), kh // 2 + 1):
        cols = []
        for dw in range(-(kw // 2), kw // 2 + 1):
            ys = y_q[
                :,
                max(0, dh) : hh + min(0, dh),
                max(0, dw) : ww + min(0, dw),
                :,
            ]
            gs = g_q[
                :,
                max(0, -dh) : hh + min(0, -dh),
                max(0, -dw) : ww + min(0, -dw),
                :,
            ]
            cols.append(
                jax.lax.dot_general(
                    ys, gs, contract, preferred_element_type=jnp.int32
                )
            )
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)


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


_BACKWARD_MODES = ("ste", "dgrad", "wgrad", "full")


def _check_int8_args(name, kernel, bias, weight_scale, backward):
    if bias is None:
        raise ValueError(
            f"{name} requires an array bias (got None); pass "
            "jnp.zeros(channels) for a bias-free step."
        )
    if backward not in _BACKWARD_MODES:
        raise ValueError(
            f"backward must be one of {_BACKWARD_MODES}, got {backward!r}."
        )
    if backward != "ste" and weight_scale != "per_tensor":
        # The int8 dgrad's rescale factors (s_g * s_K) out of the int32
        # accumulator, which needs ONE kernel scale: per-c_out scales sit
        # on the CONTRACTING dim of the transposed conv and cannot factor.
        raise ValueError(
            "int8 backward modes require weight_scale='per_tensor' (the "
            "transposed conv's rescale needs a single kernel scale; "
            "per-c_out scales are on its contracting dimension)."
        )
    if backward != "ste":
        # 'dgrad'/'wgrad'/'full' express the backward convs with SAME /
        # symmetric padding, which is the exact adjoint only for odd
        # spatial kernel extents (even-k SAME padding is asymmetric and
        # the transposed-kernel trick breaks).  The fp 'ste' backward is
        # shape-generic (jax.linear_transpose) and stays available.
        kh, kw = kernel.shape[-4], kernel.shape[-3]
        if kh % 2 == 0 or kw % 2 == 0:
            raise ValueError(
                f"{name}: int8 backward modes ('dgrad'/'wgrad'/'full') "
                f"require odd spatial kernel extents, got ({kh}, {kw}); "
                "use backward='ste' for even kernels."
            )


def euler_relu_step_int8(
    y: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    h: float,
    weight_scale: str = "per_tensor",
    backward: str = "ste",
):
    """One forward-Euler step ``y + h * relu(int8conv(y, K) + b)`` with the
    dynamic-w8a8 forward conv.

    ``backward`` selects how much of the BACKWARD also runs w8a8 on the MXU
    (quantization always differentiated as the identity — STE):
      - 'ste' (default): the unchanged bf16/fp32 bool-mask backward of
        :func:`differential_equations_resnet_tpu.ops.conv.euler_relu_step`.
      - 'dgrad': the data-gradient conv runs int8 against the TRANSPOSED
        int8 kernel (an exact relayout; for antisymmetric kernels it is
        literally ``-kernel_q``), with the masked cotangent quantized per
        tensor; the weight gradient stays fp.  The residual-connection
        term of dy stays EXACT (``dy = g + h * conv_T(...)``) — the
        quantization noise enters only the h-scaled correction, mirroring
        the forward's noise structure.
      - 'wgrad': the weight-gradient correlation runs int8 (quantized
        cotangent x the forward's saved int8 activations — same 1 B/element
        residual memory win as 'full'), while the DATA gradient stays a
        full-precision conv against the DEQUANTIZED transposed kernel (the
        exact adjoint of the int8 forward's effective operator; int8 kernel
        values are exact in bf16).  The structural point: the wgrad conv's
        quantization noise lands in dk, a LEAF of the reverse scan, so it
        cannot compound over depth — the convergent int8-backward mode
        (section 6g, round 5).
      - 'full': 'dgrad' plus the weight-gradient correlation in int8,
        reusing the forward's quantized activations (y_q, saved as the
        residual: 1 B/element instead of the 2-4 B fp activation — the
        no-remat depth capacity grows ~1.5x over bf16) and the dgrad's
        quantized cotangent (one quantization feeds both convs).  dk is
        the exact STE gradient of what the forward computed: the forward
        consumed y_q * s_y, and dk correlates exactly that.

    CONVERGENCE (measured, docs/RESULTS.md section 6g round 5): 'dgrad'
    and 'full' quantize the cotangent on the residual-stream path; the
    rounding acts as a generic perturbation of the norm-preserving reverse
    propagator and compounds exp(h*lambda) per layer — and since h = T/L,
    the total ~exp(T*lambda) is set by the ODE's final time, not depth:
    both modes DIVERGE from the first epoch at EVERY depth tested
    (8/16/32/64L x 128F) even at lr 1e-3 (gradient norms blow up ~1e24x
    at 64 layers), scheme-independently (per-sample / rms-clipped scales
    measured identical).  They are retained as
    experimental/throughput-measurement modes; use 'wgrad' (or 'ste') for
    training runs.

    ``weight_scale``: 'per_tensor' (default — preserves the antisymmetric
    structure exactly; the stable choice in the training loop) or
    'per_cout' (serving's scheme; measured divergent at depth — section
    6f; incompatible with int8 backward modes).  ``bias`` must be an array
    (see euler_relu_step's note); pass ``jnp.zeros(C)`` for a bias-free
    step."""
    _check_int8_args("euler_relu_step_int8", kernel, bias, weight_scale, backward)
    return _euler_relu_step_int8(y, kernel, bias, h, weight_scale, backward)


def _quantize_kernel(kernel, bias, weight_scale):
    if weight_scale == "per_tensor":
        return quantize_kernel_per_tensor(kernel, bias)
    elif weight_scale == "per_cout":
        return quantize_kernel_per_cout(kernel, bias)
    raise ValueError(
        f"weight_scale must be 'per_tensor' or 'per_cout', got "
        f"{weight_scale!r}."
    )


def _int8_preactivation_parts(y, kernel, bias, weight_scale):
    qp = _quantize_kernel(kernel, bias, weight_scale)
    z, yq, s_y = _dynamic_int8_conv_parts(y, qp)
    return z, yq, s_y, qp


def _int8_preactivation(y, kernel, bias, weight_scale):
    return _int8_preactivation_parts(y, kernel, bias, weight_scale)[0]


def _int8_residuals(backward, y, kernel, z, yq, s_y, qp):
    """Mode-dependent saved residuals (static per trace: ``backward`` is a
    nondiff argument).  'wgrad'/'full' save the int8 activations instead of
    the fp ones — that is where the depth-capacity win comes from."""
    mask = z > 0
    if backward == "ste":
        return (y, kernel, mask)
    k_scale = qp.scale[..., 0]  # per_tensor: one scale, broadcast to c_out
    if backward == "dgrad":
        return (y, kernel, qp.kernel_q, k_scale, mask)
    # 'wgrad'/'full': no fp activation saved; a 0-d token carries the kernel
    # dtype so dk can be returned in the primal's dtype.
    return (yq, s_y, qp.kernel_q, k_scale, mask,
            jnp.zeros((), kernel.dtype))


def _int8_res_backward(backward, yq, s_y, kq, k_scale, ktok, g_z, g_dtype):
    """(dy_conv, dk) for the int8-RESIDUAL modes ('wgrad'/'full') — ONE
    implementation shared by the euler/field steps and the bare conv, so
    the two surfaces cannot drift apart (review r5).

    'wgrad' dy: FULL-precision cotangent conv against the DEQUANTIZED
    transposed kernel (int8 values are exact in bf16/fp32; the scale
    multiplies the conv OUTPUT) — the exact adjoint of the int8 forward's
    effective linear operator, with ZERO quantization noise on the
    residual-stream path.  This is the structural point of the mode:
    quantizing the cotangent itself ('dgrad'/'full') acts as a generic
    perturbation of the norm-preserving reverse propagator and its noise
    compounds ~exp(T*lambda) (measured divergence at every depth tested —
    docs/RESULTS.md section 6g round 5), while the wgrad conv's noise
    lands in dk, a LEAF of the reverse scan."""
    from differential_equations_resnet_tpu.ops.conv import conv2d_same

    if backward == "wgrad":
        kT = transpose_int8_kernel(kq).astype(g_z.dtype)
        dy_conv = (conv2d_same(g_z, kT) * k_scale).astype(g_dtype)
        g_q, s_g = quantize_activations_per_tensor(g_z)
    else:  # 'full'
        dy_conv, g_q, s_g = _int8_dgrad(g_z, kq, k_scale, g_dtype)
    dk = (
        _int8_wgrad(yq, g_q, kq.shape[-4:-2]).astype(jnp.float32)
        * (s_y * s_g)
    ).astype(ktok.dtype)
    return dy_conv, dk


def _int8_linear_bwd(backward, res, g_z, g_dtype):
    """(dy_conv, dk, db) shared by the euler step and the field eval —
    everything downstream of the mode-independent ``g_z = mask * (h*) g``."""
    from differential_equations_resnet_tpu.ops.conv import conv2d_same

    db = jnp.sum(g_z, axis=(0, 1, 2))
    if backward == "dgrad":
        y, kernel, kq, k_scale, _ = res
        dy_conv, _, _ = _int8_dgrad(g_z, kq, k_scale, g_dtype)
        (dk,) = jax.linear_transpose(
            lambda kk: conv2d_same(y, kk), kernel
        )(g_z)
        return dy_conv, dk, db
    yq, s_y, kq, k_scale, _, ktok = res
    dy_conv, dk = _int8_res_backward(
        backward, yq, s_y, kq, k_scale, ktok, g_z, g_dtype
    )
    return dy_conv, dk, db


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _euler_relu_step_int8(y, kernel, bias, h, weight_scale, backward):
    z = _int8_preactivation(y, kernel, bias, weight_scale)
    return y + h * jax.nn.relu(z)


def _euler_relu_int8_fwd(y, kernel, bias, h, weight_scale, backward):
    z, yq, s_y, qp = _int8_preactivation_parts(y, kernel, bias, weight_scale)
    out = y + h * jax.nn.relu(z)
    return out, _int8_residuals(backward, y, kernel, z, yq, s_y, qp)


def _euler_relu_int8_bwd(h, weight_scale, backward, res, g):
    if backward == "ste":
        from differential_equations_resnet_tpu.ops import conv as _conv

        return _conv._euler_relu_bwd(h, res, g)
    mask = res[4]
    g_z = jnp.where(mask, h * g, 0.0).astype(g.dtype)
    dy_conv, dk, db = _int8_linear_bwd(backward, res, g_z, g.dtype)
    return g + dy_conv, dk, db


_euler_relu_step_int8.defvjp(_euler_relu_int8_fwd, _euler_relu_int8_bwd)


def conv_int8_same(
    y: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    weight_scale: str = "per_tensor",
    backward: str = "ste",
):
    """BARE stride-1 SAME conv in dynamic w8a8 with a trainable backward —
    no relu fused in.  This is the training primitive for conv->BN->relu
    structures (the bottleneck family's blocks, bottleneck_resnet.py) where
    the euler/field steps' fused relu mask does not apply: the cotangent
    arrives through BN's VJP already, so the backward is purely the two
    linear adjoints (+ db = sum g).

    ``backward`` as in :func:`euler_relu_step_int8`: 'ste' = fp adjoints
    (jax.linear_transpose of the fp conv — quantization differentiated as
    identity), 'dgrad' = int8 data-gradient conv against the transposed
    int8 kernel, 'wgrad' = int8 weight-gradient conv + noise-free
    dequantized-kernel data gradient (the convergent mode — see
    euler_relu_step_int8's convergence note), 'full' = both backward convs
    int8, reusing the forward's quantized activations as the saved
    residual (1 B/element).  Odd spatial kernel extents only for the int8
    backward modes (1x1 and 3x3 — the bottleneck's convs — both qualify).
    No reference counterpart (the
    reference trains fp32 only); this is the training-side extension of
    the bottleneck serving path measured in docs/RESULTS.md section 2c."""
    _check_int8_args("conv_int8_same", kernel, bias, weight_scale, backward)
    return _conv_int8_same(y, kernel, bias, weight_scale, backward)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _conv_int8_same(y, kernel, bias, weight_scale, backward):
    return _int8_preactivation(y, kernel, bias, weight_scale)


def _conv_int8_same_fwd(y, kernel, bias, weight_scale, backward):
    z, yq, s_y, qp = _int8_preactivation_parts(y, kernel, bias, weight_scale)
    if backward == "ste":
        res = (y, kernel)
    elif backward == "dgrad":
        res = (y, kernel, qp.kernel_q, qp.scale[..., 0])
    else:  # 'wgrad'/'full': int8 residuals; a 0-d token carries the
        # kernel dtype.
        res = (yq, s_y, qp.kernel_q, qp.scale[..., 0],
               jnp.zeros((), kernel.dtype))
    return z, res


def _conv_int8_same_bwd(weight_scale, backward, res, g):
    from differential_equations_resnet_tpu.ops.conv import conv2d_same

    db = jnp.sum(g, axis=(0, 1, 2))
    if backward == "ste":
        y, kernel = res
        (dy,) = jax.linear_transpose(
            lambda yy: conv2d_same(yy, kernel), y
        )(g)
        (dk,) = jax.linear_transpose(
            lambda kk: conv2d_same(y, kk), kernel
        )(g)
        return dy, dk, db
    if backward == "dgrad":
        y, kernel, kq, k_scale = res
        dy, _, _ = _int8_dgrad(g, kq, k_scale, g.dtype)
        (dk,) = jax.linear_transpose(
            lambda kk: conv2d_same(y, kk), kernel
        )(g)
        return dy, dk, db
    yq, s_y, kq, k_scale, ktok = res
    dy, dk = _int8_res_backward(
        backward, yq, s_y, kq, k_scale, ktok, g, g.dtype
    )
    return dy, dk, db


_conv_int8_same.defvjp(_conv_int8_same_fwd, _conv_int8_same_bwd)


def conv_relu_field_int8(
    y: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    weight_scale: str = "per_tensor",
    backward: str = "ste",
):
    """One ODE field evaluation ``relu(int8conv(y, K) + b)`` — the int8-
    forward analogue of
    :func:`differential_equations_resnet_tpu.ops.conv.conv_relu_field`, for
    the multi-eval integrators (midpoint/rk4).  Bool-mask residual,
    per-tensor weight scales by default; ``backward`` as in
    :func:`euler_relu_step_int8` ('ste' fp backward / 'dgrad' int8 data
    gradient / 'wgrad' int8 weight gradient + noise-free data gradient /
    'full' int8 data+weight gradients with int8 residuals)."""
    _check_int8_args("conv_relu_field_int8", kernel, bias, weight_scale, backward)
    return _conv_relu_field_int8(y, kernel, bias, weight_scale, backward)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _conv_relu_field_int8(y, kernel, bias, weight_scale, backward):
    return jax.nn.relu(_int8_preactivation(y, kernel, bias, weight_scale))


def _conv_relu_field_int8_fwd(y, kernel, bias, weight_scale, backward):
    z, yq, s_y, qp = _int8_preactivation_parts(y, kernel, bias, weight_scale)
    return jax.nn.relu(z), _int8_residuals(backward, y, kernel, z, yq, s_y, qp)


def _conv_relu_field_int8_bwd(weight_scale, backward, res, g):
    if backward == "ste":
        from differential_equations_resnet_tpu.ops import conv as _conv

        return _conv._conv_relu_field_bwd(res, g)
    mask = res[4]
    g_z = jnp.where(mask, g, 0.0).astype(g.dtype)
    dy_conv, dk, db = _int8_linear_bwd(backward, res, g_z, g.dtype)
    return dy_conv, dk, db


_conv_relu_field_int8.defvjp(_conv_relu_field_int8_fwd, _conv_relu_field_int8_bwd)
