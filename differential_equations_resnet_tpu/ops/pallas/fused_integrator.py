"""Fused multi-layer forward-Euler integrator — Pallas TPU kernel.

The XLA scan path round-trips the ODE state y (B, H, W, C) through HBM once
per layer: 2 * L * |y| of HBM traffic for the forward pass.  This kernel
keeps y resident in VMEM across all L integrator steps and performs each
layer's 3x3 conv as one im2col matmul on the MXU:

    patches (B_t*H*W, 9C) = 9 shifted views of zero-padded y
    z       = patches @ K_l.reshape(9C, C) + b_l
    y       = y + h * relu(z)

HBM traffic drops to |y| in + |y| out + the (tiny) stacked kernels
(L * 9C^2), independent of depth.  The contraction dimension is 9C (144 for
the headline C=16) rather than C, which is what keeps the MXU fed for small
channel counts (SURVEY.md section 7 "hard parts" (b)).

Dense kernels are materialized *outside* the kernel by the standard
packed->dense scatter (`materialize_3x3`) and pre-reshaped to (L, 9C, C), so
the packed-parameter VJP composes automatically: gradients w.r.t. the dense
kernels fold back onto (a, b, c, d, cross) through JAX's autodiff of the
scatter.

The custom VJP recomputes per-layer activations for the backward pass from
the saved *input* (standard remat trade: one extra forward, O(1) HBM in
depth), then computes, per layer, fully in VMEM:

    g_z  = h * relu'(z_l) * g_{l+1}
    dK_l = patches(y_l)^T @ g_z                    (one (9C, rows)@(rows, C))
    db_l = sum_rows(g_z)
    g_l  = g_{l+1} + patches(g_z) @ K_l^rot180,T   (conv-transpose)

Reference behavior being accelerated: the per-block
`y + h*relu(conv(y)+b)` residual step of `models/tfkeras_resnets.py:69-92`
with the antisymmetric kernel of
`layers/tfkeras_layer_Conv2DAntisymmetric3By3.py`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from differential_equations_resnet_tpu.ops.antisymmetric import (
    Antisym3x3Params,
    materialize_3x3,
)

# Batch tiling: per-program working set (padded state + im2col patches +
# double-buffered blocks) must fit VMEM.  v5e VMEM is far larger than the
# 16 MB default scoped limit, so the pallas_calls raise vmem_limit_bytes.
_FWD_TILE_ELEMS = 8 * 32 * 32 * 16
_FWD_VMEM_LIMIT = 64 * 2**20
_BWD_VMEM_LIMIT = 100 * 2**20
_BWD_SCRATCH_BUDGET = 48 * 2**20  # trajectory scratch (L, tile, H, W, C)


def _batch_tile(batch: int, height: int, width: int, channels: int) -> int:
    per_elem = height * width * channels
    tile = max(1, _FWD_TILE_ELEMS // per_elem)
    while batch % tile:
        tile -= 1
    return tile


def _bwd_tile(batch, height, width, channels, num_layers):
    """The backward kernel's batch tile: start from the forward tile, then
    halve until the trajectory scratch (L, tile, H, W, C) fits its VMEM
    budget.  Mosaic pads the minor dimension to the 128-lane width, so the
    budget uses padded C.  Shared by the backward pallas_call and the
    eligibility gate so the gate reasons about the tile that will actually
    be compiled."""
    padded_c = max(channels, 128)
    tile = _batch_tile(batch, height, width, channels)
    while (
        tile > 1
        and (num_layers + 6) * tile * height * width * padded_c * 4
        > _BWD_SCRATCH_BUDGET
    ):
        tile //= 2
    while batch % tile:
        tile -= 1
    return tile


# Round-3 measured defect (docs/RESULTS.md section 6 "Pallas fused
# integrator at wide channels" re-check): the backward pallas_call stops
# compiling past grid=64 — B=128 at the C=64 tile-1 working set crashes the
# backend's compile helper, while B<=64 compiles and matches XLA gradients.
# Past this grid the custom VJP's backward falls back to XLA's gradient of
# the same math (review r5: the crash is backward-only, so declining the
# shape wholesale also cost the perfectly-working Pallas FORWARD for
# large-batch inference).
_MAX_BWD_GRID = 64


def fused_euler_eligible(x: jax.Array, blocks) -> bool:
    """Whether the fused Pallas path supports this (shape, dtype) combo."""
    if x.ndim != 4:
        return False
    if x.dtype not in (jnp.float32, jnp.dtype("float32")):
        return False
    if not isinstance(blocks, Antisym3x3Params):
        return False
    if blocks.bias is None:
        return False
    channels = x.shape[-1]
    if channels > 128:
        return False
    # The kernel keeps the whole padded spatial state in VMEM with the minor
    # dim padded to 128 lanes by Mosaic: (H+2)(W+2)*128 lanes * 4 B of state
    # plus the (rows, 9C) im2col buffer.  Decline anything past CIFAR-scale
    # spatial extents (64x64) rather than letting Mosaic fail on scoped-VMEM
    # allocation at e.g. 224x224 (a ~26 MB state tile).
    if x.shape[1] * x.shape[2] > 64 * 64:
        return False
    # No backward-grid check here: shapes whose BACKWARD grid exceeds
    # _MAX_BWD_GRID keep the Pallas forward and take the XLA-gradient
    # fallback in `_bwd` (the round-3 compile crash is backward-only).
    return True


def _im2col(pad_ref, b_t, height, width, channels):
    """(rows, 9C) im2col patches from the zero-padded state, tap-major then
    channel — matching K.reshape(9C, C)'s (dh, dw, c_in) flattening."""
    rows = b_t * height * width
    taps = []
    for dh in range(3):
        for dw in range(3):
            taps.append(
                pad_ref[:, dh : dh + height, dw : dw + width, :].reshape(
                    rows, channels
                )
            )
    return jnp.concatenate(taps, axis=-1)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _euler_fwd_kernel(x_ref, kernels_ref, bias_ref, out_ref, ypad_ref, *, h, num_layers, matmul_dtype):
    b_t, height, width, channels = x_ref.shape

    ypad_ref[...] = jnp.zeros_like(ypad_ref)

    def layer(l, y):
        # Zero-padded state (boundary stays zero; interior rewritten).
        ypad_ref[:, 1 : height + 1, 1 : width + 1, :] = y
        patches = _im2col(ypad_ref, b_t, height, width, channels)
        z = (
            jnp.dot(
                patches.astype(matmul_dtype),
                kernels_ref[l].astype(matmul_dtype),
                preferred_element_type=jnp.float32,
            )
            + bias_ref[pl.ds(l, 1), :]
        )
        return y + h * jnp.maximum(z, 0.0).reshape(b_t, height, width, channels)

    out_ref[...] = jax.lax.fori_loop(0, num_layers, layer, x_ref[...])


def _fused_euler_dense_fwd_impl(x, kernels, biases, h, matmul_dtype):
    batch, height, width, channels = x.shape
    num_layers = kernels.shape[0]
    tile = _batch_tile(batch, height, width, channels)
    grid = (batch // tile,)
    kernels_2d = kernels.reshape(num_layers, 9 * channels, channels)
    return pl.pallas_call(
        functools.partial(_euler_fwd_kernel, h=h, num_layers=num_layers,
                          matmul_dtype=matmul_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tile, height, width, channels),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (num_layers, 9 * channels, channels),
                lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (num_layers, channels), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile, height, width, channels),
            lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile, height + 2, width + 2, channels), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_FWD_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=2 * num_layers * batch * height * width * 9 * channels * channels,
            bytes_accessed=2 * x.size * 4 + kernels.size * 4,
            transcendentals=0,
        ),
    )(x, kernels_2d, biases)


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _euler_bwd_kernel(
    x_ref, kernels_ref, kernels_t_ref, bias_ref, g_ref,
    gx_ref, gk_ref, gb_ref,
    ypad_ref, gpad_ref, traj_ref,
    *, h, num_layers, matmul_dtype,
):
    """Recompute the forward trajectory for this batch tile (VMEM scratch),
    then walk layers in reverse accumulating dK, db, and the state
    cotangent."""
    b_t, height, width, channels = x_ref.shape
    rows = b_t * height * width

    ypad_ref[...] = jnp.zeros_like(ypad_ref)
    gpad_ref[...] = jnp.zeros_like(gpad_ref)

    # Forward recompute, stashing every pre-step state y_l.
    def fwd(l, y):
        traj_ref[l] = y
        ypad_ref[:, 1 : height + 1, 1 : width + 1, :] = y
        patches = _im2col(ypad_ref, b_t, height, width, channels)
        z = (
            jnp.dot(
                patches.astype(matmul_dtype),
                kernels_ref[l].astype(matmul_dtype),
                preferred_element_type=jnp.float32,
            )
            + bias_ref[pl.ds(l, 1), :]
        )
        return y + h * jnp.maximum(z, 0.0).reshape(b_t, height, width, channels)

    jax.lax.fori_loop(0, num_layers, fwd, x_ref[...])

    # Reverse sweep.
    def bwd(i, g):
        l = num_layers - 1 - i
        ypad_ref[:, 1 : height + 1, 1 : width + 1, :] = traj_ref[l]
        patches = _im2col(ypad_ref, b_t, height, width, channels)
        z = (
            jnp.dot(
                patches.astype(matmul_dtype),
                kernels_ref[l].astype(matmul_dtype),
                preferred_element_type=jnp.float32,
            )
            + bias_ref[pl.ds(l, 1), :]
        )
        # g_z = h * relu'(z) * g   (rows, C)
        g_rows = g.reshape(rows, channels)
        g_z = jnp.where(z > 0.0, h * g_rows, 0.0)

        # Parameter grads: dK = patches^T @ g_z -> (9C, C); db = sum(g_z).
        gk_ref[0, l] = jax.lax.dot_general(
            patches, g_z,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        gb_ref[0, pl.ds(l, 1), :] = jnp.sum(g_z, axis=0, keepdims=True)

        # State cotangent: g += conv_transpose(g_z, K_l), i.e. the conv of
        # g_z against K rot180'd spatially and transposed in channels —
        # pre-arranged outside the kernel as kernels_t (L, 9C, C).
        gpad_ref[:, 1 : height + 1, 1 : width + 1, :] = g_z.reshape(
            b_t, height, width, channels
        )
        gpatches = _im2col(gpad_ref, b_t, height, width, channels)
        acc = jnp.dot(
            gpatches.astype(matmul_dtype),
            kernels_t_ref[l].astype(matmul_dtype),
            preferred_element_type=jnp.float32,
        )
        return g + acc.reshape(b_t, height, width, channels)

    gx_ref[...] = jax.lax.fori_loop(0, num_layers, bwd, g_ref[...])


def _fused_euler_dense_bwd_impl(x, kernels, biases, g, h, matmul_dtype):
    batch, height, width, channels = x.shape
    num_layers = kernels.shape[0]
    # The trajectory scratch (L, tile, H, W, C) dominates VMEM; _bwd_tile
    # halves the forward tile until it fits (shared with the eligibility
    # gate, which declines grids past _MAX_BWD_GRID — the measured compile
    # crash boundary).
    tile = _bwd_tile(batch, height, width, channels, num_layers)
    grid = (batch // tile,)

    kernels_2d = kernels.reshape(num_layers, 9 * channels, channels)
    # Conv-transpose kernel: rot180 in (dh, dw), swap (c_in, c_out).
    kernels_t = (
        kernels[:, ::-1, ::-1].transpose(0, 1, 2, 4, 3).reshape(
            num_layers, 9 * channels, channels
        )
    )

    state_spec = pl.BlockSpec(
        (tile, height, width, channels), lambda i: (i, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    kernel_spec = pl.BlockSpec(
        (num_layers, 9 * channels, channels), lambda i: (0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    bias_spec = pl.BlockSpec(
        (num_layers, channels), lambda i: (0, 0), memory_space=pltpu.VMEM
    )

    gx, gk_partial, gb_partial = pl.pallas_call(
        functools.partial(_euler_bwd_kernel, h=h, num_layers=num_layers,
                          matmul_dtype=matmul_dtype),
        grid=grid,
        in_specs=[state_spec, kernel_spec, kernel_spec, bias_spec, state_spec],
        out_specs=(
            state_spec,
            # Per-tile partial parameter grads, summed outside.
            pl.BlockSpec(
                (1, num_layers, 9 * channels, channels),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, num_layers, channels), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, jnp.float32),
            jax.ShapeDtypeStruct(
                (batch // tile, num_layers, 9 * channels, channels), jnp.float32
            ),
            jax.ShapeDtypeStruct((batch // tile, num_layers, channels), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile, height + 2, width + 2, channels), jnp.float32),
            pltpu.VMEM((tile, height + 2, width + 2, channels), jnp.float32),
            pltpu.VMEM((num_layers, tile, height, width, channels), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_BWD_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=6 * num_layers * batch * height * width * 9 * channels * channels,
            bytes_accessed=3 * x.size * 4 + 2 * kernels.size * 4,
            transcendentals=0,
        ),
    )(x, kernels_2d, kernels_t, biases, g)
    gk = jnp.sum(gk_partial, axis=0).reshape(num_layers, 3, 3, channels, channels)
    return gx, gk, jnp.sum(gb_partial, axis=0)


# ---------------------------------------------------------------------------
# custom_vjp wiring
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_euler_dense(x, kernels, biases, h, matmul_dtype=jnp.float32):
    """y_L from L fused Euler steps with dense (L, 3, 3, C, C) kernels.

    ``matmul_dtype=jnp.bfloat16`` runs the im2col matmuls at the MXU's native
    bf16 rate (fp32 accumulation; the state y stays fp32 throughout)."""
    return _fused_euler_dense_fwd_impl(x, kernels, biases, h, matmul_dtype)


def _fwd(x, kernels, biases, h, matmul_dtype):
    y = _fused_euler_dense_fwd_impl(x, kernels, biases, h, matmul_dtype)
    return y, (x, kernels, biases)


def _bwd(h, matmul_dtype, residuals, g):
    x, kernels, biases = residuals
    batch, height, width, channels = x.shape
    tile = _bwd_tile(batch, height, width, channels, kernels.shape[0])
    if batch // tile > _MAX_BWD_GRID:
        # The backward pallas_call's measured compile crash past grid=64:
        # compute the gradient of the SAME math via XLA instead (exact
        # mathematical adjoint; bit-level may differ from the in-kernel
        # recompute, as any remat does), keeping the Pallas forward.
        _, vjp = jax.vjp(
            lambda a, k, b: reference_euler_dense(a, k, b, h),
            x, kernels, biases,
        )
        return vjp(g)
    gx, gk, gb = _fused_euler_dense_bwd_impl(x, kernels, biases, g, h, matmul_dtype)
    return gx, gk, gb


fused_euler_dense.defvjp(_fwd, _bwd)


def fused_euler_3x3(
    x: jax.Array, blocks: Antisym3x3Params, h: float, gamma: float,
    matmul_dtype=jnp.float32,
) -> jax.Array:
    """Fused L-layer Euler integration with packed antisymmetric parameters.

    Dense kernels are materialized by the (differentiable) packed->dense
    scatter, so the backward pass folds the dense kernel cotangent back onto
    the packed free parameters automatically."""
    kernels = jax.vmap(lambda p: materialize_3x3(p, gamma=gamma))(blocks)
    return fused_euler_dense(x, kernels, blocks.bias, float(h), matmul_dtype)


def reference_euler_dense(x, kernels, biases, h):
    """XLA scan reference implementation (for parity tests and benchmarks)."""
    from differential_equations_resnet_tpu.ops.conv import conv2d_same

    def body(y, inputs):
        kernel, bias = inputs
        return y + h * jax.nn.relu(conv2d_same(y, kernel, bias=bias)), None

    y, _ = jax.lax.scan(body, x, (kernels, biases))
    return y
