"""Pipeline parallelism over DEPTH — the ODE-ResNet's scaling axis.

The reference is single-device (SURVEY.md section 2.3: no parallelism of any
kind); depth is this model family's "long context" (SURVEY.md section 5.7),
so the TPU-native framework treats splitting the L integrator steps across a
mesh axis as a first-class strategy, alongside data (batch) and tensor
(channel) parallelism.

Design (GPipe-style, collectives ride ICI):

- The stacked per-layer parameters (L, ...) are sharded along the layer axis
  over the ``pipe`` mesh axis: stage p holds layers [p*L/P, (p+1)*L/P).
- The batch is split into M microbatches.  Inside one `shard_map`, every
  device runs the same loop of P + M - 1 ticks; at tick t, stage p applies
  its layer slice to microbatch t - p (when 0 <= t - p < M) and passes the
  activation to stage p + 1 via `jax.lax.ppermute` — a neighbor hop on the
  ICI torus, never a global collective.
- Bubble fraction is (P - 1) / (M + P - 1); M >= P keeps it under 50%.
- Gradients need no bespoke backward schedule: `ppermute`'s transpose is the
  reverse permutation, so `jax.grad` of this forward IS the reverse pipeline
  (activations are rematerialized per-stage via `jax.checkpoint` on the
  stage body to bound memory).

The invalid tick positions (pipeline fill/drain) run the stage body on a
zero buffer and mask the result — the standard static-schedule trick that
keeps every tick identical for the compiler (no data-dependent control
flow under `jit`).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def pipeline_scan(
    stage_params: Any,
    x_micro: jax.Array,
    stage_fn: Callable[[Any, jax.Array], jax.Array],
    axis_name: str,
) -> jax.Array:
    """The per-device pipeline loop (call inside `shard_map`).

    stage_params: this stage's slice of the stacked layer params (leading
        axis L/P).
    x_micro: (M, mb, H, W, C) microbatches — identical on every device
        (replicated in); only stage 0 injects them.
    stage_fn: (stage_params, y) -> y, the stage body (e.g. an L/P-step
        integrator scan).
    Returns (M, mb, H, W, C): the pipeline output microbatches, valid on the
    LAST stage (callers either ppermute them home or read that shard).
    """
    p = jax.lax.axis_index(axis_name)
    n_stages = jax.lax.axis_size(axis_name)
    m = x_micro.shape[0]
    mb_shape = x_micro.shape[1:]
    n_ticks = m + n_stages - 1

    body = jax.checkpoint(stage_fn)
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def tick(carry, t):
        buf, outputs = carry
        # Stage 0 injects microbatch t (zeros once the feed is exhausted).
        feed_idx = jnp.clip(t, 0, m - 1)
        feed = jnp.where(t < m, x_micro[feed_idx], jnp.zeros(mb_shape, x_micro.dtype))
        buf = jnp.where(p == 0, feed, buf)
        # Every stage applies its slice; fill/drain ticks compute on zeros
        # and are masked below (static schedule — no per-tick cond).
        y = body(stage_params, buf)
        valid = (t - p >= 0) & (t - p < m)
        y = jnp.where(valid, y, jnp.zeros_like(y))
        # Last stage banks microbatch t - (P - 1).
        out_idx = jnp.clip(t - (n_stages - 1), 0, m - 1)
        is_out = (p == n_stages - 1) & (t - (n_stages - 1) >= 0)
        outputs = jax.lax.dynamic_update_index_in_dim(
            outputs,
            jnp.where(is_out, y, outputs[out_idx]),
            out_idx,
            axis=0,
        )
        # Hand the activation to the next stage (ring hop on ICI).
        buf = jax.lax.ppermute(y, axis_name, perm)
        return (buf, outputs), None

    buf0 = jnp.zeros(mb_shape, x_micro.dtype)
    outputs0 = jnp.zeros((m,) + mb_shape, x_micro.dtype)
    (buf, outputs), _ = jax.lax.scan(
        tick, (buf0, outputs0), jnp.arange(n_ticks)
    )
    return outputs


def pipeline_blocks_apply(
    kernels: jax.Array,
    biases: jax.Array,
    x: jax.Array,
    h: float,
    mesh: Mesh,
    axis_name: str = "pipe",
    num_microbatches: int | None = None,
    batch_spec: P = P(),
    tp_axis: str | None = None,
) -> jax.Array:
    """Apply an L-layer Euler identity-block stack pipelined over
    ``mesh[axis_name]``.

    kernels: (L, 3, 3, C, C) dense (already materialized / s2d-packed)
        kernels; sharded along L over the pipe axis.
    biases:  (L, C), sharded along L.
    x: (B, H, W, C) activations, replicated (or batch-sharded per
        ``batch_spec`` for the dp x pp composition).
    Returns (B, H, W, C), replicated (the last stage broadcasts its result).

    ``tp_axis`` composes channel tensor parallelism INSIDE each pipeline
    stage (tp x pp): kernels/biases are additionally sharded on c_out over
    ``mesh[tp_axis]``, each TP shard convolves the full activations into its
    own output-channel slice, and one `all_gather` per layer over the TP
    axis reconstructs the full activations for the residual add — the
    Megatron pattern, with the collective riding ICI inside each stage while
    `ppermute` hands activations between stages.  Gradients need nothing
    bespoke: `all_gather`'s transpose is `psum_scatter`.

    Semantics are identical to the single-device scan
    (`reference_euler_dense`); tested to fp32 tolerance in
    tests/test_pipeline.py.
    """
    n_stages = mesh.shape[axis_name]
    num_layers = kernels.shape[0]
    if num_layers % n_stages:
        raise ValueError(
            f"num_layers ({num_layers}) must divide evenly into "
            f"{n_stages} pipeline stages"
        )
    if tp_axis is not None:
        channels = kernels.shape[-1]
        if channels % mesh.shape[tp_axis]:
            raise ValueError(
                f"channels ({channels}) must divide evenly over the "
                f"{mesh.shape[tp_axis]}-way tensor-parallel axis {tp_axis!r}"
            )
    batch = x.shape[0]
    # With a sharded batch_spec (dp x pp), the pipeline sees the per-shard
    # batch; validate against the local size shard_map will hand us.
    for ax in batch_spec:
        if ax is not None:
            batch //= mesh.shape[ax]
    m = num_microbatches or n_stages
    if batch % m:
        raise ValueError(f"batch ({batch}) must divide into {m} microbatches")

    return _pipelined_fn(mesh, axis_name, m, float(h), batch_spec, tp_axis)(
        kernels, biases, x
    )


@functools.lru_cache(maxsize=64)
def _pipelined_fn(mesh: Mesh, axis_name: str, m: int, h: float,
                  batch_spec: P, tp_axis: str | None = None):
    """The compiled pipeline executable, cached on its static configuration.

    Without the cache, every EAGER call of `pipeline_blocks_apply` (i.e.
    `model.apply` outside an outer jit) would build a fresh shard_map closure
    and re-jit — a full retrace + recompile per call.  Under an outer jit the
    inner jit is inlined for free either way; the cache makes eager callers
    equally cheap after the first call."""
    from jax import shard_map

    from differential_equations_resnet_tpu.ops.conv import conv2d_same, euler_relu_step

    if tp_axis is None:
        def stage_fn(params, y):
            ks, bs = params

            def step(y, kb):
                k, b = kb
                return euler_relu_step(y, k, b, h), None

            y, _ = jax.lax.scan(step, y, (ks, bs))
            return y
    else:
        def stage_fn(params, y):
            ks, bs = params

            def step(y, kb):
                k, b = kb
                # Megatron conv-TP inside the stage: this shard produces its
                # c_out slice from the FULL activations, then the slices are
                # all-gathered (tiled on the channel axis) so the residual
                # add and the next layer see full channels.  Backward through
                # all_gather is psum_scatter — XLA handles it.
                z_local = jax.nn.relu(conv2d_same(y, k, bias=b))
                z = jax.lax.all_gather(z_local, tp_axis, axis=-1, tiled=True)
                return y + h * z, None

            y, _ = jax.lax.scan(step, y, (ks, bs))
            return y

    def pipelined(kernels, biases, x):
        x_micro = x.reshape((m, x.shape[0] // m) + x.shape[1:])
        outputs = pipeline_scan((kernels, biases), x_micro, stage_fn, axis_name)
        # Valid only on the last stage: broadcast it to every device so the
        # result is replicated (one ring of hops; cheap relative to compute).
        n_stages = jax.lax.axis_size(axis_name)
        p = jax.lax.axis_index(axis_name)
        outputs = jnp.where(p == n_stages - 1, outputs, jnp.zeros_like(outputs))
        outputs = jax.lax.psum(outputs, axis_name)
        return outputs.reshape(x.shape)

    if tp_axis is None:
        spec_kernels = spec_biases = P(axis_name)
    else:
        # Layers over the pipe axis AND c_out over the TP axis.
        spec_kernels = P(axis_name, None, None, None, tp_axis)
        spec_biases = P(axis_name, tp_axis)
    fn = shard_map(
        pipelined,
        mesh=mesh,
        in_specs=(spec_kernels, spec_biases, batch_spec),
        out_specs=batch_spec,
        check_vma=False,
    )
    # jit so the remat (closed_call) inside the shard_map body is supported
    # under eager differentiation too; under an outer jit this nests for free.
    return jax.jit(fn)
