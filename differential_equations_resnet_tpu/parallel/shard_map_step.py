"""Explicit-collective data-parallel train step via `jax.shard_map`.

The default DP path (`train_step.make_train_step` with a mesh) expresses
sharding declaratively through jit in/out shardings and lets XLA insert the
gradient all-reduce.  This module is the explicit SPMD formulation of the
same computation: each device runs the per-shard step on its local batch
slice and the gradient/metric reductions are written as `lax.pmean`/`lax.psum`
over the named mesh axis (the collective rides ICI within a slice).

Use cases: composing with manually-placed collectives (e.g. a Pallas step
kernel that wants the psum inside its own schedule — SURVEY.md section 2.2
item 3), and pinning the reduction structure independent of XLA's sharding
propagation.

The reference framework has no distributed backend of any kind
(reference `training/training.py:132,540-544` is single-GPU; SURVEY.md
section 2.3) — this component is new, TPU-native by construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from differential_equations_resnet_tpu.train.telemetry import gradient_mean_norms
from differential_equations_resnet_tpu.train.train_step import (
    TrainState,
    build_loss_fn,
    _labels_argmax,
    _set_lr,
)


def make_shard_map_train_step(
    model,
    tx,
    mesh: Mesh,
    axis: str = "data",
    with_gradient_metrics: bool = True,
    donate: bool = True,
):
    """Build a jitted shard_map train step with explicit collectives:
    (state, images, labels, lr) -> (state, metrics, grad_norms).

    Numerically identical to `make_train_step(..., mesh=...)`: the objective
    is the SAME `build_loss_fn` (incl. the L2 kernel penalty), the local loss
    is the mean over the per-device batch shard, `pmean` over the axis makes
    the gradient the global-batch mean, and correct/count are `psum`ed so
    streaming accuracy matches the single-device run.

    BatchNorm models are rejected: per-shard batch statistics pmean'd after
    the fact are NOT the global-batch statistics the jit-sharded path
    computes (mean of per-shard variances underestimates the global
    variance) — use `make_train_step(mesh=...)` for BN models.
    """
    config = model.config
    if getattr(config, "use_batch_norm", False):
        raise ValueError(
            "make_shard_map_train_step does not support BatchNorm models "
            "(per-shard batch statistics != global-batch statistics); use "
            "make_train_step(mesh=...) instead."
        )

    loss_fn = build_loss_fn(model, train=True)

    def per_shard(state: TrainState, images, labels, lr):
        (loss, (new_model_state, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.model_state, images, labels)

        # Explicit DP reductions over ICI.
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        new_model_state = jax.lax.pmean(new_model_state, axis)

        grad_norms = (
            gradient_mean_norms(grads, config)
            if with_gradient_metrics
            else jnp.zeros((0,), jnp.float32)
        )

        opt_state = _set_lr(state.opt_state, lr)
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        predictions = jnp.argmax(logits, axis=-1)
        correct = jax.lax.psum(
            jnp.sum((predictions == _labels_argmax(labels)).astype(jnp.float32)),
            axis,
        )
        count = jax.lax.psum(
            jnp.asarray(images.shape[0], jnp.float32), axis
        )
        metrics = {"loss": loss, "correct": correct, "count": count}
        new_state = TrainState(
            step=state.step + 1,
            params=params,
            model_state=new_model_state,
            opt_state=opt_state,
        )
        return new_state, metrics, grad_norms

    sharded = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())
