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

import warnings

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
    accum_steps: int = 1,
):
    """Build a jitted shard_map train step with explicit collectives:
    (state, images, labels, lr) -> (state, metrics, grad_norms).

    Numerically identical to `make_train_step(..., mesh=...)`: the objective
    is the SAME `build_loss_fn` (incl. the L2 kernel penalty), the local loss
    is the mean over the per-device batch shard, `pmean` over the axis makes
    the gradient the global-batch mean, and correct/count are `psum`ed so
    streaming accuracy matches the single-device run.

    ``accum_steps=k > 1``: gradient accumulation composed with the explicit
    collectives (VERDICT r3 item 4 — previously only the jit-sharded path
    took it).  Each device splits its LOCAL batch shard into k contiguous
    microbatches (the shard is already device-local, so the split is
    zero-resharding by construction — the device-major concern of the jit
    path's `split_microbatches` does not arise here), scans them
    sequentially accumulating gradients, and the pmean/psum collectives run
    ONCE per update on the averaged result — k times less ICI gradient
    traffic than k independent steps, and the same numerics as the
    monolithic global-batch step (mean of equal microbatch means).  A local
    shard not divisible by k falls back to the monolithic step for that
    trace with a warning (same contract as train_step._build_step_fn).

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
    if accum_steps < 1:
        raise ValueError(f"accum_steps must be >= 1, got {accum_steps}.")

    loss_fn = build_loss_fn(model, train=True)

    def local_grads(params, model_state, images, labels):
        (loss, (new_model_state, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, model_state, images, labels)
        predictions = jnp.argmax(logits, axis=-1)
        correct = jnp.sum(
            (predictions == _labels_argmax(labels)).astype(jnp.float32)
        )
        return grads, new_model_state, loss, correct

    def local_accumulate(params, model_state, images, labels):
        n = images.shape[0]
        if accum_steps == 1:
            return local_grads(params, model_state, images, labels)
        if n % accum_steps:
            warnings.warn(
                f"local batch shard of {n} is not divisible by accum_steps="
                f"{accum_steps}; training it monolithically (full-shard "
                "activation memory for this batch shape).",
                stacklevel=2,
            )
            return local_grads(params, model_state, images, labels)
        mb = n // accum_steps
        images_r = jnp.reshape(images, (accum_steps, mb) + images.shape[1:])
        labels_r = jnp.reshape(labels, (accum_steps, mb) + labels.shape[1:])

        def body(carry, xy):
            acc, model_state = carry
            x, y = xy
            grads, model_state, loss, correct = local_grads(
                params, model_state, x, y
            )
            acc = jax.tree.map(jnp.add, acc, grads)
            return (acc, model_state), (loss, correct)

        zeros = jax.tree.map(jnp.zeros_like, params)
        (acc, new_model_state), (losses, corrects) = jax.lax.scan(
            body, (zeros, model_state), (images_r, labels_r)
        )
        grads = jax.tree.map(lambda g: g / accum_steps, acc)
        return grads, new_model_state, jnp.mean(losses), jnp.sum(corrects)

    def per_shard(state: TrainState, images, labels, lr):
        grads, new_model_state, loss, correct = local_accumulate(
            state.params, state.model_state, images, labels
        )

        # Explicit DP reductions over ICI — once per UPDATE, on the
        # microbatch-averaged local result.
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

        correct = jax.lax.psum(correct, axis)
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
