"""The functional training core: TrainState + jitted train/eval steps.

Replaces the reference's per-step `sess.run(fetches, feed_dict=...)` loop
(`training/training.py:578-597`) with a single donated-buffer jitted step:
forward + categorical cross-entropy (computed from logits for numerical
stability — same math as the reference's softmax CE at
`training/training.py:295`), backward, Adam update, batch metrics, and the
per-layer gradient mean norms, all in one XLA executable.

Data parallelism: pass a `Mesh` — the batch is sharded over the 'data' axis,
parameters/optimizer state are replicated, and XLA inserts the gradient psum
over ICI (the scaling-book recipe; the reference is single-device only).

Every `make_*` builder is memoized on its (hashable, identity-keyed)
arguments: asking twice for the step of the SAME model/tx/mesh returns the
same jitted callable, so the XLA executable compiles once per configuration
per process instead of once per `Training` instance.  Jitted functions are
stateless, and donation is a per-call property of the wrapper, so sharing is
semantically invisible; distinct model or optimizer OBJECTS still get
distinct entries (the cache never conflates by value).
"""

from __future__ import annotations

import functools
import warnings
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from differential_equations_resnet_tpu.train.telemetry import gradient_mean_norms


class TrainState(NamedTuple):
    step: jax.Array          # () int32 global step
    params: Any
    model_state: Any         # BatchNorm running stats ({} when unused)
    opt_state: Any


@functools.lru_cache(maxsize=64)
def make_adam(learning_rate: float = 1e-3, epsilon: float = 1e-7):
    """Adam with the reference's hyperparameters (v7 notebook cell 5:
    tf.train.AdamOptimizer(lr, epsilon=1e-07)), with the learning rate
    injected so the schedule can change it every step without recompiling.

    Memoized by hyperparameters: optax transforms are pure (init/update
    functions; all state lives in the caller's opt_state), so equal
    hyperparameters share one transform object — which in turn lets the
    memoized step builders share compiled executables across `Training`
    instances of the same configuration."""
    return optax.inject_hyperparams(optax.adam)(
        learning_rate=learning_rate, eps=epsilon
    )


def create_train_state(model, key: jax.Array, tx: Optional[Any] = None) -> TrainState:
    params, model_state = model.init(key)
    tx = tx if tx is not None else make_adam()
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        model_state=model_state,
        opt_state=tx.init(params),
    )


def per_example_cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """(N,) categorical cross-entropy.  Accepts integer labels (N,) or
    one-hot/soft labels (N, num_classes)."""
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    if labels.ndim == logits.ndim:
        return -jnp.sum(labels.astype(jnp.float32) * log_probs, axis=-1)
    return -jnp.take_along_axis(
        log_probs, labels[:, None].astype(jnp.int32), axis=-1
    )[:, 0]


def cross_entropy_from_logits(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean categorical cross-entropy over the batch."""
    return jnp.mean(per_example_cross_entropy(logits, labels))


def _labels_argmax(labels: jax.Array) -> jax.Array:
    return jnp.argmax(labels, axis=-1) if labels.ndim > 1 else labels


def _set_lr(opt_state, lr):
    return opt_state._replace(
        hyperparams={**opt_state.hyperparams, "learning_rate": lr}
    )


def _bind_mesh(model, mesh: Optional[Mesh]):
    """Derive layout-gate context from the mesh: when the batch is sharded
    over a 'data' axis, the model's layout gates (`_s2d_eligible`) must see
    PER-DEVICE row counts even though the traced batch carries the global
    shape — and they must judge the platform of the mesh's DEVICES, not the
    process-global default backend (a CPU submesh on a TPU-default host, or
    vice versa, would otherwise pick the wrong layout).  Models expose
    `with_mesh_context` for this; every step builder routes through here so
    mesh users get the right layout automatically (no manual knob).  An
    explicitly-set `config.device_platform` survives the binding."""
    if mesh is None:
        return model
    binder = getattr(model, "with_mesh_context", None)
    if binder is None:
        return model
    return binder(
        data_axis_size=int(mesh.shape.get("data", 1)),
        device_platform=mesh.devices.flat[0].platform,
    )


def build_loss_fn(model, train: bool = True):
    """The shared training objective:
    (params, model_state, images, labels) -> (loss, (new_model_state, logits)).

    With ``config.l2_regularization > 0`` the loss adds the Keras-style L2
    kernel penalty (the reference declares `kernel_regularizer=l2(...)` on
    every kernel but its trainer left adding it to the loss as a TODO —
    reference training/training.py:292-297; here it is actually applied).
    Every train-step builder (jit-sharded, shard_map, multi-step) must go
    through this single definition so the objective cannot diverge."""
    l2_weight = float(getattr(model.config, "l2_regularization", 0.0) or 0.0)

    def loss_fn(params, model_state, images, labels):
        logits, new_model_state = model.apply(
            params, model_state, images, train=train, return_logits=True
        )
        loss = cross_entropy_from_logits(logits, labels)
        if l2_weight:
            from differential_equations_resnet_tpu.models.blocks import (
                l2_kernel_penalty,
            )

            loss = loss + l2_kernel_penalty(params, l2_weight)
        return loss, (new_model_state, logits)

    return loss_fn


def _build_step_fn(
    model,
    tx,
    with_gradient_metrics: bool = True,
    accum_steps: int = 1,
    mesh: Optional[Mesh] = None,
):
    """The raw (unjitted) train step:
    (state, images, labels, lr) -> (state, metrics, grad_norms).

    ``accum_steps=k > 1`` runs GRADIENT ACCUMULATION: the batch is split
    into k equal microbatches scanned sequentially, gradients are averaged,
    and the optimizer applies ONE update — numerically the monolithic step
    on the full batch (mean-of-equal-microbatch-means == full-batch mean,
    for both the loss and its gradient; L2 penalty gradients average back
    to a single application), but with peak activation memory of one
    microbatch.  This is how effective batches beyond HBM capacity train
    (the reference is single-GPU, batch-32-bound; here an effective batch
    is bounded by dataset size, not memory).  Telemetry semantics are
    unchanged: one metrics row and one grad-norms row per UPDATE.

    The monolithic-equivalence contract holds for BN-free models (the
    reference's published configs).  With ``use_batch_norm=True`` each
    microbatch is normalized by its OWN batch statistics (and running
    stats update sequentially through the microbatches — the standard
    accumulation semantics), so the update approximates, not reproduces,
    the monolithic step.

    A traced batch whose size is not divisible by ``accum_steps`` (e.g. a
    ragged epoch-tail batch from a dataset without drop_remainder) falls
    back to the monolithic step for that trace: equal microbatches are
    required for exact equivalence, and a ragged tail is smaller than the
    regular batch, so its monolithic activations fit by construction.

    ``mesh`` pins each microbatch onto the 'data' axis (without the
    constraint GSPMD may keep the reshaped microbatch replicated and
    compute it redundantly on every device) and selects a device-major
    microbatch split so each device scans its OWN k local chunks —
    microbatch membership is irrelevant to the averaged update, and the
    contiguous split would force an all-to-all of the whole batch every
    step."""
    config = model.config
    loss_fn = build_loss_fn(model, train=True)
    if accum_steps < 1:
        raise ValueError(f"accum_steps must be >= 1, got {accum_steps}.")

    def grads_and_metrics(params, model_state, images, labels):
        (loss, (new_model_state, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, model_state, images, labels)
        predictions = jnp.argmax(logits, axis=-1)
        correct = jnp.sum(
            (predictions == _labels_argmax(labels)).astype(jnp.float32)
        )
        return grads, new_model_state, loss, correct

    def split_microbatches(a, mb):
        if mesh is not None:
            d = dict(mesh.shape).get("data", 1)
            if d > 1 and mb % d:
                warnings.warn(
                    f"accum_steps={accum_steps}: microbatch size {mb} does "
                    f"not divide the mesh's data axis ({d}), so the "
                    "contiguous split is used and GSPMD reshards the batch "
                    "every microbatch — pick accum_steps so batch/"
                    "accum_steps is a multiple of the data-axis size for "
                    "the zero-resharding device-major split.",
                    stacklevel=2,
                )
            if d > 1 and mb % d == 0:
                # Device-major split: microbatch i = the i-th local chunk of
                # every device's contiguous row-block shard, so microbatches
                # stay block-sharded over 'data' with zero resharding
                # traffic (the contiguous split below would make device d's
                # share of microbatch i live on another device for k > 1).
                a = jnp.reshape(a, (d, accum_steps, mb // d) + a.shape[1:])
                a = jnp.moveaxis(a, 1, 0)
                return jnp.reshape(a, (accum_steps, mb) + a.shape[3:])
        return jnp.reshape(a, (accum_steps, mb) + a.shape[1:])

    def accumulate(params, model_state, images, labels):
        n = images.shape[0]
        if n % accum_steps:
            # Ragged epoch-tail batch (dataset without drop_remainder):
            # equal microbatches are impossible, and the tail is smaller
            # than the regular batch, so run it monolithically — identical
            # numerics, bounded by the regular step's activation memory.
            # The warning distinguishes this from a misconfigured
            # accum_steps that silently disables the memory savings on
            # EVERY batch (Training validates batch_size % accum_steps up
            # front; direct step-builder users see this once per trace).
            warnings.warn(
                f"batch of {n} is not divisible by accum_steps="
                f"{accum_steps}; training it monolithically (full-batch "
                "activation memory for this batch shape).",
                stacklevel=2,
            )
            return grads_and_metrics(params, model_state, images, labels)
        mb = n // accum_steps
        images_r = split_microbatches(images, mb)
        labels_r = split_microbatches(labels, mb)

        def body(carry, xy):
            acc, model_state = carry
            x, y = xy
            if mesh is not None:
                x = jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, P("data"))
                )
                y = jax.lax.with_sharding_constraint(
                    y, NamedSharding(mesh, P("data"))
                )
            grads, model_state, loss, correct = grads_and_metrics(
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

    def step_fn(state: TrainState, images, labels, lr):
        fwd_bwd = grads_and_metrics if accum_steps == 1 else accumulate
        grads, new_model_state, loss, correct = fwd_bwd(
            state.params, state.model_state, images, labels
        )

        grad_norms = (
            gradient_mean_norms(grads, config)
            if with_gradient_metrics
            else jnp.zeros((0,), jnp.float32)
        )

        opt_state = _set_lr(state.opt_state, lr)
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        metrics = {
            "loss": loss,
            "correct": correct,
            "count": jnp.asarray(images.shape[0], jnp.float32),
        }
        new_state = TrainState(
            step=state.step + 1,
            params=params,
            model_state=new_model_state,
            opt_state=opt_state,
        )
        return new_state, metrics, grad_norms

    return step_fn


@functools.lru_cache(maxsize=64)
def make_train_step(
    model,
    tx,
    mesh: Optional[Mesh] = None,
    with_gradient_metrics: bool = True,
    donate: bool = True,
    accum_steps: int = 1,
):
    """Build the jitted train step:
    (state, images, labels, lr) -> (state, metrics, grad_norms).

    metrics = {'loss', 'correct', 'count'} (device scalars for the streaming
    accumulators); grad_norms = (1 + num_layers,) per SURVEY.md section 5.5.
    ``accum_steps=k``: split the batch into k sequential microbatches and
    apply ONE averaged update at one-microbatch activation memory — the
    monolithic step's numerics for BN-free models; see `_build_step_fn`
    for the batch-norm scoping and the ragged-batch monolithic fallback.
    """
    model = _bind_mesh(model, mesh)
    step_fn = _build_step_fn(
        model, tx, with_gradient_metrics, accum_steps=accum_steps, mesh=mesh
    )
    donate_argnums = (0,) if donate else ()
    if mesh is None:
        return jax.jit(step_fn, donate_argnums=donate_argnums)
    replicated = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step_fn,
        in_shardings=(replicated, data, data, None),
        out_shardings=(replicated, replicated, replicated),
        donate_argnums=donate_argnums,
    )


@functools.lru_cache(maxsize=64)
def make_multi_step(
    model,
    tx,
    mesh: Optional[Mesh] = None,
    with_gradient_metrics: bool = True,
    donate: bool = True,
    unroll: int = 1,
    accum_steps: int = 1,
):
    """Build a jitted K-step trainer: one `lax.scan` over K pre-staged batches,

        (state, images (K,B,H,W,C), labels (K,B), lrs (K,))
            -> (state, metrics {each (K,)}, grad_norms (K, 1+L)),

    i.e. K full train steps in ONE XLA executable with per-step telemetry
    stacked on device.  This is the remote-backend fast path: a single
    dispatch and a single device->host fetch per K steps, where the
    per-step-dispatch loop pays a tunnel round trip each iteration.  It is
    also the honest way to *measure* throughput on asynchronous backends:
    fetching an element of the returned metrics proves all K steps ran.

    K is baked into the compiled executable (static shape); reuse the same K
    across calls to avoid recompiles.  ``accum_steps``: each of the K
    per-dispatch batches is itself microbatched (see `_build_step_fn`).
    """
    model = _bind_mesh(model, mesh)
    step_fn = _build_step_fn(
        model, tx, with_gradient_metrics, accum_steps=accum_steps, mesh=mesh
    )

    def multi_fn(state: TrainState, images, labels, lrs):
        def body(carry, xs):
            x, y, lr = xs
            new_state, metrics, grad_norms = step_fn(carry, x, y, lr)
            return new_state, (metrics, grad_norms)

        state, (metrics, grad_norms) = jax.lax.scan(
            body, state, (images, labels, lrs), unroll=unroll
        )
        return state, metrics, grad_norms

    donate_argnums = (0,) if donate else ()
    if mesh is None:
        return jax.jit(multi_fn, donate_argnums=donate_argnums)
    replicated = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(None, "data"))  # (K, B, ...): shard batch dim
    return jax.jit(
        multi_fn,
        in_shardings=(replicated, data, data, replicated),
        out_shardings=(replicated, replicated, replicated),
        donate_argnums=donate_argnums,
    )


@functools.lru_cache(maxsize=64)
def make_device_epoch(
    model,
    tx,
    batch_size: int,
    mesh: Optional[Mesh] = None,
    with_gradient_metrics: bool = True,
    augment=None,
    donate: bool = True,
    accum_steps: int = 1,
):
    """Build a jitted DEVICE-RESIDENT epoch trainer:

        (state, features (N,H,W,C), labels (N,), key, lrs (steps,))
            -> (state, metrics {each (steps,)}, grad_norms (steps, 1+L))

    The ENTIRE epoch is one XLA program: the per-epoch permutation, every
    batch gather, optional in-jit augmentation (`data/jit_augment.py`), all
    train steps, and the stacked telemetry — zero host involvement between
    the dispatch and the single end-of-epoch fetch.  This is the terminal
    point of the host-staging ladder (per-step dispatch -> K-step scan with
    staged chunks -> whole-epoch device residency): CIFAR-10 is 150 MB as
    uint8 against 16 GB of HBM, so the dataset simply lives on device and
    the host's role per epoch is one dispatch.

    `features` may be uint8 (recommended — 4× less HBM) and is cast per
    batch inside the scan.  `augment` is `apply(key, images_f32_0_255)`;
    each step draws an independent key.  `steps = len(lrs)` must satisfy
    `steps * batch_size <= N` (the permutation is drawn without
    replacement).  The RNG `key` drives both the shuffle and augmentation —
    pass a per-epoch fold of the data seed for reproducible streams.
    ``accum_steps``: each gathered `batch_size` batch is microbatched
    inside the step (see `_build_step_fn`) — `batch_size` stays the
    EFFECTIVE batch, so the without-replacement accounting is unchanged.
    """
    if batch_size % accum_steps:
        # Every gathered batch here is exactly batch_size (dynamic_slice of
        # the permutation) — a non-dividing accum_steps can never be a
        # ragged tail, only a misconfiguration that would silently disable
        # the memory savings on every step.  batch_size is static at build
        # time, so fail loudly now.
        raise ValueError(
            f"accum_steps ({accum_steps}) must divide batch_size "
            f"({batch_size}): the device-resident epoch gathers exact "
            "batch_size batches, so a non-dividing accum_steps would fall "
            "back to the monolithic step on every batch."
        )
    model = _bind_mesh(model, mesh)
    step_fn = _build_step_fn(
        model, tx, with_gradient_metrics, accum_steps=accum_steps, mesh=mesh
    )

    def epoch_fn(state: TrainState, features, labels, key, lrs):
        steps = lrs.shape[0]
        n = features.shape[0]
        if steps * batch_size > n:
            # Shapes are static at trace time, so every caller (Training,
            # bench.py, __graft_entry__) gets this check for free.  Without
            # it, dynamic_slice_in_dim would clamp out-of-range starts and
            # silently train on repeated overlapping batches.
            raise ValueError(
                f"Device-resident epochs draw batches without replacement: "
                f"steps * batch_size ({steps} * {batch_size}) exceeds the "
                f"{n} examples in the device-resident dataset."
            )
        perm_key, aug_key = jax.random.split(key)
        perm = jax.random.permutation(perm_key, n)
        aug_keys = jax.random.split(aug_key, steps)

        def body(carry, xs):
            i, lr, ak = xs
            idx = jax.lax.dynamic_slice_in_dim(perm, i * batch_size, batch_size)
            x = features[idx].astype(jnp.float32)
            y = labels[idx]
            if mesh is not None:
                # Shard the gathered batch over the data axis: with every
                # operand replicated, GSPMD would otherwise keep the whole
                # step replicated too (each device redundantly computing the
                # full batch) — this constraint is what makes the mesh mode
                # data-parallel, with XLA inserting the gradient psum.
                batch_sharding = NamedSharding(mesh, P("data"))
                x = jax.lax.with_sharding_constraint(x, batch_sharding)
                y = jax.lax.with_sharding_constraint(
                    y, NamedSharding(mesh, P("data"))
                )
            if augment is not None:
                x = augment(ak, x)
            new_state, metrics, grad_norms = step_fn(carry, x, y, lr)
            return new_state, (metrics, grad_norms)

        state, (metrics, grad_norms) = jax.lax.scan(
            body, state, (jnp.arange(steps), lrs, aug_keys)
        )
        return state, metrics, grad_norms

    donate_argnums = (0,) if donate else ()
    if mesh is None:
        return jax.jit(epoch_fn, donate_argnums=donate_argnums)
    # DP over the mesh: the dataset stays replicated (the gather indices are
    # data-dependent, so sharding N would force cross-device gathers); the
    # per-step batch is explicitly constrained onto the data axis in `body`.
    replicated = NamedSharding(mesh, P())
    return jax.jit(
        epoch_fn,
        in_shardings=(replicated, replicated, replicated, replicated, replicated),
        out_shardings=(replicated, replicated, replicated),
        donate_argnums=donate_argnums,
    )


def _make_eval_fn(model):
    # Evaluation reports PURE cross-entropy, never the L2 kernel penalty:
    # the reference's eval metric is plain CE (its trainer never added the
    # regularizer to any loss, training/training.py:292-297), and mixing the
    # penalty in would shift eval CSVs and the monitor='loss' best-checkpoint
    # gating whenever l2_regularization > 0.  Training still goes through
    # `build_loss_fn`, which does apply the penalty to the objective.
    def step_fn(params, model_state, images, labels):
        logits, _ = model.apply(
            params, model_state, images, train=False, return_logits=True
        )
        loss = cross_entropy_from_logits(logits, labels)
        predictions = jnp.argmax(logits, axis=-1)
        correct = jnp.sum(
            (predictions == _labels_argmax(labels)).astype(jnp.float32)
        )
        return {
            "loss": loss,
            "correct": correct,
            "count": jnp.asarray(images.shape[0], jnp.float32),
        }

    return step_fn


@functools.lru_cache(maxsize=64)
def make_eval_step(model, mesh: Optional[Mesh] = None):
    """(params, model_state, images, labels) -> metrics dict (loss = plain
    softmax CE with no regularization penalty, correct count, count) — the
    reference's `_evaluate` fetches (`training/training.py:670-706`)."""

    model = _bind_mesh(model, mesh)
    step_fn = _make_eval_fn(model)

    if mesh is None:
        return jax.jit(step_fn)
    replicated = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step_fn,
        in_shardings=(replicated, replicated, data, data),
        out_shardings=replicated,
    )


@functools.lru_cache(maxsize=64)
def make_multi_eval_step(model, mesh: Optional[Mesh] = None, unroll: int = 1):
    """K-batch evaluation in one dispatch:
    (params, model_state, images (K,B,...), labels (K,B)) -> metrics {(K,)}.
    The evaluation analogue of `make_multi_step` — one host<->device round
    trip per K batches instead of per batch."""

    model = _bind_mesh(model, mesh)
    single = _make_eval_fn(model)

    def multi_fn(params, model_state, images, labels):
        def body(_, xy):
            x, y = xy
            return None, single(params, model_state, x, y)

        _, metrics = jax.lax.scan(body, None, (images, labels), unroll=unroll)
        return metrics

    if mesh is None:
        return jax.jit(multi_fn)
    replicated = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(None, "data"))
    return jax.jit(
        multi_fn,
        in_shardings=(replicated, replicated, data, data),
        out_shardings=replicated,
    )


@functools.lru_cache(maxsize=64)
def make_device_eval(model, batch_size: int, mesh: Optional[Mesh] = None):
    """Full-pass evaluation over a DEVICE-RESIDENT dataset in one dispatch:

        (params, model_state, features (N,H,W,C), labels (N,))
            -> metrics {"loss": (steps,), "correct": (steps,), "count": (steps,)}

    steps = ceil(N / batch_size); the final ragged batch is zero-padded and
    masked, its loss averaged over its VALID examples only — identical
    semantics to feeding per-batch eval results into `StreamingMetrics`
    (mean of batch losses / total correct / total count).  The evaluation
    analogue of `make_device_epoch`: a 10k-image pass is one dispatch and
    one fetch.  Loss is plain CE, never the L2 penalty (_make_eval_fn note).
    """

    model = _bind_mesh(model, mesh)

    def eval_all(params, model_state, features, labels):
        n = features.shape[0]
        steps = -(-n // batch_size)
        pad = steps * batch_size - n
        feats = jnp.pad(
            features, ((0, pad),) + ((0, 0),) * (features.ndim - 1)
        )
        labs = jnp.pad(labels, ((0, pad),) + ((0, 0),) * (labels.ndim - 1))

        def body(_, i):
            start = i * batch_size
            x = jax.lax.dynamic_slice_in_dim(feats, start, batch_size)
            y = jax.lax.dynamic_slice_in_dim(labs, start, batch_size)
            x = x.astype(jnp.float32)
            if mesh is not None:
                # Same reasoning as make_device_epoch: without this
                # constraint every device would redundantly evaluate the
                # full batch.
                x = jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, P("data"))
                )
                y = jax.lax.with_sharding_constraint(
                    y, NamedSharding(mesh, P("data"))
                )
            logits, _ = model.apply(
                params, model_state, x,
                train=False, return_logits=True,
            )
            valid = ((start + jnp.arange(batch_size)) < n).astype(jnp.float32)
            vcount = jnp.sum(valid)
            loss = jnp.sum(
                per_example_cross_entropy(logits, y) * valid
            ) / jnp.maximum(vcount, 1.0)
            predictions = jnp.argmax(logits, axis=-1)
            correct = jnp.sum(
                (predictions == _labels_argmax(y)).astype(jnp.float32) * valid
            )
            return None, {"loss": loss, "correct": correct, "count": vcount}

        _, metrics = jax.lax.scan(body, None, jnp.arange(steps))
        return metrics

    if mesh is None:
        return jax.jit(eval_all)
    replicated = NamedSharding(mesh, P())
    return jax.jit(
        eval_all,
        in_shardings=(replicated, replicated, replicated, replicated),
        out_shardings=replicated,
    )


@functools.lru_cache(maxsize=64)
def make_predict_step(model, mesh: Optional[Mesh] = None):
    """(params, model_state, images) -> model output (softmax probabilities,
    matching the reference predictor's input, `training/training.py:306-314`)."""

    model = _bind_mesh(model, mesh)

    def step_fn(params, model_state, images):
        out, _ = model.apply(params, model_state, images, train=False)
        return out

    if mesh is None:
        return jax.jit(step_fn)
    replicated = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step_fn,
        in_shardings=(replicated, replicated, data),
        out_shardings=data,
    )
