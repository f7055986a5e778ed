"""Training harness tests: the end-to-end slice (SURVEY.md section 7 item 5) —
smoke training on synthetic CIFAR-shaped data, streaming metrics, gradient
telemetry CSV round-trip through TrainingHistory, checkpoint/resume."""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from differential_equations_resnet_tpu.data import synthetic_cifar10
from differential_equations_resnet_tpu.models import (
    build_single_block_resnet,
    cifar10_single_block_config,
)
from differential_equations_resnet_tpu.train import (
    Checkpointer,
    StreamingMetrics,
    Training,
    TrainingHistory,
    constant_schedule,
    create_train_state,
    exponential_decay_schedule,
    gradient_metric_names,
    make_adam,
    make_train_step,
    piecewise_constant_schedule,
)


# Equal configs share one model wrapper (build_single_block_resnet's value
# cache) and equal hyperparameters share one optax transform (make_adam's
# memo), so the memoized step builders return the SAME jitted callables
# across tests — the XLA executables compile once for the whole session
# (the session-scoped-compiled-fixture pattern), with no test-local cache.


def tiny_model(num_layers=4, num_filters=8, **kw):
    return build_single_block_resnet(
        cifar10_single_block_config(
            num_layers=num_layers, num_filters=num_filters, **kw
        )
    )


def make_trainer(tmp_path, num_layers=4, **kw):
    model = tiny_model(num_layers)
    train_x, train_y, test_x, test_y, _ = synthetic_cifar10(256, 64, seed=0)
    return Training(
        model,
        train_features=train_x,
        train_labels=train_y,
        val_features=test_x,
        val_labels=test_y,
        batch_size=32,
        csv_logger_dir=str(tmp_path / "csv"),
        csv_logger_name="smoke",
        summaries_dir=None,
        **kw,
    )


def test_streaming_metrics():
    m = StreamingMetrics()
    m.update(2.0, 3, 10)
    m.update(4.0, 7, 10)
    assert m.mean_loss == 3.0
    assert m.accuracy == 0.5
    m.reset()
    assert m.mean_loss == 0.0 and m.accuracy == 0.0


def test_schedules():
    assert constant_schedule(0.1)(123) == 0.1
    s = piecewise_constant_schedule([10, 20], [1.0, 0.1, 0.01])
    assert s(5) == 1.0 and s(15) == 0.1 and s(25) == 0.01
    e = exponential_decay_schedule(1.0, 0.5, 10, staircase=True)
    assert e(9) == 1.0 and e(10) == 0.5
    from differential_equations_resnet_tpu.train import linear_warmup_schedule

    w = linear_warmup_schedule(0.8, 4)
    assert w(0) == 0.2 and w(3) == 0.8 and w(100) == 0.8
    wd = linear_warmup_schedule(
        1.0, 2, after=piecewise_constant_schedule([5], [1.0, 0.1])
    )
    assert wd(0) == 0.5 and wd(1) == 1.0 and wd(6) == 1.0 and wd(7) == 0.1
    # warmup_steps=0 = "no warmup": the after-schedule verbatim, so CLI
    # callers can pass a user flag straight through without branching.
    w0 = linear_warmup_schedule(0.8, 0)
    assert w0(0) == 0.8 and w0(100) == 0.8
    import pytest as _pytest

    with _pytest.raises(ValueError):
        linear_warmup_schedule(1.0, -1)


def test_smoke_training_reduces_loss(tmp_path):
    trainer = make_trainer(tmp_path)
    history = trainer.train(
        epochs=2,
        steps_per_epoch=8,
        learning_rate_schedule=lambda step: 1e-3,
        eval_steps=2,
        summaries_frequency=2,
        verbose=False,
    )
    assert trainer.global_step == 16
    losses = [h["mean_loss"] for h in history["train"]]
    assert losses[-1] < losses[0]
    assert len(history["eval"]) == 2

    # CSV telemetry round-trips through TrainingHistory with the reference's
    # column layout and diagnostics.
    csv_dir = str(tmp_path / "csv")
    files = sorted(os.listdir(csv_dir))
    train_csv = [f for f in files if "training" in f][0]
    eval_csv = [f for f in files if "evaluation" in f][0]
    th = TrainingHistory(
        training_history_filepath=os.path.join(csv_dir, train_csv),
        evaluation_history_filepath=os.path.join(csv_dir, eval_csv),
    )
    assert th.num_layers == 1 + 4  # conv1 + 4 residual layers
    assert th.gradient_names[0] == "conv1_kernel_gradient_mean_norm"
    assert th.gradient_names[1] == "res2_0_branch2_kernel_gradient_mean_norm"
    assert np.all(th.gradient_norms > 0)
    rel_dev = th.gradient_norm_relative_deviation(step_bounds=(None, None, 1))
    assert np.isfinite(rel_dev) and rel_dev >= 1.0  # >= 1 by Cauchy-Schwarz
    std = th.gradient_norm_standard_deviation()
    assert np.isfinite(std)
    ratio = th.gradient_norm_relative_comparison(step_bounds=(None, None, 1))
    assert np.isfinite(ratio) and ratio > 0
    assert len(th.evaluation_steps) == 2
    trainer.close()


def test_telemetry_chunk_boundary(tmp_path):
    """Epoch telemetry crossing the 128-step on-device chunk boundary must
    produce one CSV row per summaries_frequency steps with correct steps."""
    train_x, train_y, *_ = synthetic_cifar10(256, 8, seed=1)
    trainer = Training(
        tiny_model(2),
        train_features=train_x,
        train_labels=train_y,
        batch_size=2,
        csv_logger_dir=str(tmp_path / "csv"),
        csv_logger_name="chunk",
    )
    trainer.train(
        epochs=1,
        steps_per_epoch=130,
        learning_rate_schedule=lambda s: 1e-3,
        eval_frequency=None,
        summaries_frequency=10,
        verbose=False,
    )
    csv_dir = str(tmp_path / "csv")
    train_csv = [f for f in os.listdir(csv_dir) if "training" in f][0]
    th = TrainingHistory(os.path.join(csv_dir, train_csv))
    np.testing.assert_array_equal(
        th.training_steps, np.arange(10, 131, 10)
    )
    assert np.all(np.isfinite(th.gradient_norms))
    trainer.close()


def test_training_history_rejects_header_only_csv(tmp_path):
    """A training CSV from a run killed before its first telemetry flush
    has a header but no rows; TrainingHistory must explain that instead of
    raising numpy's opaque need-at-least-one-array error."""
    p = tmp_path / "empty_training.csv"
    p.write_text("global_step mean_loss accuracy conv1_g\n")
    with pytest.raises(ValueError, match="no data rows"):
        TrainingHistory(str(p))


def test_evaluate_and_predict(tmp_path):
    trainer = make_trainer(tmp_path)
    results = trainer.evaluate(dataset="val", num_steps=2)
    assert 0.0 <= results["accuracy"] <= 1.0
    assert results["mean_loss"] > 0
    images = synthetic_cifar10(10, 1, seed=5)[0]
    probs = trainer.predict(images, batch_size=4)  # exercises padding path
    assert probs.shape == (10, 10)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)
    trainer.close()


def test_checkpoint_save_restore_resumes_adam_state(tmp_path):
    trainer = make_trainer(tmp_path)
    trainer.train(
        epochs=1, steps_per_epoch=4,
        learning_rate_schedule=lambda s: 1e-3,
        eval_frequency=None, verbose=False,
    )
    path = trainer.save(str(tmp_path / "ckpt"), tags=["t"], name="m")
    assert "step-00000004" in path

    trainer2 = make_trainer(tmp_path / "second")
    trainer2.load_variables(path)
    assert trainer2.global_step == 4
    for a, b in zip(jax.tree.leaves(trainer.state), jax.tree.leaves(trainer2.state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    trainer.close(), trainer2.close()


def test_checkpointer_gc_and_latest(tmp_path):
    model = tiny_model(2)
    state = create_train_state(model, jax.random.key(0))
    ckpt = Checkpointer(str(tmp_path), backend="pickle", max_to_keep=2)
    for step in (1, 2, 3):
        ckpt.save(state._replace(step=jnp.asarray(step, jnp.int32)), step)
    assert len(ckpt.list_checkpoints()) == 2
    assert "step-00000003" in ckpt.latest()
    restored = ckpt.restore(state)
    assert int(restored.step) == 3


def test_best_metric_monitoring_accuracy(tmp_path):
    """Accuracy-monitored checkpointing must actually trigger (the reference
    never saved on accuracy due to its 'accuracry' typo, training.py:637)."""
    trainer = make_trainer(tmp_path)
    trainer.train(
        epochs=1, steps_per_epoch=4,
        learning_rate_schedule=lambda s: 1e-3,
        eval_steps=1,
        save_during_training=True,
        save_dir=str(tmp_path / "best"),
        save_best_only=True,
        save_frequency=1,
        saver="pickle",
        monitor="accuracy",
        verbose=False,
    )
    ckpts = Checkpointer(str(tmp_path / "best"), backend="pickle").list_checkpoints()
    assert len(ckpts) == 1
    trainer.close()


def test_train_step_lr_injection():
    """The injected learning rate must actually drive the Adam update."""
    model = tiny_model(2)
    tx = make_adam()
    state = create_train_state(model, jax.random.key(0), tx)
    step = make_train_step(model, tx, donate=False)
    x = jnp.ones((4, 32, 32, 3))
    y = jnp.zeros((4,), jnp.int32)
    s_small, _, _ = step(state, x, y, 1e-6)
    s_big, _, _ = step(state, x, y, 1e-1)
    d_small = float(
        jnp.abs(s_small.params["stem"].kernel - state.params["stem"].kernel).max()
    )
    d_big = float(
        jnp.abs(s_big.params["stem"].kernel - state.params["stem"].kernel).max()
    )
    assert d_big > 100 * d_small


def test_gradient_metric_names_with_conv_blocks():
    from differential_equations_resnet_tpu.models import SingleBlockResNetConfig

    cfg = SingleBlockResNetConfig(
        num_stages=3,
        blocks_per_stage=(2, 3),
        filters_per_block=(8, 16),
        strides=((1, 1), (2, 2)),
        num_classes=10,
        use_max_pooling=(False, False, False, False),
    )
    names = gradient_metric_names(cfg)
    assert names == [
        "conv1_kernel_gradient_mean_norm",
        "res2_0_branch2_kernel_gradient_mean_norm",
        "res2_1_branch2_kernel_gradient_mean_norm",
        "res3_0_branch2_kernel_gradient_mean_norm",  # conv block
        "res3_1_branch2_kernel_gradient_mean_norm",
        "res3_2_branch2_kernel_gradient_mean_norm",
    ]


def test_multi_step_matches_sequential_single_steps():
    """K scanned steps == K sequential jitted steps, bitwise-comparable
    numerics (same math, same order)."""
    from differential_equations_resnet_tpu.train import make_multi_step

    model = tiny_model(3, 8)
    tx = make_adam()
    key = jax.random.key(7)
    rng = np.random.default_rng(3)
    K, B = 4, 16
    xs = jnp.asarray(rng.uniform(0, 255, (K, B, 32, 32, 3)), jnp.float32)
    ys = jnp.asarray(rng.integers(0, 10, (K, B)))
    lrs = jnp.asarray([1e-3, 9e-4, 8e-4, 7e-4], jnp.float32)

    s1 = create_train_state(model, key, tx)
    step = make_train_step(model, tx, donate=False)
    single_losses, single_norms = [], []
    for i in range(K):
        s1, m, g = step(s1, xs[i], ys[i], lrs[i])
        single_losses.append(float(m["loss"]))
        single_norms.append(np.asarray(g))

    s2 = create_train_state(model, key, tx)
    multi = make_multi_step(model, tx, donate=False)
    s2, metrics, norms = multi(s2, xs, ys, lrs)

    np.testing.assert_allclose(
        np.asarray(metrics["loss"]), np.asarray(single_losses), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(norms), np.stack(single_norms), rtol=1e-5
    )
    assert int(s2.step) == K
    chex = jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        ),
        s1.params, s2.params,
    )
    del chex


def test_multi_step_data_parallel_matches_single_device():
    """Multi-step under a 'data' mesh reproduces single-device numerics."""
    from differential_equations_resnet_tpu.parallel import create_mesh
    from differential_equations_resnet_tpu.train import make_multi_step

    model = tiny_model(2, 8)
    tx = make_adam()
    key = jax.random.key(1)
    rng = np.random.default_rng(5)
    K, B = 3, 16
    xs = jnp.asarray(rng.uniform(0, 255, (K, B, 32, 32, 3)), jnp.float32)
    ys = jnp.asarray(rng.integers(0, 10, (K, B)))
    lrs = jnp.full((K,), 1e-3, jnp.float32)

    s1 = create_train_state(model, key, tx)
    ref_multi = make_multi_step(model, tx, donate=False)
    s1, m1, _ = ref_multi(s1, xs, ys, lrs)

    mesh = create_mesh((8,), ("data",))
    s2 = create_train_state(model, key, tx)
    dp_multi = make_multi_step(model, tx, mesh=mesh, donate=False)
    s2, m2, _ = dp_multi(s2, xs, ys, lrs)

    np.testing.assert_allclose(
        np.asarray(m1["loss"]), np.asarray(m2["loss"]), rtol=1e-5
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        ),
        s1.params, s2.params,
    )


def test_training_scan_steps_equivalent(tmp_path):
    """Training with scan_steps=K produces the same history and telemetry
    CSV rows as the per-step path (same data order, same numerics)."""
    hist = {}
    csvs = {}
    for mode, scan in (("single", 0), ("scan", 4)):
        trainer = make_trainer(tmp_path / mode)
        trainer.train(
            epochs=1,
            steps_per_epoch=6,   # 4-step chunk + 2-step remainder
            learning_rate_schedule=constant_schedule(1e-3),
            eval_steps=2,
            summaries_frequency=1,
            scan_steps=scan,
        )
        hist[mode] = trainer.history
        csv_dir = tmp_path / mode / "csv"
        (train_csv,) = [p for p in os.listdir(csv_dir) if "training" in p]
        csvs[mode] = np.loadtxt(csv_dir / train_csv, skiprows=1)
        trainer.close()

    assert hist["single"]["train"][0]["step"] == hist["scan"]["train"][0]["step"] == 6
    np.testing.assert_allclose(
        hist["single"]["train"][0]["mean_loss"],
        hist["scan"]["train"][0]["mean_loss"],
        rtol=1e-5,
    )
    assert csvs["single"].shape == csvs["scan"].shape
    np.testing.assert_allclose(csvs["single"], csvs["scan"], rtol=1e-4, atol=1e-6)


def test_multi_eval_and_scanned_evaluate_match(tmp_path):
    """make_multi_eval_step == per-batch eval; Training.evaluate(scan_steps=K)
    == the per-batch path, including a ragged final chunk."""
    from differential_equations_resnet_tpu.train import make_multi_eval_step

    trainer = make_trainer(tmp_path)
    # 64 val examples, batch 32 -> 2 equal batches; num_steps=3 wraps to a
    # third batch via repeat (all equal shape here).
    ref = trainer.evaluate("val", num_steps=4)
    scanned = trainer.evaluate("val", num_steps=4, scan_steps=2)
    np.testing.assert_allclose(ref["mean_loss"], scanned["mean_loss"], rtol=1e-6)
    np.testing.assert_allclose(ref["accuracy"], scanned["accuracy"], rtol=1e-6)

    # Direct: stacked multi-eval equals stacked single evals.
    multi = make_multi_eval_step(trainer.model)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.uniform(0, 255, (3, 16, 32, 32, 3)), jnp.float32)
    ys = jnp.asarray(rng.integers(0, 10, (3, 16)))
    m = multi(trainer.state.params, trainer.state.model_state, xs, ys)
    for i in range(3):
        s = trainer._eval_step(
            trainer.state.params, trainer.state.model_state, xs[i], ys[i]
        )
        np.testing.assert_allclose(float(m["loss"][i]), float(s["loss"]), rtol=1e-5)
        assert float(m["correct"][i]) == float(s["correct"])
    trainer.close()


def test_training_profile_trace(tmp_path):
    """profile_dir captures a jax.profiler trace of the chosen epoch."""
    trainer = make_trainer(tmp_path)
    trainer.train(
        epochs=1,
        steps_per_epoch=2,
        learning_rate_schedule=constant_schedule(1e-3),
        eval_frequency=None,
        profile_dir=str(tmp_path / "trace"),
    )
    produced = []
    for root, _, files in os.walk(tmp_path / "trace"):
        produced.extend(files)
    assert produced, "no profiler trace files written"
    trainer.close()


def test_l2_regularization_applied():
    """l2_regularization adds the Keras-style kernel penalty to the loss and
    shifts kernel gradients (biases/BN untouched by the penalty)."""
    from differential_equations_resnet_tpu.models.blocks import l2_kernel_penalty

    w = 1e-2
    model0 = tiny_model(3, 8)
    model_l2 = tiny_model(3, 8, l2_regularization=w)
    tx = make_adam()
    key = jax.random.key(0)
    s0 = create_train_state(model0, key, tx)
    s1 = create_train_state(model_l2, key, tx)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (8, 32, 32, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 10, (8,)))

    step0 = make_train_step(model0, tx, donate=False)
    step1 = make_train_step(model_l2, tx, donate=False)
    _, m0, _ = step0(s0, x, y, 1e-3)
    _, m1, _ = step1(s1, x, y, 1e-3)

    penalty = float(l2_kernel_penalty(s0.params, w))
    assert penalty > 0
    np.testing.assert_allclose(
        float(m1["loss"]), float(m0["loss"]) + penalty, rtol=1e-5
    )

    # Penalty covers conv/dense kernels + antisymmetric free params only.
    blocks = s0.params["stages"][0]["blocks"]
    manual = sum(
        float(jnp.sum(jnp.square(a)))
        for a in (blocks.a, blocks.b, blocks.c, blocks.d, blocks.cross)
    )
    manual += float(jnp.sum(jnp.square(s0.params["stem"].kernel)))
    manual += float(jnp.sum(jnp.square(s0.params["head"].kernel)))
    np.testing.assert_allclose(penalty, w * manual, rtol=1e-5)


@pytest.mark.parametrize("accum_steps", [1, 3])
def test_training_scan_steps_handles_ragged_batches(tmp_path, accum_steps):
    """A dataset without drop_remainder yields a short epoch-boundary batch;
    the scan path must fall back to single steps, not crash in np.stack —
    and with accumulation on, the ragged 16-sample batch (16 % 3 != 0) must
    train monolithically rather than abort the epoch."""
    from differential_equations_resnet_tpu.data import create_dataset_from_arrays
    from differential_equations_resnet_tpu.data.cifar10 import synthetic_cifar10

    train_x, train_y, *_ = synthetic_cifar10(82, 1, seed=0)  # 82 = 2x33 + 16
    ds = create_dataset_from_arrays(
        train_x, train_y, batch_size=33,
        shuffle=False, repeat=True, drop_remainder=False,
    )
    model = tiny_model(2, 8)
    trainer = Training(model, train_dataset=ds, batch_size=33,
                       record_summaries=True, accum_steps=accum_steps)
    trainer.train(
        epochs=1,
        steps_per_epoch=6,   # crosses the ragged 16-sample batch (16 % 3 != 0)
        learning_rate_schedule=constant_schedule(1e-3),
        eval_frequency=None,
        scan_steps=3,
    )
    assert trainer.global_step == 6


def test_eval_loss_is_pure_ce_even_with_l2():
    """Eval loss must be plain cross-entropy: the reference's eval metric
    never included a regularization penalty (training/training.py:292-297),
    and mixing it in would skew eval CSVs + monitor='loss' gating."""
    from differential_equations_resnet_tpu.train.train_step import make_eval_step

    w = 1e-2
    model0 = tiny_model(3, 8)
    model_l2 = tiny_model(3, 8, l2_regularization=w)
    key = jax.random.key(0)
    s0 = create_train_state(model0, key)
    s1 = create_train_state(model_l2, key)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (8, 32, 32, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 10, (8,)))

    m0 = make_eval_step(model0)(s0.params, s0.model_state, x, y)
    m1 = make_eval_step(model_l2)(s1.params, s1.model_state, x, y)
    np.testing.assert_allclose(float(m1["loss"]), float(m0["loss"]), rtol=1e-6)


def test_checkpoint_restore_rejects_structure_drift(tmp_path):
    """Restoring into a target with a different pytree structure must raise,
    not silently mis-assign leaves by flat order."""
    model = tiny_model(2)
    state = create_train_state(model, jax.random.key(0))
    ckpt = Checkpointer(str(tmp_path), backend="pickle")
    ckpt.save(state, 1)
    bad_target = state._replace(model_state={"surprise": jnp.zeros(3)})
    with pytest.raises(ValueError, match="structure"):
        ckpt.restore(bad_target)
    restored = ckpt.restore(state)  # matching structure still round-trips
    assert int(restored.step) == int(state.step)


def test_checkpoint_meta_sidecar_roundtrip(tmp_path):
    """Sidecar metadata persists the exact monitored metrics (not the %.4f
    name-rounded values) and is garbage-collected with its checkpoint."""
    model = tiny_model(2)
    state = create_train_state(model, jax.random.key(0))
    ckpt = Checkpointer(str(tmp_path), backend="pickle", max_to_keep=1)
    p1 = ckpt.save(state, 1, metrics={"loss": 1.23456789, "accuracy": 0.5})
    p2 = ckpt.save(state, 2, metrics={"loss": 0.5, "accuracy": 0.75})
    meta = ckpt.read_meta(p2)
    assert meta["step"] == 2
    np.testing.assert_allclose(meta["metrics"]["loss"], 0.5)
    np.testing.assert_allclose(meta["metrics"]["accuracy"], 0.75)
    assert ckpt.read_meta(p1) is None  # GC'd with its checkpoint
    assert not os.path.exists(p1 + ".meta.json")
    assert len(ckpt.list_checkpoints()) == 1  # sidecars don't count


def test_evaluate_train_does_not_consume_training_iterator(tmp_path):
    """`evaluate('train')` must run over a fresh dataset pass; consuming the
    live training iterator would silently skip training batches."""
    from differential_equations_resnet_tpu.data import create_dataset_from_arrays

    n = 96
    train_x = np.zeros((n, 32, 32, 3), np.float32)
    # Tag every image with its index so batches are identifiable.
    train_x[:, 0, 0, 0] = np.arange(n)
    train_y = np.zeros((n,), np.int64)
    ds = create_dataset_from_arrays(
        train_x, train_y, batch_size=32, shuffle=False, repeat=True,
    )
    model = tiny_model(2, 8)
    trainer = Training(model, train_dataset=ds, batch_size=32)

    first = next(trainer._train_iter)[0][:, 0, 0, 0]
    trainer.evaluate(dataset="train", num_steps=2)
    second = next(trainer._train_iter)[0][:, 0, 0, 0]
    np.testing.assert_array_equal(first, np.arange(0, 32))
    np.testing.assert_array_equal(second, np.arange(32, 64))


def test_dispatch_failure_retires_producer(tmp_path):
    """If the dispatch loop raises mid-epoch, the staging producer must exit
    (not stay blocked on the queue holding the shared train iterator), and a
    subsequent train() call must run cleanly with a single producer."""
    import threading

    trainer = make_trainer(tmp_path)

    real_step = trainer._train_step
    calls = {"n": 0}

    def failing_step(*args):
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("boom")
        return real_step(*args)

    trainer._train_step = failing_step
    with pytest.raises(RuntimeError, match="boom"):
        trainer.train(
            epochs=1,
            steps_per_epoch=8,
            learning_rate_schedule=constant_schedule(1e-3),
            eval_frequency=None,
            verbose=False,
        )

    # The staging producer must have exited (the dataset's prefetch daemon
    # may legitimately persist — it is identified by name).
    def producers():
        return [t for t in threading.enumerate()
                if t.name == "deqres-staging-producer"]

    deadline = time.time() + 12.0
    while producers() and time.time() < deadline:
        time.sleep(0.05)
    assert not producers()

    trainer._train_step = real_step
    history = trainer.train(
        epochs=1,
        steps_per_epoch=4,
        learning_rate_schedule=constant_schedule(1e-3),
        eval_frequency=None,
        verbose=False,
    )
    assert history["train"][-1]["epoch"] == 1
    assert np.isfinite(history["train"][-1]["mean_loss"])
    trainer.close()


def test_train_rejects_invalid_eval_dataset(tmp_path):
    """The reference hard-validates eval_dataset (training/training.py:546-547);
    a typo must raise, never silently disable evaluation."""
    trainer = make_trainer(tmp_path)
    with pytest.raises(ValueError, match="eval_dataset"):
        trainer.train(
            epochs=1,
            steps_per_epoch=2,
            learning_rate_schedule=constant_schedule(1e-3),
            eval_dataset="validation",  # typo'd value
            verbose=False,
        )
    trainer.close()


def test_train_eval_on_training_set(tmp_path):
    """eval_dataset='train' (the reference's default) evaluates a fresh pass
    of the training set; eval_steps=None defaults to the full pass."""
    trainer = make_trainer(tmp_path)
    history = trainer.train(
        epochs=1,
        steps_per_epoch=2,
        learning_rate_schedule=constant_schedule(1e-3),
        eval_dataset="train",
        verbose=False,
    )
    assert len(history["eval"]) == 1
    assert np.isfinite(history["eval"][0]["mean_loss"])
    # Full pass over 256 train examples at batch 32 (remainder dropped) means
    # the eval consumed 8 batches of 32.
    trainer.eval_metrics._drain()
    assert trainer.eval_metrics._count == 256
    trainer.close()


def test_train_device_data_defaults_to_full_device_eval(tmp_path):
    """train(device_data=True) with all-default eval args must evaluate one
    full val pass through the one-dispatch device path (VERDICT r2 weak #2:
    the old code raised on eval_steps=None)."""
    trainer = make_trainer(tmp_path)
    history = trainer.train(
        epochs=1,
        steps_per_epoch=2,
        learning_rate_schedule=constant_schedule(1e-3),
        device_data=True,
        verbose=False,
    )
    assert len(history["eval"]) == 1
    # Routed through the device-resident full-pass eval, covering all 64 val
    # examples (ragged final batch masked).
    assert "val" in trainer._device_eval_fns
    trainer.eval_metrics._drain()
    assert trainer.eval_metrics._count == 64
    trainer.close()


def test_train_device_data_eval_on_training_set(tmp_path):
    """device_data=True composes with eval_dataset='train': the full train
    pass is one dispatch over the already-device-resident train arrays."""
    trainer = make_trainer(tmp_path)
    history = trainer.train(
        epochs=1,
        steps_per_epoch=2,
        learning_rate_schedule=constant_schedule(1e-3),
        device_data=True,
        eval_dataset="train",
        verbose=False,
    )
    assert len(history["eval"]) == 1
    assert "train" in trainer._device_eval_fns
    trainer.eval_metrics._drain()
    assert trainer.eval_metrics._count == 256
    trainer.close()


def test_device_epoch_rejects_oversubscribed_steps():
    """make_device_epoch must validate steps*batch_size <= N at trace time
    (dynamic_slice clamping would otherwise silently train on repeated
    overlapping batches for direct callers like bench.py)."""
    from differential_equations_resnet_tpu.train.train_step import (
        make_device_epoch,
    )

    model = tiny_model()
    tx = make_adam()
    state = create_train_state(model, jax.random.key(0), tx)
    epoch = make_device_epoch(model, tx, batch_size=32, donate=False)
    feats = np.zeros((64, 32, 32, 3), np.uint8)
    labs = np.zeros((64,), np.int32)
    with pytest.raises(ValueError, match="without replacement"):
        epoch(state, feats, labs, jax.random.key(1),
              jnp.full((3,), 1e-3, jnp.float32))  # 3*32 = 96 > 64


def test_checkpoint_layout_mismatch_names_converter(tmp_path):
    """Restoring a packed-layout checkpoint into a dense-layout target (or
    vice versa) must raise an error that names convert_antisym_layout — the
    mechanical, bit-exact migration path."""
    from differential_equations_resnet_tpu.utils.weight_utils import (
        convert_antisym_layout,
    )

    model = tiny_model(num_layers=2)
    state = create_train_state(model, jax.random.key(0), make_adam())
    ckpt = Checkpointer(str(tmp_path / "ckpt"), backend="pickle")
    ckpt.save(state, 0)
    dense_state = convert_antisym_layout(state, to="dense")
    with pytest.raises(ValueError, match="convert_antisym_layout"):
        ckpt.restore(dense_state)


def test_step_builders_memoized_by_identity():
    """Equal (model, tx, mesh) share one jitted step (one XLA compile per
    configuration per process); distinct models or optimizers do not."""
    model_a = tiny_model(2)
    model_b = build_single_block_resnet(
        cifar10_single_block_config(num_layers=2, num_filters=8)
    )
    # Equal configs share the model wrapper itself (build value cache)...
    assert model_b is model_a
    tx = make_adam()
    assert make_adam() is tx  # ...and equal hyperparameters share the tx.
    step1 = make_train_step(model_a, tx, donate=False)
    step2 = make_train_step(model_b, make_adam(), donate=False)
    assert step2 is step1
    # Different donation / metrics flags, models, or tx objects miss.
    assert make_train_step(model_a, tx, donate=True) is not step1
    other_model = build_single_block_resnet(
        cifar10_single_block_config(num_layers=3, num_filters=8)
    )
    assert make_train_step(other_model, tx, donate=False) is not step1
    other_tx = make_adam(learning_rate=5e-4)
    assert make_train_step(model_a, other_tx, donate=False) is not step1


def test_train_device_eval_on_ragged_train_set(tmp_path):
    """Regression (r3 review): with len(train) % batch != 0, the
    device-resident train-set eval must still route through the one-dispatch
    device path — the ceil/floor full-pass mismatch previously fell back to
    per-batch host streaming silently."""
    model = tiny_model(2)
    train_x, train_y, test_x, test_y, _ = synthetic_cifar10(250, 64, seed=3)
    trainer = Training(
        model,
        train_features=train_x, train_labels=train_y,
        val_features=test_x, val_labels=test_y,
        batch_size=32,
        record_summaries=False,
    )
    trainer.train(
        epochs=1,
        steps_per_epoch=2,
        learning_rate_schedule=constant_schedule(1e-3),
        device_data=True,
        eval_dataset="train",
        verbose=False,
    )
    assert "train" in trainer._device_eval_fns  # 250 % 32 != 0
    trainer.eval_metrics._drain()
    assert trainer.eval_metrics._count == 250  # ragged tail masked, all seen


def test_evaluate_rejects_zero_steps(tmp_path):
    """Regression (r3 review): a zero-batch eval must raise instead of
    returning fake 0.0 metrics that would corrupt best-metric gating."""
    trainer = make_trainer(tmp_path)
    with pytest.raises(ValueError, match="num_steps"):
        trainer.evaluate("val", num_steps=0)
    with pytest.raises(ValueError, match="eval_steps"):
        trainer.train(
            epochs=1,
            steps_per_epoch=2,
            learning_rate_schedule=constant_schedule(1e-3),
            eval_steps=0,
            verbose=False,
        )
    trainer.close()


# ---------------------------------------------------------------------------
# Gradient accumulation (train_step._build_step_fn accum_steps)
# ---------------------------------------------------------------------------


def _accum_state_and_batch(model, tx, batch=32, seed=0):
    state = create_train_state(model, jax.random.key(seed), tx)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(0, 255, (batch, 32, 32, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 10, (batch,)))
    return state, x, y


def test_accum_step_matches_monolithic():
    """accum_steps=k must reproduce the monolithic step exactly (equal
    microbatches: mean-of-means == full-batch mean for loss AND gradient),
    to fp32 reassociation tolerance — params, metrics, and grad norms."""
    model = tiny_model()
    tx = make_adam()
    state, x, y = _accum_state_and_batch(model, tx)

    mono = make_train_step(model, tx, donate=False)
    accum = make_train_step(model, tx, donate=False, accum_steps=4)
    s1, m1, g1 = mono(state, x, y, 1e-3)
    s2, m2, g2 = accum(state, x, y, 1e-3)

    assert float(m2["count"]) == 32.0
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-5)
    assert float(m2["correct"]) == float(m1["correct"])
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-4, atol=1e-7)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=1e-6
        )
    assert int(s2.step) == int(s1.step)


def test_accum_step_under_dp_mesh():
    """Accumulation composes with data parallelism: each microbatch is
    constrained onto the mesh's data axis, and the result still matches the
    meshless monolithic step."""
    from differential_equations_resnet_tpu.parallel import create_mesh
    from differential_equations_resnet_tpu.parallel.mesh import (
        shard_batch,
        shard_params,
    )

    model = tiny_model()
    tx = make_adam()
    state, x, y = _accum_state_and_batch(model, tx)
    mono = make_train_step(model, tx, donate=False)
    s1, m1, _ = mono(state, x, y, 1e-3)

    mesh = create_mesh((8,), ("data",))
    accum = make_train_step(model, tx, mesh=mesh, donate=False, accum_steps=2)
    sharded_state = state._replace(
        params=shard_params(mesh, state.params),
        opt_state=shard_params(mesh, state.opt_state),
    )
    xs, ys = shard_batch(mesh, (np.asarray(x), np.asarray(y)))
    s2, m2, _ = accum(sharded_state, xs, ys, 1e-3)

    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-5)
    assert float(m2["correct"]) == float(m1["correct"])
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=1e-6
        )


def test_accum_step_through_shard_map():
    """Accumulation composes with the EXPLICIT-collective path too (VERDICT
    r3 item 4): make_shard_map_train_step(accum_steps=2) on the 8-device
    mesh matches the meshless monolithic step — each device scans its own
    local shard's microbatches and the pmean/psum collectives run once per
    update.  The parity twin of test_accum_step_under_dp_mesh through
    shard_map instead of jit shardings."""
    from differential_equations_resnet_tpu.parallel import (
        create_mesh,
        make_shard_map_train_step,
    )
    from differential_equations_resnet_tpu.parallel.mesh import (
        shard_batch,
        shard_params,
    )

    model = tiny_model()
    tx = make_adam()
    state, x, y = _accum_state_and_batch(model, tx)
    mono = make_train_step(model, tx, donate=False)
    s1, m1, g1 = mono(state, x, y, 1e-3)

    mesh = create_mesh((8,), ("data",))
    accum = make_shard_map_train_step(
        model, tx, mesh, donate=False, accum_steps=2
    )
    sharded_state = state._replace(
        params=shard_params(mesh, state.params),
        opt_state=shard_params(mesh, state.opt_state),
    )
    xs, ys = shard_batch(mesh, (np.asarray(x), np.asarray(y)))
    s2, m2, g2 = accum(sharded_state, xs, ys, jnp.float32(1e-3))

    assert float(m2["count"]) == float(m1["count"])
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-5)
    assert float(m2["correct"]) == float(m1["correct"])
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-4, atol=1e-7)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=1e-6
        )
    # A local shard (4 rows here) not divisible by accum_steps falls back
    # to the monolithic per-shard step with a warning, same contract as the
    # jit path.
    ragged = make_shard_map_train_step(
        model, tx, mesh, donate=False, accum_steps=3
    )
    with pytest.warns(UserWarning, match="monolithically"):
        _, m3, _ = ragged(sharded_state, xs, ys, jnp.float32(1e-3))
    np.testing.assert_allclose(float(m3["loss"]), float(m1["loss"]), rtol=1e-5)
    with pytest.raises(ValueError, match="accum_steps"):
        make_shard_map_train_step(model, tx, mesh, accum_steps=0)


def test_accum_validation():
    from differential_equations_resnet_tpu.train.train_step import (
        make_device_epoch,
    )

    model = tiny_model()
    tx = make_adam()
    state, x, y = _accum_state_and_batch(model, tx)
    with pytest.raises(ValueError, match="accum_steps"):
        make_train_step(model, tx, donate=False, accum_steps=0)(
            state, x, y, 1e-3
        )
    with pytest.raises(ValueError, match="divide"):
        Training(model, batch_size=32, accum_steps=5, record_summaries=False)
    with pytest.raises(ValueError, match="accum_steps"):
        Training(model, batch_size=32, accum_steps=0, record_summaries=False)
    # The device-resident epoch gathers exact batch_size batches, so a
    # non-dividing accum_steps is always a misconfiguration: build-time error.
    with pytest.raises(ValueError, match="divide batch_size"):
        make_device_epoch(model, tx, batch_size=32, accum_steps=5)


def test_accum_ragged_batch_falls_back_to_monolithic():
    """A traced batch not divisible by accum_steps (the ragged epoch-tail
    batch of a dataset without drop_remainder) must train monolithically —
    identical numerics, no mid-epoch crash."""
    model = tiny_model()
    tx = make_adam()
    state, x, y = _accum_state_and_batch(model, tx, batch=30)

    mono = make_train_step(model, tx, donate=False)
    accum = make_train_step(model, tx, donate=False, accum_steps=4)
    s1, m1, g1 = mono(state, x, y, 1e-3)
    with pytest.warns(UserWarning, match="monolithically"):
        s2, m2, g2 = accum(state, x, y, 1e-3)

    assert float(m2["count"]) == 30.0
    assert float(m2["loss"]) == float(m1["loss"])  # same program, bitwise
    np.testing.assert_array_equal(np.asarray(g2), np.asarray(g1))
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))


def test_accum_dp_split_is_device_major_no_resharding():
    """Under a DP mesh the microbatch split must keep each device's rows
    local: the compiled accumulation step may psum gradients (all-reduce)
    but must not reshard the batch (the contiguous split emits
    collective-permute/all-gather of the whole batch every step)."""
    from differential_equations_resnet_tpu.parallel import create_mesh
    from differential_equations_resnet_tpu.parallel.mesh import (
        shard_batch,
        shard_params,
    )

    model = tiny_model()
    tx = make_adam()
    state, x, y = _accum_state_and_batch(model, tx)
    mesh = create_mesh((8,), ("data",))
    accum = make_train_step(model, tx, mesh=mesh, donate=False, accum_steps=2)
    sharded_state = state._replace(
        params=shard_params(mesh, state.params),
        opt_state=shard_params(mesh, state.opt_state),
    )
    xs, ys = shard_batch(mesh, (np.asarray(x), np.asarray(y)))
    hlo = accum.lower(sharded_state, xs, ys, 1e-3).compile().as_text()
    assert "all-reduce" in hlo  # the gradient psum is still there
    for op in ("all-to-all", "collective-permute", "all-gather"):
        assert op not in hlo, f"batch resharding ({op}) in the accum step"


def test_accum_device_epoch_matches():
    """The device-resident epoch trainer inherits accumulation: same RNG key
    -> same permutation and batches, so accum_steps=2 must match the
    accum-free epoch to fp32 tolerance, step for step."""
    from differential_equations_resnet_tpu.train.train_step import (
        make_device_epoch,
    )

    model = tiny_model()
    tx = make_adam()
    state = create_train_state(model, jax.random.key(1), tx)
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.integers(0, 256, (128, 32, 32, 3)), jnp.uint8)
    labs = jnp.asarray(rng.integers(0, 10, (128,)))
    lrs = jnp.full((4,), 1e-3, jnp.float32)
    key = jax.random.key(7)

    plain = make_device_epoch(model, tx, 32, donate=False)
    accum = make_device_epoch(model, tx, 32, donate=False, accum_steps=2)
    s1, m1, g1 = plain(state, feats, labs, key, lrs)
    s2, m2, g2 = accum(state, feats, labs, key, lrs)

    np.testing.assert_allclose(
        np.asarray(m2["loss"]), np.asarray(m1["loss"]), rtol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(m2["correct"]), np.asarray(m1["correct"]))
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-4, atol=1e-7)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=1e-6
        )


def test_training_accum_end_to_end(tmp_path):
    """Training(accum_steps=4) runs the streaming loop and matches the
    accum-free trainer's telemetry on the same data order."""
    t1 = make_trainer(tmp_path / "a")
    t2 = make_trainer(tmp_path / "b", accum_steps=4)
    for t in (t1, t2):
        t.train(
            epochs=1,
            steps_per_epoch=4,
            learning_rate_schedule=constant_schedule(1e-3),
            eval_frequency=None,
            verbose=False,
        )
    r1 = t1.history["train"][-1]
    r2 = t2.history["train"][-1]
    np.testing.assert_allclose(r2["mean_loss"], r1["mean_loss"], rtol=1e-5)
    np.testing.assert_allclose(r2["accuracy"], r1["accuracy"], rtol=1e-6)
    t1.close()
    t2.close()
