"""Device-resident epoch training (`make_device_epoch`) and in-jit
augmentation (`data/jit_augment.py`)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from differential_equations_resnet_tpu.data import jit_augment
from differential_equations_resnet_tpu.models import (
    build_single_block_resnet,
    cifar10_single_block_config,
)
from differential_equations_resnet_tpu.train.train_step import (
    create_train_state,
    make_adam,
    make_device_epoch,
    make_train_step,
)


def _data(n=256, hw=8, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 256, (n, hw, hw, 3)).astype(np.uint8)
    y = rng.integers(0, 10, (n,)).astype(np.int32)
    return x, y


def _model(hw=8):
    # Equal configs share one wrapper via build_single_block_resnet's value
    # cache, and make_adam() is memoized — so the step builders reuse
    # compiled executables across tests with no local cache.
    import dataclasses

    cfg = cifar10_single_block_config(num_layers=4, num_filters=8)
    return build_single_block_resnet(
        dataclasses.replace(cfg, image_shape=(hw, hw, 3))
    )


# ---------------------------------------------------------------------------
# make_device_epoch
# ---------------------------------------------------------------------------


def test_device_epoch_matches_manual_loop():
    """One device-resident epoch == a manual per-step loop over the same
    permutation and keys (identical gather order, identical numerics)."""
    x, y = _data()
    model = _model()
    tx = make_adam()
    batch, steps = 16, 9
    lrs = jnp.asarray([1e-3 * (0.9 ** i) for i in range(steps)], jnp.float32)
    key = jax.random.key(42)

    epoch = make_device_epoch(model, tx, batch, donate=False)
    s_epoch = create_train_state(model, jax.random.key(0), tx)
    s_epoch, metrics, grad_norms = epoch(s_epoch, jnp.asarray(x), jnp.asarray(y), key, lrs)
    assert metrics["loss"].shape == (steps,)
    assert grad_norms.shape[0] == steps

    # Re-derive the same permutation/keys and replay through the plain step.
    perm_key, aug_key = jax.random.split(key)
    perm = np.asarray(jax.random.permutation(perm_key, len(x)))
    step = make_train_step(model, tx, donate=False)
    s_ref = create_train_state(model, jax.random.key(0), tx)
    losses = []
    for i in range(steps):
        idx = perm[i * batch:(i + 1) * batch]
        s_ref, m, _ = step(
            s_ref, jnp.asarray(x[idx], jnp.float32), jnp.asarray(y[idx]),
            float(lrs[i]),
        )
        losses.append(float(m["loss"]))

    np.testing.assert_allclose(
        np.asarray(metrics["loss"]), np.asarray(losses), rtol=1e-5, atol=1e-6
    )
    for a, b in zip(jax.tree.leaves(s_epoch.params), jax.tree.leaves(s_ref.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )


def test_device_epoch_with_augment_runs_and_differs():
    """Augmentation changes the stream (different loss trajectory) but keeps
    shapes/telemetry intact and is reproducible for a fixed key."""
    x, y = _data()
    model = _model()
    tx = make_adam()
    lrs = jnp.full((6,), 1e-3, jnp.float32)
    aug = jit_augment.standard_cifar_augment(crop_padding=2)

    plain = make_device_epoch(model, tx, 16, donate=False)
    auged = make_device_epoch(model, tx, 16, donate=False, augment=aug)
    s0 = create_train_state(model, jax.random.key(0), tx)
    _, m_plain, _ = plain(s0, jnp.asarray(x), jnp.asarray(y), jax.random.key(1), lrs)
    _, m_aug, _ = auged(s0, jnp.asarray(x), jnp.asarray(y), jax.random.key(1), lrs)
    _, m_aug2, _ = auged(s0, jnp.asarray(x), jnp.asarray(y), jax.random.key(1), lrs)
    assert not np.allclose(np.asarray(m_plain["loss"]), np.asarray(m_aug["loss"]))
    np.testing.assert_array_equal(
        np.asarray(m_aug["loss"]), np.asarray(m_aug2["loss"])
    )


def test_training_device_data_mode(tmp_path):
    """Training(device_data=True): telemetry CSV rows, history, loss
    reduction, and the without-replacement validation error."""
    from differential_equations_resnet_tpu.train.training import Training

    x, y = _data(n=256)
    model = _model()
    trainer = Training(
        model, train_features=x, train_labels=y,
        val_features=x[:64], val_labels=y[:64],
        batch_size=16, csv_logger_dir=str(tmp_path / "csv"),
    )
    history = trainer.train(
        epochs=2, steps_per_epoch=10,
        learning_rate_schedule=lambda s: 3e-3,
        eval_steps=2, summaries_frequency=1,
        device_data=True, verbose=False,
    )
    assert trainer.global_step == 20
    losses = [h["mean_loss"] for h in history["train"]]
    assert losses[-1] < losses[0]
    import os

    csv_dir = str(tmp_path / "csv")
    (train_csv,) = [f for f in os.listdir(csv_dir) if "training" in f]
    rows = np.loadtxt(os.path.join(csv_dir, train_csv), skiprows=1)
    assert rows.shape[0] == 20  # every step logged at frequency 1

    with pytest.raises(ValueError, match="without replacement"):
        trainer.train(
            epochs=1, steps_per_epoch=1000,
            learning_rate_schedule=lambda s: 1e-3,
            eval_frequency=None, device_data=True, verbose=False,
        )
    trainer.close()


# ---------------------------------------------------------------------------
# jit_augment
# ---------------------------------------------------------------------------


def test_flip_is_exact_mirror_or_identity():
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 255, (8, 6, 6, 3)), jnp.float32)
    out = jit_augment.random_flip_left_right(jax.random.key(0), x)
    for i in range(8):
        a, b = np.asarray(out[i]), np.asarray(x[i])
        assert np.array_equal(a, b) or np.array_equal(a, b[:, ::-1])
    # Both branches occur across images for this key size.
    flips = [not np.array_equal(np.asarray(out[i]), np.asarray(x[i])) for i in range(8)]
    assert any(flips) and not all(flips)


def test_brightness_range_and_grid():
    x = jnp.asarray(np.random.default_rng(1).integers(0, 256, (4, 5, 5, 3)), jnp.float32)
    out = np.asarray(jit_augment.random_brightness(jax.random.key(3), x, 0.5))
    assert out.min() >= 0.0 and out.max() <= 255.0
    np.testing.assert_array_equal(out, np.round(out))  # stays on the 0-255 grid


def test_crop_shapes_and_content():
    x = jnp.asarray(np.random.default_rng(2).uniform(0, 255, (4, 10, 10, 3)), jnp.float32)
    out = jit_augment.random_crop(jax.random.key(4), x, scale=0.7)
    assert out.shape == (4, 7, 7, 3)
    padded = jit_augment.pad_random_crop(jax.random.key(5), x, padding=2)
    assert padded.shape == x.shape


def test_saturation_grey_invariant_and_range():
    grey = jnp.full((2, 4, 4, 3), 100.0)
    out = np.asarray(jit_augment.random_saturation(jax.random.key(6), grey))
    np.testing.assert_allclose(out, 100.0, atol=1.0)  # grey has zero saturation
    x = jnp.asarray(np.random.default_rng(3).integers(0, 256, (4, 5, 5, 3)), jnp.float32)
    out = np.asarray(jit_augment.random_saturation(jax.random.key(7), x))
    assert out.min() >= 0.0 and out.max() <= 255.0


def test_saturation_matches_host_hsv_roundtrip():
    """The in-jit HSV round trip agrees with the host preprocessor's NumPy
    implementation on the same images for factor 1 (identity transform)."""
    from differential_equations_resnet_tpu.data.preprocessors import (
        hsv_to_rgb, rgb_to_hsv,
    )

    rng = np.random.default_rng(4)
    x = rng.uniform(0, 1, (3, 6, 6, 3)).astype(np.float32)
    host = hsv_to_rgb(rgb_to_hsv(x))
    dev = np.asarray(jit_augment._hsv_to_rgb(jit_augment._rgb_to_hsv(jnp.asarray(x))))
    np.testing.assert_allclose(dev, host, atol=1e-5)


def test_device_eval_matches_host_eval():
    """make_device_eval's one-dispatch full pass == the host per-batch eval
    path, including the masked ragged final batch."""
    from differential_equations_resnet_tpu.train.training import Training

    x, y = _data(n=250)  # 250 = 15*16 + ragged 10
    model = _model()
    trainer = Training(
        model, train_features=x, train_labels=y,
        val_features=x[:100], val_labels=y[:100],
        batch_size=16, record_summaries=False,
    )
    host = trainer.evaluate("val")          # fresh full pass, host path
    dev = trainer.evaluate("val", device_data=True)
    np.testing.assert_allclose(dev["mean_loss"], host["mean_loss"], rtol=1e-5)
    assert dev["accuracy"] == pytest.approx(host["accuracy"], abs=1e-6)

    # Ragged source (100 = 6*16 + 4): device path masks the tail.
    host_tr = trainer.evaluate("train")
    dev_tr = trainer.evaluate("train", device_data=True)
    # Host 'train' pass drops the remainder batch (the training pipeline
    # uses drop_remainder), device eval covers every example — both must be
    # finite and close on this homogeneous synthetic set.
    assert np.isfinite(dev_tr["mean_loss"]) and np.isfinite(host_tr["mean_loss"])

    with pytest.raises(ValueError, match="full pass"):
        trainer.evaluate("val", num_steps=3, device_data=True)
    trainer.close()


def test_training_device_data_uses_device_eval(tmp_path):
    """train(device_data=True) with full-pass eval_steps routes evaluation
    through the device path (and records identical-semantics metrics)."""
    from differential_equations_resnet_tpu.train.training import Training

    x, y = _data(n=160)
    model = _model()
    trainer = Training(
        model, train_features=x, train_labels=y,
        val_features=x[:50], val_labels=y[:50], batch_size=16,
        record_summaries=False,
    )
    full = -(-50 // 16)
    trainer.train(
        epochs=1, steps_per_epoch=5, eval_steps=full,
        learning_rate_schedule=lambda s: 1e-3,
        device_data=True, verbose=False,
    )
    assert trainer._device_eval_fns  # the device eval actually compiled
    assert np.isfinite(trainer.history["eval"][-1]["mean_loss"])
    trainer.close()


def test_device_epoch_on_dp_mesh_matches_single_device():
    """make_device_epoch under a 4-device data mesh == the unsharded epoch
    on the same key (the replicated dataset is gathered identically; XLA
    inserts the gradient psum)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from differential_equations_resnet_tpu.parallel import create_mesh

    x, y = _data(n=128)
    model = _model()
    tx = make_adam()
    lrs = jnp.full((6,), 1e-3, jnp.float32)
    key = jax.random.key(9)

    single = make_device_epoch(model, tx, 16, donate=False)
    s0 = create_train_state(model, jax.random.key(0), tx)
    s1, m1, g1 = single(s0, jnp.asarray(x), jnp.asarray(y), key, lrs)

    mesh = create_mesh((4,), ("data",))
    rep = NamedSharding(mesh, P())
    sharded = make_device_epoch(model, tx, 16, mesh=mesh, donate=False)
    s0m = jax.tree.map(lambda a: jax.device_put(a, rep), s0)
    s2, m2, g2 = sharded(
        s0m, jax.device_put(jnp.asarray(x), rep),
        jax.device_put(jnp.asarray(y), rep), jax.device_put(key, rep), 
        jax.device_put(lrs, rep),
    )
    np.testing.assert_allclose(
        np.asarray(m2["loss"]), np.asarray(m1["loss"]), rtol=1e-5, atol=1e-6
    )
    for a, b in zip(jax.tree.leaves(s2.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-6
        )
