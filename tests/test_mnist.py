"""MNIST smoke workflow (reference `antisymmetric_conv_kernel.ipynb` cells
8-11): IDX loader round-trip, the simplified-ResNet config on (28, 28, 1),
and a short end-to-end fit + evaluate + predict."""

import gzip
import struct

import numpy as np
import pytest

from differential_equations_resnet_tpu.data.mnist import (
    build_mnist_dataset,
    find_mnist_directory,
    mnist_single_block_config,
    synthetic_mnist,
)
from differential_equations_resnet_tpu.models import build_single_block_resnet
from differential_equations_resnet_tpu.train import Training


def _write_idx_images(path, arr, compress=False):
    header = struct.pack(">IIII", 2051, *arr.shape)
    payload = header + arr.tobytes()
    opener = gzip.open if compress else open
    with opener(str(path) + (".gz" if compress else ""), "wb") as f:
        f.write(payload)


def _write_idx_labels(path, arr, compress=False):
    payload = struct.pack(">II", 2049, len(arr)) + arr.tobytes()
    opener = gzip.open if compress else open
    with opener(str(path) + (".gz" if compress else ""), "wb") as f:
        f.write(payload)


def test_idx_loader_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    tr = np.frombuffer(rng.bytes(20 * 28 * 28), np.uint8).reshape(20, 28, 28)
    te = np.frombuffer(rng.bytes(8 * 28 * 28), np.uint8).reshape(8, 28, 28)
    tr_y = rng.integers(0, 10, 20).astype(np.uint8)
    te_y = rng.integers(0, 10, 8).astype(np.uint8)
    # Train files plain, test files gzipped: both spellings must load.
    _write_idx_images(tmp_path / "train-images-idx3-ubyte", tr)
    _write_idx_labels(tmp_path / "train-labels-idx1-ubyte", tr_y)
    _write_idx_images(tmp_path / "t10k-images-idx3-ubyte", te, compress=True)
    _write_idx_labels(tmp_path / "t10k-labels-idx1-ubyte", te_y, compress=True)

    assert find_mnist_directory(extra=(str(tmp_path),)) == str(tmp_path)
    x1, y1, x2, y2, names = build_mnist_dataset(str(tmp_path))
    assert x1.shape == (20, 28, 28, 1) and x2.shape == (8, 28, 28, 1)
    np.testing.assert_array_equal(x1[:, :, :, 0], tr)
    np.testing.assert_array_equal(x2[:, :, :, 0], te)
    np.testing.assert_array_equal(y1, tr_y)
    np.testing.assert_array_equal(y2, te_y)
    assert names == [str(i) for i in range(10)]


@pytest.mark.slow
def test_mnist_smoke_fit_evaluate_predict():
    """The nb cells 8-11 workflow end-to-end on synthetic MNIST: one short
    fit must beat chance on the (linearly separable) synthetic classes, and
    predict returns per-class probabilities."""
    tr_x, tr_y, te_x, te_y, _ = synthetic_mnist(512, 64, seed=0)
    model = build_single_block_resnet(
        mnist_single_block_config(num_layers=2, num_filters=8)
    )
    assert model.config.image_shape == (28, 28, 1)
    trainer = Training(
        model,
        train_features=tr_x,
        train_labels=tr_y,
        val_features=te_x,
        val_labels=te_y,
        batch_size=32,
    )
    history = trainer.train(
        epochs=8,
        steps_per_epoch=12,
        eval_steps=2,
        eval_frequency=8,
        learning_rate_schedule=lambda step: 3e-3,
        verbose=False,
    )
    losses = [h["mean_loss"] for h in history["train"]]
    assert losses[-1] < losses[0]
    metrics = trainer.evaluate("val")
    assert metrics["accuracy"] > 0.15  # > chance on 10 classes
    probs = np.asarray(trainer.predict(tr_x[:1]))
    assert probs.shape == (1, 10)
    np.testing.assert_allclose(probs.sum(axis=-1), 1.0, rtol=1e-5)
    trainer.close()
