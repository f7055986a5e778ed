"""Vectorized (whole-batch) augmentation tests: apply_batch must agree with
the per-element preprocessor semantics, the arrays pipeline must take the
batched path, and pipeline throughput must exceed device demand (~9k img/s
at the headline 273 steps/s x batch 32)."""

import time

import numpy as np
import pytest

from differential_equations_resnet_tpu.data.pipeline import (
    create_dataset_from_arrays,
)
from differential_equations_resnet_tpu.data.preprocessors import (
    ConvertLabelsToOneHot,
    RandomBrightness,
    RandomCrop,
    RandomFlipLeftRight,
    RandomSaturation,
    Resize,
    ResizeWithPad,
    resize_bilinear,
    resize_bilinear_batch,
)


def _batch(n=16, h=12, w=10, c=3, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.integers(0, 256, (n, h, w, c), dtype=np.uint8)
    labels = rng.integers(0, 7, (n,), dtype=np.int64)
    return images, labels


def test_one_hot_batch_matches_elementwise():
    images, labels = _batch()
    _, one_hot = ConvertLabelsToOneHot(7).apply_batch(images, labels)
    assert one_hot.shape == (16, 7)
    np.testing.assert_array_equal(one_hot.argmax(-1), labels)
    np.testing.assert_allclose(one_hot.sum(-1), 1.0)


def test_resize_batch_matches_elementwise():
    images, labels = _batch()
    out, _ = Resize((8, 9)).apply_batch(images, labels)
    expected = np.stack([resize_bilinear(im, (8, 9)) for im in images])
    np.testing.assert_allclose(out, expected, rtol=1e-6, atol=1e-5)


def test_resize_with_pad_batch_matches_elementwise():
    images, labels = _batch()
    pad = ResizeWithPad((16, 16))
    out, _ = pad.apply_batch(images, labels)
    # Reproduce the per-element path through the dataset transform.
    from differential_equations_resnet_tpu.data.pipeline import NumpyDataset

    per_elem = list(
        pad(NumpyDataset.from_tensor_slices((images, labels)))
    )
    expected = np.stack([e[0] for e in per_elem])
    np.testing.assert_allclose(out, expected, rtol=1e-6, atol=1e-5)


def test_random_flip_batch_per_image():
    images, labels = _batch(n=64)
    out, _ = RandomFlipLeftRight(seed=0).apply_batch(images, labels)
    flipped = kept = 0
    for i in range(len(images)):
        if np.array_equal(out[i], images[i][:, ::-1]):
            flipped += 1
        elif np.array_equal(out[i], images[i]):
            kept += 1
    assert flipped + kept == 64
    assert flipped > 10 and kept > 10  # per-image randomness, not per-batch


def test_random_crop_batch_shapes_and_content():
    images, labels = _batch(n=32, h=12, w=10)
    out, _ = RandomCrop(scale=0.5, seed=0).apply_batch(images, labels)
    side = int(10 * 0.5)
    assert out.shape == (32, side, side, 3)
    # Every crop must be an actual window of its source image.
    offsets = set()
    for i in range(32):
        found = False
        for top in range(12 - side + 1):
            for left in range(10 - side + 1):
                if np.array_equal(
                    out[i], images[i, top : top + side, left : left + side]
                ):
                    offsets.add((top, left))
                    found = True
        assert found, f"crop {i} is not a window of image {i}"
    assert len(offsets) > 3  # offsets drawn per image


def test_random_brightness_batch_per_image_delta():
    images, labels = _batch(n=8)
    unit = images.astype(np.float32) / 255.0
    out, _ = RandomBrightness(max_delta=0.3, seed=1).apply_batch(images, labels)
    deltas = []
    for i in range(8):
        d = out[i].astype(np.float32) / 255.0 - unit[i]
        interior = (unit[i] > 0.35) & (unit[i] < 0.65)  # un-clipped pixels
        if interior.sum() > 10:
            vals = d[interior]
            assert vals.std() < 0.01  # constant shift per image (quantized)
            deltas.append(vals.mean())
    assert np.std(deltas) > 0.01  # different deltas across images


def test_random_saturation_batch_valid():
    images, labels = _batch(n=8)
    out, _ = RandomSaturation(0.5, 1.5, seed=2).apply_batch(images, labels)
    assert out.shape == images.shape and out.dtype == images.dtype
    # Value channel (max over RGB) is invariant under saturation scaling.
    np.testing.assert_allclose(
        out.max(axis=-1).astype(np.int64),
        images.max(axis=-1).astype(np.int64),
        atol=2,
    )


def test_pipeline_uses_batched_path_with_augmentation():
    images, labels = _batch(n=64, h=8, w=8)
    ds = create_dataset_from_arrays(
        images, labels, batch_size=16,
        preprocessors=[RandomFlipLeftRight(seed=0), RandomBrightness(0.2, seed=0)],
        shuffle=True, repeat=False, seed=0,
    )
    batches = list(ds)
    assert len(batches) == 4
    assert batches[0][0].shape == (16, 8, 8, 3)
    assert batches[0][1].shape == (16,)


def test_pipeline_falls_back_without_apply_batch():
    class Opaque:
        def __call__(self, dataset):
            return dataset.map(lambda x, y: (x, y))

    images, labels = _batch(n=32, h=8, w=8)
    ds = create_dataset_from_arrays(
        images, labels, batch_size=8, preprocessors=[Opaque()],
        shuffle=False, repeat=False,
    )
    assert len(list(ds)) == 4


def test_augmented_pipeline_throughput_exceeds_device_demand():
    """The batched path must sustain well above the ~9k img/s the TPU
    consumes at headline throughput (273 steps/s x b32)."""
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (4096, 32, 32, 3), dtype=np.uint8)
    labels = rng.integers(0, 10, (4096,), dtype=np.int64)
    ds = create_dataset_from_arrays(
        images, labels, batch_size=32,
        preprocessors=[
            RandomFlipLeftRight(seed=0),
            RandomBrightness(0.25, seed=0),
            ConvertLabelsToOneHot(10),
        ],
        shuffle=True, repeat=True, seed=0,
    )
    it = iter(ds)
    for _ in range(16):  # warm the prefetch thread
        next(it)
    n_batches = 512
    start = time.perf_counter()
    for _ in range(n_batches):
        next(it)
    elapsed = time.perf_counter() - start
    rate = n_batches * 32 / elapsed
    assert rate > 9_000, f"augmented pipeline too slow: {rate:.0f} img/s"
