"""Data pipeline tests: NumpyDataset semantics, CIFAR-10 loader (against a
synthetic on-disk pickle layout), preprocessors, and record IO roundtrip."""

import os
import pickle

import numpy as np
import pytest

from differential_equations_resnet_tpu.data import (
    ConvertLabelsToOneHot,
    NumpyDataset,
    RandomBrightness,
    RandomCrop,
    RandomFlipLeftRight,
    RandomSaturation,
    RecordDatasetCreator,
    RecordGenerator,
    Resize,
    ResizeWithPad,
    UnpackImagesLabels,
    build_cifar10_dataset,
    create_dataset_from_arrays,
    get_record_paths,
    synthetic_cifar10,
)
from differential_equations_resnet_tpu.data.preprocessors import (
    hsv_to_rgb,
    resize_bilinear,
    rgb_to_hsv,
)
from differential_equations_resnet_tpu.data.records import (
    get_image_class_from_file_name,
)


def test_dataset_map_shuffle_repeat_batch():
    xs = np.arange(10)
    ys = np.arange(10) * 2
    ds = NumpyDataset.from_tensor_slices((xs, ys)).map(lambda x, y: (x + 1, y))
    elems = list(ds)
    assert elems[0] == (1, 0) and elems[-1] == (10, 18)

    batched = list(NumpyDataset.from_tensor_slices((xs, ys)).batch(4))
    assert [b[0].shape[0] for b in batched] == [4, 4, 2]
    dropped = list(NumpyDataset.from_tensor_slices((xs, ys)).batch(4, drop_remainder=True))
    assert len(dropped) == 2

    repeated = list(NumpyDataset.from_tensor_slices(xs).repeat(3))
    assert len(repeated) == 30

    shuffled = [int(x) for x in NumpyDataset.from_tensor_slices(xs).shuffle(10, seed=0)]
    assert sorted(shuffled) == list(range(10))

    sharded = [int(x) for x in NumpyDataset.from_tensor_slices(xs).shard(2, 1)]
    assert sharded == [1, 3, 5, 7, 9]


def test_dataset_prefetch_matches_and_propagates_errors():
    xs = np.arange(100)
    plain = [int(x) for x in NumpyDataset.from_tensor_slices(xs)]
    prefetched = [int(x) for x in NumpyDataset.from_tensor_slices(xs).prefetch(4)]
    assert plain == prefetched

    def bad_gen():
        yield 1
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        list(NumpyDataset.from_generator(bad_gen).prefetch(2))


def test_create_dataset_from_arrays_pipeline():
    images, labels, *_ = synthetic_cifar10(64, 8, seed=1)
    ds = create_dataset_from_arrays(
        images,
        labels,
        batch_size=16,
        preprocessors=[ConvertLabelsToOneHot(10)],
        shuffle=True,
        repeat=True,
        seed=3,
    )
    it = iter(ds)
    xb, yb = next(it)
    assert xb.shape == (16, 32, 32, 3)
    assert yb.shape == (16, 10)
    np.testing.assert_allclose(yb.sum(-1), 1.0)


def test_cifar10_loader_roundtrip(tmp_path):
    """Write the CIFAR-10 pickle layout and check loader semantics (CHW row
    unpacking -> NHWC) against the reference formulas."""
    rng = np.random.default_rng(0)
    rows = 1000  # per-shard row count is free in the loader (reshape(-1, ...))
    for i in range(1, 6):
        data = np.frombuffer(rng.bytes(rows * 3072), np.uint8).reshape(rows, 3072)
        with open(tmp_path / f"data_batch_{i}", "wb") as f:
            pickle.dump({b"data": data, b"labels": list(rng.integers(0, 10, rows))}, f)
    test_data = np.frombuffer(rng.bytes(rows * 3072), np.uint8).reshape(rows, 3072)
    with open(tmp_path / "test_batch", "wb") as f:
        pickle.dump({b"data": test_data, b"labels": list(rng.integers(0, 10, rows))}, f)
    with open(tmp_path / "batches.meta", "wb") as f:
        pickle.dump({b"label_names": [f"c{i}".encode() for i in range(10)]}, f)

    tr_x, tr_y, te_x, te_y, names = build_cifar10_dataset(str(tmp_path))
    assert tr_x.shape == (5 * rows, 32, 32, 3) and te_x.shape == (rows, 32, 32, 3)
    assert names == [f"c{i}" for i in range(10)]
    # First pixel of first test image: row-major CHW packing.
    np.testing.assert_array_equal(
        te_x[0, 0, 0], [test_data[0, 0], test_data[0, 1024], test_data[0, 2048]]
    )


def test_preprocessor_chain_on_dict_elements():
    images = np.random.default_rng(0).integers(0, 256, (8, 16, 16, 3), dtype=np.int64).astype(np.uint8)
    labels = np.arange(8) % 3
    ds = NumpyDataset.from_tensor_slices({"image": images, "label": labels})
    ds = UnpackImagesLabels()(ds)
    ds = RandomFlipLeftRight(seed=0)(ds)
    ds = RandomCrop(scale=0.5, seed=0)(ds)
    ds = Resize((16, 16))(ds)
    ds = RandomBrightness(0.1, seed=0)(ds)
    ds = ConvertLabelsToOneHot(3)(ds)
    img, one_hot = next(iter(ds))
    assert img.shape == (16, 16, 3)
    assert one_hot.shape == (3,)


def test_resize_bilinear_identity_and_downscale():
    img = np.arange(16, dtype=np.float32).reshape(4, 4, 1)
    np.testing.assert_allclose(resize_bilinear(img, (4, 4)), img)
    half = resize_bilinear(img, (2, 2))
    assert half.shape == (2, 2, 1)
    np.testing.assert_allclose(half[0, 0, 0], img[0, 0, 0])


def test_resize_with_pad_centers():
    img = np.full((4, 8, 3), 255, dtype=np.uint8)
    ds = NumpyDataset.from_tensor_slices(([img], np.array([0])))
    out, _ = next(iter(ResizeWithPad((8, 8))(ds)))
    assert out.shape == (8, 8, 3)
    assert out[:2].sum() == 0 and out[-2:].sum() == 0  # vertical padding
    assert out[3].sum() > 0


def test_hsv_roundtrip_and_saturation():
    rng = np.random.default_rng(0)
    rgb = rng.random((5, 5, 3)).astype(np.float64)
    np.testing.assert_allclose(hsv_to_rgb(rgb_to_hsv(rgb)), rgb, atol=1e-6)
    ds = NumpyDataset.from_tensor_slices(
        ([np.uint8(rgb * 255)], np.array([0]))
    )
    out, _ = next(iter(RandomSaturation(0.0, 0.0, seed=0)(ds)))
    # Factor 0 desaturates: all channels equal.
    assert np.ptp(out, axis=-1).max() <= 1


def test_record_roundtrip_raw_arrays(tmp_path):
    images, labels, *_ = synthetic_cifar10(25, 1, seed=2)
    gen = RecordGenerator()
    paths = gen.write_arrays(images, labels, str(tmp_path), num_files_per_record=10)
    assert len(paths) == 3
    assert get_record_paths(str(tmp_path)) == sorted(paths)

    creator = RecordDatasetCreator(
        paths,
        batch_size=None,
        preprocessors=[UnpackImagesLabels()],
        repeat=False,
        shuffle=False,
    )
    out = list(creator.create_dataset())
    assert len(out) == 25
    got_images = np.stack([img for img, _ in out])
    got_labels = np.array([label for _, label in out])
    # File order is deterministic without shuffle.
    np.testing.assert_array_equal(got_images, images)
    np.testing.assert_array_equal(got_labels, labels)


def test_record_crc_detects_corruption(tmp_path):
    images, labels, *_ = synthetic_cifar10(4, 1, seed=3)
    paths = RecordGenerator().write_arrays(images, labels, str(tmp_path))
    with open(paths[0], "r+b") as f:
        f.seek(64)
        f.write(b"\xff\xff\xff\xff")
    creator = RecordDatasetCreator(paths, batch_size=None, repeat=False, shuffle=False)
    with pytest.raises(ValueError, match="CRC|corrupt|truncated"):
        list(creator.create_dataset())


def test_record_batched_shuffled_pipeline(tmp_path):
    images, labels, *_ = synthetic_cifar10(40, 1, seed=4)
    paths = RecordGenerator().write_arrays(
        images, labels, str(tmp_path), num_files_per_record=20
    )
    creator = RecordDatasetCreator(
        paths,
        batch_size=8,
        preprocessors=[UnpackImagesLabels(), ConvertLabelsToOneHot(10)],
        repeat=True,
        num_epochs=2,
        shuffle=True,
        shuffle_buffer_size=16,
        prefetch=2,
        seed=0,
    )
    batches = list(creator.create_generator())
    assert batches[0][0].shape == (8, 32, 32, 3)
    assert sum(b[0].shape[0] for b in batches) == 80


def test_record_creator_validation(tmp_path):
    with pytest.raises(ValueError):
        RecordDatasetCreator([], batch_size=1)
    with pytest.raises(ValueError):
        RecordDatasetCreator(["a", "a"], batch_size=1)
    with pytest.raises(ValueError):
        RecordDatasetCreator(["a"], batch_size=1, shuffle=True, shuffle_buffer_size=None)


def test_image_class_from_file_name():
    assert get_image_class_from_file_name("/x/y/007_cat.jpg") == 7
