"""Native C++ DERT codec: build, roundtrip, cross-compatibility with the
Python codec, and corruption detection."""

import numpy as np
import pytest

from differential_equations_resnet_tpu.data import (
    RecordDatasetCreator,
    RecordGenerator,
    UnpackImagesLabels,
    synthetic_cifar10,
)
from differential_equations_resnet_tpu.data.records import read_record_file
from differential_equations_resnet_tpu.native.codec import (
    count_records,
    native_codec_available,
    read_raw_shard,
    write_raw_shard,
)

pytestmark = pytest.mark.skipif(
    not native_codec_available(), reason="g++ unavailable; native codec not built"
)


def test_native_roundtrip(tmp_path):
    images, labels, *_ = synthetic_cifar10(17, 1, seed=0)
    path = str(tmp_path / "shard.dert")
    assert write_raw_shard(path, images, labels)
    assert count_records(path) == 17
    got_images, got_labels = read_raw_shard(path, (32, 32, 3))
    np.testing.assert_array_equal(got_images, images)
    np.testing.assert_array_equal(got_labels, labels)


def test_native_write_python_read(tmp_path):
    """A native-written shard must parse with the pure-Python codec
    (same framing, same CRC)."""
    images, labels, *_ = synthetic_cifar10(5, 1, seed=1)
    path = str(tmp_path / "shard.dert")
    write_raw_shard(path, images, labels)
    records = list(read_record_file(path))
    assert len(records) == 5
    np.testing.assert_array_equal(records[3]["image"], images[3])
    assert records[3]["label"] == labels[3]


def test_python_write_native_read(tmp_path):
    images, labels, *_ = synthetic_cifar10(7, 1, seed=2)
    gen = RecordGenerator()
    paths = gen.write_arrays(
        images, labels, str(tmp_path), use_native=False, num_files_per_record=100
    )
    got_images, got_labels = read_raw_shard(paths[0], (32, 32, 3))
    np.testing.assert_array_equal(got_images, images)
    np.testing.assert_array_equal(got_labels, labels)


def test_native_crc_detection(tmp_path):
    images, labels, *_ = synthetic_cifar10(3, 1, seed=3)
    path = str(tmp_path / "shard.dert")
    write_raw_shard(path, images, labels)
    with open(path, "r+b") as f:
        f.seek(200)
        f.write(b"\x00\x01\x02\x03")
    with pytest.raises(ValueError, match="CRC"):
        read_raw_shard(path, (32, 32, 3))


def test_creator_uses_native_path(tmp_path):
    """End-to-end: RecordDatasetCreator over native-written shards."""
    images, labels, *_ = synthetic_cifar10(30, 1, seed=4)
    paths = RecordGenerator().write_arrays(
        images, labels, str(tmp_path), num_files_per_record=10
    )
    creator = RecordDatasetCreator(
        paths,
        batch_size=None,
        preprocessors=[UnpackImagesLabels()],
        repeat=False,
        shuffle=False,
    )
    out = list(creator.create_dataset())
    assert len(out) == 30
    np.testing.assert_array_equal(np.stack([i for i, _ in out]), images)
