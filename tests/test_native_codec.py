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


def _loader_available():
    from differential_equations_resnet_tpu.native import native_loader_available

    return native_loader_available()


@pytest.mark.skipif(not _loader_available(), reason="native loader unavailable")
def test_native_loader_reads_all_records_once(tmp_path):
    """Non-repeating native loader yields every record exactly once
    (any order — shards are read in parallel)."""
    from differential_equations_resnet_tpu.native import NativeRecordLoader
    from differential_equations_resnet_tpu.data.records import get_record_paths

    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (100, 8, 8, 3), dtype=np.uint8)
    labels = rng.integers(0, 10, (100,)).astype(np.int64)
    RecordGenerator().write_arrays(
        images, labels, str(tmp_path), num_files_per_record=25
    )
    loader = NativeRecordLoader(
        get_record_paths(str(tmp_path)), (8, 8, 3), batch_size=16,
        repeat=False, num_threads=3, seed=1,
    )
    batches = list(loader)
    got_images = np.concatenate([b[0] for b in batches])
    got_labels = np.concatenate([b[1] for b in batches])
    assert got_images.shape == (100, 8, 8, 3)
    key = lambda a, l: sorted(
        zip([bytes(x) for x in a.reshape(len(a), -1)], l.tolist())
    )
    assert key(got_images, got_labels) == key(images, labels)


@pytest.mark.skipif(not _loader_available(), reason="native loader unavailable")
def test_native_loader_repeat_shuffle_and_creator_integration(tmp_path):
    """Repeat mode streams forever; shuffled epochs differ; the
    RecordDatasetCreator.create_native_dataset wrapper composes with
    NumpyDataset transforms."""
    from differential_equations_resnet_tpu.data.records import get_record_paths

    rng = np.random.default_rng(1)
    images = rng.integers(0, 255, (64, 8, 8, 3), dtype=np.uint8)
    labels = np.arange(64, dtype=np.int64) % 10
    RecordGenerator().write_arrays(
        images, labels, str(tmp_path), num_files_per_record=16
    )
    creator = RecordDatasetCreator(
        get_record_paths(str(tmp_path)),
        batch_size=32,
        repeat=True,
        shuffle=True,
        shuffle_buffer_size=64,
        seed=3,
    )
    ds = creator.create_native_dataset((8, 8, 3)).map(
        lambda images_b, labels_b: (images_b.astype(np.float32), labels_b)
    )
    it = iter(ds)
    valid = set(bytes(x) for x in images.reshape(64, -1))
    label_seqs = []
    for _ in range(6):
        bi, bl = next(it)
        assert bi.shape == (32, 8, 8, 3) and bi.dtype == np.float32
        for x in bi.astype(np.uint8).reshape(32, -1):
            assert bytes(x) in valid
        label_seqs.append(tuple(bl.tolist()))
    # Shuffling: the stream is not one fixed repeating order.
    assert len(set(label_seqs)) > 1


@pytest.mark.skipif(not _loader_available(), reason="native loader unavailable")
def test_native_loader_detects_corruption(tmp_path):
    """A flipped payload byte surfaces as a CRC error."""
    from differential_equations_resnet_tpu.native import NativeRecordLoader

    images, labels, *_ = synthetic_cifar10(10, 1, seed=6)
    (path,) = RecordGenerator().write_arrays(
        images, labels.astype(np.int64), str(tmp_path)
    )
    data = bytearray(open(path, "rb").read())
    data[200] ^= 0xFF
    open(path, "wb").write(bytes(data))
    loader = NativeRecordLoader([path], (32, 32, 3), batch_size=4, repeat=False)
    with pytest.raises(ValueError, match="CRC"):
        list(loader)


@pytest.mark.skipif(not _loader_available(), reason="native loader unavailable")
def test_native_loader_rejects_inconsistent_record_header(tmp_path):
    """A record whose header fields exceed the payload bounds must error,
    not read out of bounds (the CRC covers the payload, not the framing)."""
    import struct
    import zlib

    from differential_equations_resnet_tpu.native import NativeRecordLoader

    # Valid container, one malicious record: payload claims data_len=192
    # but carries only the fixed header (no data).
    payload = struct.pack("<IH", 7, 0)                 # label, name_len=0
    payload += struct.pack("<BHHHQ", 0, 8, 8, 3, 192)  # enc, h, w, c, data_len
    record = struct.pack("<QI", len(payload), zlib.crc32(payload)) + payload
    path = tmp_path / "bad.dert"
    path.write_bytes(b"DERT" + struct.pack("<I", 1) + record)

    loader = NativeRecordLoader([str(path)], (8, 8, 3), batch_size=4,
                                repeat=False)
    with pytest.raises(ValueError, match="truncated"):
        list(loader)


@pytest.mark.skipif(not _loader_available(), reason="native loader unavailable")
def test_native_dataset_epoch_semantics_and_order(tmp_path):
    """create_native_dataset honors num_epochs (finite stream) and preserves
    deterministic shard order when shuffle=False."""
    from differential_equations_resnet_tpu.data.records import get_record_paths

    images = np.arange(40 * 4 * 4 * 3, dtype=np.uint8).reshape(40, 4, 4, 3)
    labels = np.arange(40, dtype=np.int64)
    RecordGenerator().write_arrays(
        images, labels, str(tmp_path), num_files_per_record=10
    )
    paths = get_record_paths(str(tmp_path))

    creator = RecordDatasetCreator(
        paths, batch_size=20, repeat=True, num_epochs=2, shuffle=False
    )
    batches = list(creator.create_native_dataset((4, 4, 3)))
    got = np.concatenate([b[1] for b in batches])
    assert got.shape == (80,)  # exactly 2 epochs, then termination
    # shuffle=False: in-order within each pass.
    np.testing.assert_array_equal(got[:40], labels)
    np.testing.assert_array_equal(got[40:], labels)
