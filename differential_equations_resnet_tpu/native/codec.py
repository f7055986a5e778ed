"""ctypes bindings for the native DERT record codec (dert_codec.cc).

Compiled on demand with g++ (cached next to the source); all entry points
degrade gracefully to the pure-Python codec in records.py when no compiler
is available, so the framework works everywhere and is merely faster where
the native library builds.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SOURCE = os.path.join(_DIR, "dert_codec.cc")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _lib_path() -> str:
    """Build-cache path keyed on the source content hash (mtimes are
    arbitrary after a git clone — see loader.py)."""
    with open(_SOURCE, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:12]
    return os.path.join(_DIR, f"libdert-{digest}.so")

_ERROR_NAMES = {
    -1: "open failed",
    -2: "bad magic",
    -3: "unsupported version",
    -4: "truncated record",
    -5: "CRC mismatch (corrupt record)",
    -6: "shape mismatch",
    -7: "non-raw encoding",
    -8: "write failed",
}


def _build(lib_path: str) -> bool:
    """Compile to a temp file then atomically rename into place (concurrent
    builders must never CDLL a half-written .so)."""
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_DIR)
    os.close(fd)
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SOURCE, "-o", tmp],
            check=True,
            capture_output=True,
            timeout=120,
        )
        os.rename(tmp, lib_path)
        return True
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        try:
            lib_path = _lib_path()
        except OSError:
            _load_failed = True
            return None
        if not os.path.exists(lib_path):
            if not _build(lib_path):
                _load_failed = True
                return None
        try:
            lib = ctypes.CDLL(lib_path)
        except OSError:
            _load_failed = True
            return None
        lib.dert_count.restype = ctypes.c_int64
        lib.dert_count.argtypes = [ctypes.c_char_p]
        lib.dert_read_raw.restype = ctypes.c_int64
        lib.dert_read_raw.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
        ]
        lib.dert_write_raw.restype = ctypes.c_int64
        lib.dert_write_raw.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
        ]
        _lib = lib
        return _lib


def native_codec_available() -> bool:
    return _load() is not None


def count_records(path: str) -> int:
    lib = _load()
    if lib is None:
        raise RuntimeError("native codec unavailable")
    n = lib.dert_count(path.encode())
    if n < 0:
        raise ValueError(f"{path}: {_ERROR_NAMES.get(n, n)}")
    return int(n)


def read_raw_shard(
    path: str, shape: Tuple[int, int, int], verify_crc: bool = True
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Bulk-read a shard of fixed-shape raw records.

    Returns (images (N, h, w, c) uint8, labels (N,) int64), or None when the
    native codec is unavailable.  Raises ValueError on corrupt shards and on
    shards containing non-raw / differently-shaped records (callers fall back
    to the Python codec for those)."""
    lib = _load()
    if lib is None:
        return None
    h, w, c = shape
    n = lib.dert_count(path.encode())
    if n < 0:
        raise ValueError(f"{path}: {_ERROR_NAMES.get(n, n)}")
    images = np.empty((n, h, w, c), dtype=np.uint8)
    labels = np.empty((n,), dtype=np.int64)
    got = lib.dert_read_raw(
        path.encode(),
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        h,
        w,
        c,
        1 if verify_crc else 0,
    )
    if got < 0:
        raise ValueError(f"{path}: {_ERROR_NAMES.get(got, got)}")
    return images[:got], labels[:got]


def write_raw_shard(path: str, images: np.ndarray, labels: np.ndarray) -> bool:
    """Write one shard of raw fixed-shape records.  Returns False when the
    native codec is unavailable (callers fall back to the Python writer)."""
    lib = _load()
    if lib is None:
        return False
    images = np.ascontiguousarray(images, dtype=np.uint8)
    labels = np.ascontiguousarray(labels, dtype=np.int64)
    n, h, w, c = images.shape
    wrote = lib.dert_write_raw(
        path.encode(),
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        h,
        w,
        c,
    )
    if wrote < 0:
        raise ValueError(f"{path}: {_ERROR_NAMES.get(wrote, wrote)}")
    return True
