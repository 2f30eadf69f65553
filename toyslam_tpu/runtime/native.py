"""ctypes bindings to the native host runtime (native/libpcdio.so).

Builds the library on first use if the toolchain is available; all entry
points degrade gracefully to pure-Python fallbacks.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libpcdio.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        # Always invoke make: its dependency check is a no-op when the .so
        # is fresh, and this guarantees source edits are never shadowed by
        # a stale binary. The .so itself is gitignored, not committed.
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True)
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.lzf_decompress.restype = ctypes.c_long
        lib.lzf_decompress.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ]
        lib.extract_xyzi.restype = ctypes.c_long
        lib.extract_xyzi.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long, ctypes.c_long,
            ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.extract_xyzi_soa.restype = ctypes.c_long
        lib.extract_xyzi_soa.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
            ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.pack_scans.restype = ctypes.c_long
        lib.pack_scans.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_long, ctypes.c_long,
            ctypes.c_long, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_long),
        ]
        lib.lz4f_decompress.restype = ctypes.c_long
        lib.lz4f_decompress.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ]
        lib.bag_pack_scans.restype = ctypes.c_long
        # First arg is c_char_p so a Python bytes object passes zero-copy
        # (the C side only reads it); the out pointers accept None for
        # the count-only pass.
        lib.bag_pack_scans.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_char_p,
            ctypes.c_long, ctypes.c_long, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_long),
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def lzf_decompress(src: bytes, expected_len: int) -> bytes | None:
    """Native LZF decompression; None if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    out = (ctypes.c_uint8 * expected_len)()
    n = lib.lzf_decompress(src, len(src), out, expected_len)
    if n < 0:
        raise ValueError("corrupt LZF stream")
    return bytes(out[:n])


def lz4f_decompress(src: bytes, capacity: int) -> bytes | None:
    """Native LZ4-frame decode (native/bagpack.c); None if the native lib
    is unavailable. ``capacity`` bounds the decoded size; raises on
    malformed frames or overflow — byte-identical to
    ``runtime.lz4f.decompress`` (differential-tested in
    tests/test_lz4.py)."""
    lib = _load()
    if lib is None:
        return None
    out = (ctypes.c_uint8 * max(capacity, 1))()
    n = lib.lz4f_decompress(src, len(src), out, capacity)
    if n < 0:
        raise ValueError("corrupt LZ4 frame")
    return bytes(out[:n])


def extract_xyzi(data: bytes, n_points: int, record_size: int,
                 x_off: int, y_off: int, z_off: int, i_off: int):
    """Fused AoS field extraction -> float32 [n, 4]; None if unavailable."""
    import numpy as np

    lib = _load()
    if lib is None:
        return None
    out = np.empty((n_points, 4), np.float32)
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    lib.extract_xyzi(buf, n_points, record_size, x_off, y_off, z_off, i_off,
                     out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def bag_pack_scans(buf: bytes, topic: str, max_scans: int, capacity: int):
    """Native one-pass ROS bag parse -> packed device layout.

    Parses every sensor_msgs/PointCloud2 on `topic` (none/bz2/lz4 chunks)
    straight into the [S, capacity, 4] float32 + [S, capacity] mask
    layout (native/bagpack.c). Returns (xyzi, mask, times [S] f64,
    counts [S] i64, n_scans) or None when the native library is
    unavailable (caller falls back to the Python reader). Raises on
    malformed bags — matching the Python reader's struct errors.
    """
    import numpy as np

    lib = _load()
    if lib is None:
        return None
    xyzi = np.empty((max_scans, capacity, 4), np.float32)
    mask = np.zeros((max_scans, capacity), np.uint8)
    times = np.zeros((max_scans,), np.float64)
    counts = np.zeros((max_scans,), np.int64)
    n = lib.bag_pack_scans(
        buf, len(buf), topic.encode(), max_scans, capacity,
        xyzi.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        times.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_long)))
    if n < 0:
        raise ValueError(f"malformed or unsupported ROS bag (code {n})")
    return xyzi, mask.astype(bool), times, counts, int(n)


def bag_count_scans(buf: bytes, topic: str):
    """Native count-only pass: matching PointCloud2 messages on `topic`
    (framing + connection filtering, no decode — used to size the packed
    buffers before the real parse). Returns the count, or None when the
    native library is unavailable. Raises on malformed bags."""
    lib = _load()
    if lib is None:
        return None
    n = lib.bag_pack_scans(buf, len(buf), topic.encode(),
                           (1 << 62), 0, None, None, None, None)
    if n < 0:
        raise ValueError(f"malformed or unsupported ROS bag (code {n})")
    return int(n)


def pack_scans(paths, capacity: int, n_threads: int | None = None):
    """Threaded native batch PCD parse + pack.

    Returns (xyzi [S, capacity, 4] float32, mask [S, capacity] bool) or
    None if the native library is unavailable or any file failed (caller
    falls back to the Python path).
    """
    import numpy as np

    lib = _load()
    if lib is None:
        return None
    if n_threads is None:
        import os
        n_threads = min(os.cpu_count() or 1, 16)
    paths = [str(p) for p in paths]
    S = len(paths)
    arr = (ctypes.c_char_p * S)(*[p.encode() for p in paths])
    xyzi = np.empty((S, capacity, 4), np.float32)
    mask = np.zeros((S, capacity), np.uint8)
    counts = np.zeros((S,), np.int64)
    rc = lib.pack_scans(
        arr, S, capacity, n_threads,
        xyzi.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_long)))
    if rc != 0:
        return None
    return xyzi, mask.astype(bool)
