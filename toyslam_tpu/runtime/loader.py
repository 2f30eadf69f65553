"""Host-side scan loader: threaded directory ingest + device prefetch.

Capability port of the reference's host IO layer: PCD directory watching
(``ndt_omp_mapping_node.cpp:72-136`` — hot-reload of new ``cloud_N.pcd``
files), rosbag-style sequential replay (``ndt_rosbag_mapping_node.cpp:
27-78``), and scan persistence (``lidar_subscriber_node.cpp:35-54``).

TPU design: decode on a thread pool (the native LZF/extract helpers release
the GIL), pack into fixed-capacity padded stacks, and double-buffer
``jax.device_put`` so the device never waits on the host — the framework's
replacement for ROS topic delivery (SURVEY §5).
"""

from __future__ import annotations

import re
import threading
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from queue import Queue
from typing import Iterator

import numpy as np

from toyslam_tpu.core import pcd_io
from toyslam_tpu.runtime import native
from toyslam_tpu.core.pointcloud import PAD_COORD


def _numeric_key(path: Path):
    m = re.findall(r"\d+", path.stem)
    return (int(m[-1]) if m else 0, path.stem)


def list_scan_files(directory: str | Path, pattern: str = "*.pcd"):
    """Numerically-sorted scan files (reference sorts cloud_N.pcd by N,
    ``ndt_omp_node.cpp`` load_pointclouds)."""
    return sorted(Path(directory).glob(pattern), key=_numeric_key)


def pack_scan(points: np.ndarray, capacity: int):
    """[n, 4] -> padded (xyzi [capacity, 4], mask [capacity])."""
    xyzi = np.full((capacity, 4), PAD_COORD, np.float32)
    xyzi[:, 3] = 0.0
    k = min(len(points), capacity)
    xyzi[:k] = points[:k]
    mask = np.zeros((capacity,), bool)
    mask[:k] = np.isfinite(points[:k, :3]).all(axis=1)
    return xyzi, mask


def load_scan_stack(paths, capacity: int, workers: int = 8):
    """Decode many PCDs in parallel into one [S, capacity, 4] stack.

    Uses the native pthread pack (native/scanpack.c) when available; the
    Python thread-pool fallback below is differential-tested against it."""
    paths = list(paths)
    packed = native.pack_scans(paths, capacity, workers)
    if packed is not None:
        return packed
    xyzi = np.full((len(paths), capacity, 4), PAD_COORD, np.float32)
    xyzi[..., 3] = 0.0
    mask = np.zeros((len(paths), capacity), bool)

    def one(i_path):
        i, path = i_path
        pts = pcd_io.read_pcd(path)
        xyzi[i], mask[i] = pack_scan(pts, capacity)

    with ThreadPoolExecutor(max_workers=workers) as ex:
        list(ex.map(one, enumerate(paths)))
    return xyzi, mask


class ScanStream:
    """Double-buffered host->device scan feed.

    Iterates (xyzi, mask) device arrays; decode and H2D transfer of scan
    i+1 overlap with compute on scan i.
    """

    def __init__(self, paths, capacity: int, device=None, prefetch: int = 2):
        self.paths = list(paths)
        self.capacity = capacity
        self.device = device
        self.queue: Queue = Queue(maxsize=prefetch)
        self.thread = threading.Thread(target=self._producer, daemon=True)
        self.thread.start()

    def _producer(self):
        import jax

        for path in self.paths:
            pts = pcd_io.read_pcd(path)
            xyzi, mask = pack_scan(pts, self.capacity)
            buf = (jax.device_put(xyzi, self.device),
                   jax.device_put(mask, self.device))
            self.queue.put(buf)
        self.queue.put(None)

    def __iter__(self) -> Iterator:
        while True:
            item = self.queue.get()
            if item is None:
                return
            yield item


class DirectoryWatcher:
    """Poll a directory for new scans (ndt_omp_mapping_node's 1 Hz tick,
    ``:72-108``): each call to ``poll()`` returns newly-appeared files."""

    def __init__(self, directory: str | Path, pattern: str = "*.pcd"):
        self.directory = Path(directory)
        self.pattern = pattern
        self.seen: set = set()

    def poll(self):
        fresh = []
        for p in list_scan_files(self.directory, self.pattern):
            if p not in self.seen:
                self.seen.add(p)
                fresh.append(p)
        return fresh
