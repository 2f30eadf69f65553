"""Lightweight profiling: per-stage wall timers + the canonical scan log.

Replaces the reference's inline timing prints (per-align "msec + fitness",
``ndt_rosbag_mapping_node.cpp:127-133``; per-frame ms,
``loam_mapping_node.cpp:624-626``; 1x/10x benchmark, ``align.cpp:20-30``)
with a structured timer that blocks on device results and can feed the
JSONL metrics sink. For deep traces use ``jax.profiler`` directly.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager

import jax


class StageTimer:
    """Accumulating named wall timers with device synchronization."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextmanager
    def stage(self, name: str, result_holder=None):
        t0 = time.perf_counter()
        yield
        if result_holder is not None:
            jax.block_until_ready(result_holder)
        dt = time.perf_counter() - t0
        self.totals[name] += dt
        self.counts[name] += 1

    def time(self, name: str, fn, *args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        self.totals[name] += dt
        self.counts[name] += 1
        return out

    def summary(self):
        return {
            name: {
                "total_ms": self.totals[name] * 1e3,
                "count": self.counts[name],
                "avg_ms": self.totals[name] / max(self.counts[name], 1) * 1e3,
            }
            for name in self.totals
        }

    def scan_log_line(self, scan_idx: int, msec: float, fitness: float) -> str:
        """The reference's canonical per-scan line format."""
        return f"align: {msec:.3f} msec, fitness: {fitness:.6f} (scan {scan_idx})"


def bench_1x_10x(fn, *args):
    """align.cpp-style single + 10x timing; returns (single_ms, ten_ms, out).

    CAUTION (measured on the v5e runtime): repeated dispatches of the same
    executable with unchanged inputs can be elided, and the first timed run
    after a single warmup is inflated several-fold. This helper mirrors the
    reference's naive loop for parity; for honest numbers put repetitions
    inside one ``lax.scan`` with per-iteration distinct inputs and warm the
    timed program at least twice (see ``bench.py``)."""
    out = fn(*args)
    jax.block_until_ready(out)
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    single = (time.perf_counter() - t0) * 1e3
    t0 = time.perf_counter()
    for _ in range(10):
        out = fn(*args)
    jax.block_until_ready(out)
    ten = (time.perf_counter() - t0) * 1e3
    return single, ten, out
