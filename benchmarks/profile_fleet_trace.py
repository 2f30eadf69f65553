#!/usr/bin/env python
"""Trace the 64-way fleet program and print top device fusions by self time.

Round-3 attributed ~63% of the fleet to batched stats gathers at
26 ns/row, but an isolated batched gather of the same shape measures
8.3 ns/row (profile_gather_modes.py) — so the cost must sit elsewhere in
those fusions. This dumps the actual per-fusion self time of the real
fleet program to settle it.

Usage: python benchmarks/profile_fleet_trace.py [--S 4] [--flat]
"""

import sys
sys.path.insert(0, "/root/repo")

import argparse
import glob
import gzip
import json
import os
from collections import defaultdict

import numpy as np


def build_inputs(target_np, B, S, cap, R):
    rng = np.random.default_rng(1)
    base = target_np[
        rng.choice(len(target_np), cap, replace=False)].astype(np.float32)
    xyzi = np.zeros((B, S, cap, 4), np.float32)
    for b in range(B):
        for s in range(S):
            pts = base.copy()
            pts[:, 0] += 0.3 * s + 0.01 * b
            pts[:, 1] += 0.1 * s
            xyzi[b, s] = pts
    mask = np.ones((B, S, cap), bool)
    imu_acc = np.tile(np.asarray([0.0, 0.0, 9.81], np.float32), (B, S * R, 1))
    imu_gyro = np.zeros((B, S * R, 3), np.float32)
    imu_dt = np.full((B, S * R), 0.005, np.float32)
    return xyzi, mask, imu_acc, imu_gyro, imu_dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=64)
    ap.add_argument("--S", type=int, default=4)
    ap.add_argument("--cap", type=int, default=16384)
    ap.add_argument("--flat", action="store_true")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from toyslam_tpu.core import pcd_io
    from toyslam_tpu.ops import gatherflat
    from toyslam_tpu.pipelines import fusion as fus
    from toyslam_tpu.pipelines import odometry as odo

    target_np = pcd_io.read_pcd("/root/reference/ndt_omp/data/251370668.pcd")
    B, S, R, cap = args.B, args.S, 20, args.cap
    xyzi, mask, imu_acc, imu_gyro, imu_dt = build_inputs(
        target_np, B, S, cap, R)

    cfg = fus.FusionConfig(
        odometry=odo.OdometryConfig(work_capacity=8192), imu_per_scan=R)

    with gatherflat.flatten_batched(args.flat):
        batched = jax.jit(
            jax.vmap(lambda *a: fus.ndt_eskf_fusion(*a, config=cfg)))
        rest = tuple(map(jax.device_put, (jnp.asarray(mask),
                                          jnp.asarray(imu_acc),
                                          jnp.asarray(imu_gyro),
                                          jnp.asarray(imu_dt))))
        x0 = jax.device_put(jnp.asarray(xyzi))
        out = batched(x0, *rest)
        jax.block_until_ready(out)

        trace_dir = "/tmp/fleet_trace"
        os.system(f"rm -rf {trace_dir}")
        with jax.profiler.trace(trace_dir):
            x1 = jax.device_put(jnp.asarray(xyzi + np.float32(1e-3)))
            out = batched(x1, *rest)
            jax.block_until_ready(out)

    # Parse the perfetto trace: aggregate device-track event durations.
    paths = glob.glob(
        f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("NO TRACE FILES under", trace_dir)
        return
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device tracks: pid names containing "TPU" / "Device"
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "Device" in n or "/device" in n.lower()}
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        tname = tid_names.get((e["pid"], e["tid"]), "")
        if "step" in tname.lower():
            continue  # steps track duplicates op durations
        dur = e.get("dur", 0) / 1e3  # ms
        agg[e["name"]] += dur
        cnt[e["name"]] += 1
        total += dur
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:args.top]
    print(f"pid names: {sorted(set(pid_names.values()))}")
    print(f"total device op time: {total:.1f} ms   (flat={args.flat})")
    for name, ms in rows:
        print(f"{ms:9.2f} ms  x{cnt[name]:4d}  {name[:110]}")


if __name__ == "__main__":
    main()
