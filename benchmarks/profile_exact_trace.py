#!/usr/bin/env python
"""Trace the exact-control-flow 256k odometry and print top device fusions.

VERDICT r3 item 4: the exact config sits at ~91.8 scans/s vs the >=100
target; TPU_NOTES names suspects (two downsample sorts ~1.1 ms, tree
reduce, per-eval gather budget). This dumps the measured per-fusion self
time of the real composed program so the remaining budget is attributed
by evidence, not arithmetic.

Usage: python benchmarks/profile_exact_trace.py [--S 8] [--default]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--S", type=int, default=8)
    ap.add_argument("--default", action="store_true",
                    help="trace the shipped default config instead")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from toyslam_tpu.core import pcd_io
    from toyslam_tpu.pipelines import odometry as odo

    target_np = pcd_io.read_pcd("/root/reference/ndt_omp/data/251370668.pcd")
    S = args.S
    big = bench._big_scans(target_np, S)
    masks = jax.device_put(jnp.ones((S, 262144), bool))

    cfg = odo.OdometryConfig(work_capacity=24576)
    if not args.default:
        cfg = cfg._replace(ndt=cfg.ndt._replace(
            frozen_linesearch=False, regather_iterations=1 << 30))

    run = jax.jit(lambda x, m: odo.ndt_odometry(x, m, cfg))
    x0 = jax.device_put(jnp.asarray(big))
    jax.block_until_ready(run(x0, masks))

    trace_dir = "/tmp/exact_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        x1 = jax.device_put(jnp.asarray(big + np.float32(1e-3)))
        out = run(x1, masks)
        jax.block_until_ready(out)

    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("NO TRACE FILES under", trace_dir)
        return
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "Device" in n or "/device" in n.lower()}
    # Self time: events nest (while loops contain their bodies); per
    # (pid, tid) track, subtract each event's children via a stack sweep.
    tracks = defaultdict(list)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        tname = tid_names.get((e["pid"], e["tid"]), "")
        if "step" in tname.lower():
            continue
        tracks[(e["pid"], e["tid"])].append(e)
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for evs in tracks.values():
        evs.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        stack = []  # (end_ts, name, child_dur_accum_index)
        child = []
        for e in evs:
            ts, dur = e["ts"], e.get("dur", 0)
            while stack and ts >= stack[-1][0]:
                end, name, ci = stack.pop()
                self_ms = (child[ci][0] - child[ci][1]) / 1e3
                agg[name] += self_ms
                cnt[name] += 1
                total += self_ms
            if stack:
                child[stack[-1][2]][1] += dur
            child.append([dur, 0])
            stack.append((ts + dur, e["name"], len(child) - 1))
        while stack:
            end, name, ci = stack.pop()
            self_ms = (child[ci][0] - child[ci][1]) / 1e3
            agg[name] += self_ms
            cnt[name] += 1
            total += self_ms
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:args.top]
    mode = "default" if args.default else "exact"
    print(f"total device op time: {total:.1f} ms over {S} scans "
          f"({total / S:.2f} ms/scan, mode={mode})")
    for name, ms in rows:
        print(f"{ms:9.2f} ms  x{cnt[name]:4d}  {name[:110]}")


if __name__ == "__main__":
    main()
