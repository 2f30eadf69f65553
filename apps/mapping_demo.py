#!/usr/bin/env python
"""End-to-end mapping demo: scans in -> trajectory + map + metrics out.

The complete ``ndt_rosbag_mapping_node`` user story without ROS:

    python apps/mapping_demo.py <scans.bag | pcd_directory> out_dir \\
        [--leaf 0.3] [--map-leaf 0.5] [--config cfg.json]

Reads scans from a ROS bag (``/velodyne_points``) or a directory of
``cloud_N.pcd`` files, runs the compiled NDT odometry + bounded mapping
pipeline, and writes:

    out_dir/trajectory.txt     TUM-format poses (taslo_trajectory.txt style)
    out_dir/solution.csv       EvaPos-compatible CSV
    out_dir/map.pcd            accumulated global map
    out_dir/metrics.jsonl      per-scan iterations/convergence/score
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def load_scans(source: str, capacity: int):
    from toyslam_tpu.runtime import loader, rosbag

    src = Path(source)
    if src.is_dir():
        files = loader.list_scan_files(src)
        if not files:
            raise FileNotFoundError(f"no .pcd files in {src}")
        xyzi, mask = loader.load_scan_stack(files, capacity)
        times = np.arange(len(files), dtype=np.float64)
        return times, xyzi, mask
    # bag file: one-pass packed ingestion (native/bagpack.c when built,
    # differential-tested Python fallback otherwise)
    xyzi, mask, times, _counts = rosbag.pack_bag_scans(
        src, capacity=capacity)
    if len(times) == 0:
        raise ValueError(f"no PointCloud2 messages in {src}")
    return times, xyzi, mask


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("source", help="ROS bag or directory of PCD scans")
    ap.add_argument("out_dir")
    ap.add_argument("--leaf", type=float, default=0.3)
    ap.add_argument("--map-leaf", type=float, default=0.5)
    ap.add_argument("--capacity", type=int, default=131072)
    ap.add_argument("--map-capacity", type=int, default=65536)
    ap.add_argument("--config", default=None, help="JSON config file")
    ap.add_argument("--device", choices=("auto", "tpu", "cpu"),
                    default="auto",
                    help="auto uses the environment's default backend "
                         "(the TPU chip in production); cpu pins the "
                         "host backend")
    ap.add_argument("--stream", action="store_true",
                    help="online mode: jitted mapping_step fed "
                         "scan-at-a-time (the dir-watching node's loop) "
                         "instead of the one-dispatch batch scan")
    ap.add_argument("--checkpoint-every", type=int, default=0,
                    help="stream mode: snapshot the mapping state every "
                         "N scans (mapping_state.npz in out_dir)")
    ap.add_argument("--resume", action="store_true",
                    help="stream mode: continue from out_dir/"
                         "mapping_state.npz if present")
    args = ap.parse_args(argv)

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from toyslam_tpu import config as cfgmod
    from toyslam_tpu.pipelines import odometry as odo
    from toyslam_tpu.utils import evalio

    times, xyzi, mask = load_scans(args.source, args.capacity)
    print(f"loaded {len(times)} scans (capacity {args.capacity})")

    if args.config:
        cfg = cfgmod.load(args.config)["odometry"]
    else:
        cfg = odo.OdometryConfig()._replace(
            scan_leaf=args.leaf, map_leaf=args.map_leaf)

    t0 = time.perf_counter()
    if args.stream:
        # Online mode (the dir-watching node's loop): one jitted
        # mapping_step fed scan-at-a-time, periodic pytree snapshots —
        # kill the process mid-bag and rerun to resume from the last
        # checkpoint (bit-identical continuation,
        # test_online_mapping_checkpoint_resume).
        from toyslam_tpu.utils import checkpoint

        Path(args.out_dir).mkdir(parents=True, exist_ok=True)
        ckpt = Path(args.out_dir) / "mapping_state.npz"
        step = jax.jit(odo.mapping_step, static_argnums=3)
        state = odo.mapping_init(jnp.asarray(xyzi[0]), jnp.asarray(mask[0]),
                                 args.map_capacity, cfg)
        S = len(times)
        # Fixed-shape snapshot: state + next scan index + the per-scan
        # output buffers (load_checkpoint requires template-shape match).
        poses_all = np.tile(np.eye(4, dtype=np.float32), (S, 1, 1))
        conv_all = np.ones((S,), bool)
        iters_all = np.zeros((S,), np.int32)
        probs_all = np.zeros((S,), np.float32)
        start = 1
        if args.resume and ckpt.exists():
            snap = (state, np.int32(0), poses_all, conv_all, iters_all,
                    probs_all)
            (state, start, poses_all, conv_all, iters_all,
             probs_all) = checkpoint.load_checkpoint(ckpt, snap)
            start = int(start)
            # np.array (not asarray): restored jax arrays view read-only
            # buffers, and the loop below writes these in place.
            poses_all, conv_all, iters_all, probs_all = (
                np.array(poses_all), np.array(conv_all),
                np.array(iters_all), np.array(probs_all))
            print(f"resumed from {ckpt} at scan {start}")
        for i in range(start, S):
            state, o = step(state, jnp.asarray(xyzi[i]),
                            jnp.asarray(mask[i]), cfg)
            poses_all[i] = np.asarray(o[0])
            conv_all[i] = bool(o[2])
            iters_all[i] = int(o[3])
            probs_all[i] = float(o[4])
            if args.checkpoint_every and i % args.checkpoint_every == 0:
                jax.block_until_ready(state)
                checkpoint.save_checkpoint(
                    ckpt, (state, np.int32(i + 1), poses_all, conv_all,
                           iters_all, probs_all))
        jax.block_until_ready(state)

        class _Out:  # match the batch-path result surface below
            pass

        out = _Out()
        out.map_xyzi = state.map_cloud.xyzi
        out.map_mask = state.map_cloud.mask
        out.odometry = _Out()
        out.odometry.poses = poses_all
        out.odometry.converged = conv_all
        out.odometry.iterations = iters_all
        out.odometry.trans_probability = probs_all
    else:
        run = jax.jit(odo.ndt_mapping, static_argnums=(2, 3))
        out = run(jnp.asarray(xyzi), jnp.asarray(mask),
                  args.map_capacity, cfg)
        jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    n_reg = len(times) - 1
    print(f"mapping: {dt:.2f} s total, {n_reg / dt:.1f} scans/s "
          f"(incl. compile on first run)")

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    poses = np.asarray(out.odometry.poses)
    evalio.write_tum(out_dir / "trajectory.txt", times, poses)
    traj = evalio.from_transforms(times, poses)
    evalio.write_evapos_csv(out_dir / "solution.csv", traj)

    from toyslam_tpu.core import pcd_io

    map_mask = np.asarray(out.map_mask)
    map_pts = np.asarray(out.map_xyzi)[map_mask]
    pcd_io.write_pcd(out_dir / "map.pcd", map_pts)

    log = evalio.MetricsLogger(out_dir / "metrics.jsonl")
    conv = np.asarray(out.odometry.converged)
    iters = np.asarray(out.odometry.iterations)
    probs = np.asarray(out.odometry.trans_probability)
    for i in range(len(times)):
        log.log(scan=i, time=float(times[i]), converged=bool(conv[i]),
                iterations=int(iters[i]), trans_probability=float(probs[i]))

    print(f"wrote {out_dir}/trajectory.txt ({len(poses)} poses), "
          f"solution.csv, map.pcd ({len(map_pts)} pts), metrics.jsonl")
    return 0


if __name__ == "__main__":
    sys.exit(main())
