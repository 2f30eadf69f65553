#!/usr/bin/env python
"""End-to-end LOAM ("TASLO") odometry demo as a CLI.

The ``loam_mapping_node`` user story without ROS:

    python apps/loam_demo.py out_dir [scan_dir]
        [--rings 32] [--fov -30.67 10.67] [--capacity 65536]
        [--frames 12] [--seed 0]

With ``scan_dir``: loads numbered PCD scans (the lidar_subscriber_node
dump layout) and runs the feature odometry over them. Without: generates
a ray-traced synthetic HDL-style world drive (the test fixture's walls +
poles + ground) so the demo runs self-contained. Writes:

    out_dir/taslo_trajectory.txt  the reference's trajectory format
                                  ('# timestamp tx ty tz qx qy qz qw',
                                  ``loam_mapping_node.cpp:1789-1809``)
    out_dir/solution.csv          EvaPos-compatible CSV
    out_dir/metrics.jsonl         per-frame timing + keyframe count
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def _synthetic_drive(frames, seed):
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))
    from test_loam import _synthetic_lidar_scan

    import jax.numpy as jnp
    from toyslam_tpu.core import se3

    rng = np.random.default_rng(seed)
    T = np.eye(4)
    scans, poses = [], []
    for i in range(frames):
        scans.append(_synthetic_lidar_scan(rng, T))
        poses.append(T.copy())
        step = np.asarray(se3.pose6_to_matrix(
            jnp.asarray([0.35, 0.05, 0.0, 0.0, 0.0, 0.05], jnp.float64)))
        T = T @ step
    return scans, poses, 16, (-25.0, 5.0)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("scan_dir", nargs="?", default=None)
    ap.add_argument("--rings", type=int, default=32)
    ap.add_argument("--fov", type=float, nargs=2, default=(-30.67, 10.67))
    ap.add_argument("--capacity", type=int, default=65536)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from toyslam_tpu.core import se3
    from toyslam_tpu.pipelines import loam
    from toyslam_tpu.runtime import loader
    from toyslam_tpu.utils import evalio

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    gt_poses = None
    if args.scan_dir:
        files = loader.list_scan_files(args.scan_dir)
        xyzi, mask = loader.load_scan_stack(files, capacity=args.capacity)
        rings, fov = args.rings, tuple(args.fov)
        S = len(files)
    else:
        scans, gt_poses, rings, fov = _synthetic_drive(args.frames, args.seed)
        S = len(scans)
        cap = max(len(s) for s in scans) + 64
        xyzi = np.full((S, cap, 4), 1e9, np.float32)
        mask = np.zeros((S, cap), bool)
        for i, s in enumerate(scans):
            xyzi[i, :len(s), :3] = s
            xyzi[i, :len(s), 3] = 0
            mask[i, :len(s)] = True

    cfg = loam.LoamConfig(n_rings=rings, vertical_fov_deg=fov)
    run = jax.jit(lambda x, m: loam.loam_odometry(x, m, cfg))
    t0 = time.perf_counter()
    outp = run(jnp.asarray(xyzi), jnp.asarray(mask))
    jax.block_until_ready(outp)
    wall = time.perf_counter() - t0

    pos = np.asarray(outp.positions)
    quat = np.asarray(outp.quaternions)  # wxyz
    times = np.arange(S) * 0.1

    # taslo_trajectory.txt: '# timestamp tx ty tz qx qy qz qw'
    with open(out_dir / "taslo_trajectory.txt", "w") as f:
        f.write("# timestamp tx ty tz qx qy qz qw\n")
        for k in range(S):
            f.write(f"{times[k]:.6f} "
                    f"{pos[k, 0]:.6f} {pos[k, 1]:.6f} {pos[k, 2]:.6f} "
                    f"{quat[k, 1]:.6f} {quat[k, 2]:.6f} {quat[k, 3]:.6f} "
                    f"{quat[k, 0]:.6f}\n")

    T = np.tile(np.eye(4), (S, 1, 1))
    for k in range(S):
        T[k, :3, :3] = np.asarray(se3.quat_to_rot(jnp.asarray(quat[k])))
        T[k, :3, 3] = pos[k]
    evalio.write_evapos_csv(out_dir / "solution.csv",
                            evalio.from_transforms(times, T))
    log = evalio.MetricsLogger(out_dir / "metrics.jsonl")
    log.log(frames=S, wall_sec=round(wall, 3),
            frames_per_sec=round(S / wall, 2),
            keyframes=int(outp.n_keyframes))

    print(f"{S} frames in {wall:.2f} s ({S / wall:.1f} frames/s incl. "
          f"compile), {int(outp.n_keyframes)} keyframes")
    if gt_poses is not None:
        gt = np.stack([p[:3, 3] for p in gt_poses])
        ate = float(np.sqrt(np.mean(np.sum((pos - gt) ** 2, 1))))
        print(f"ATE vs synthetic ground truth: {ate:.3f} m")
    print(f"wrote {out_dir}/taslo_trajectory.txt, solution.csv, "
          f"metrics.jsonl")
    return 0


if __name__ == "__main__":
    sys.exit(main())
