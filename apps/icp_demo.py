#!/usr/bin/env python
"""Toy ICP-SLAM + EvaPos scoring demo as a CLI (BASELINE ladder config 2).

The ``ICP/icpslam.py`` + ``ICP/EvaPos.py`` user story without Open3D or
matplotlib: incrementally ICP-align a sequence of frames into a bounded
map on the device, export the estimated trajectory as an
EvaPos-compatible Solution CSV, and score it EvaPos-style ("Baseline vs
Proposed", ``ICP/EvaPos.py:40-89``) against the ground-truth solution.

    python apps/icp_demo.py out_dir [--frames 10] [--points 2000]
        [--seed 0] [--step 0.12 0.05 0.0]

Writes:
    out_dir/Solution1.csv   ground truth (the "Baseline" column set:
                            Time,PosX..,QuatW..,VelX.., ``ICP/EvaPos.py:13-38``)
    out_dir/Solution2.csv   ICP-SLAM estimate ("Proposed")
    out_dir/metrics.jsonl   per-frame ICP error + the EvaPos stats

Reference: ``ICP/icpslam.py:31-54`` (10 random frames ICP-aligned into an
accumulated map), ``ICP/EvaPos.py`` (CSV schema + comparison).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--points", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--step", type=float, nargs=3, default=(0.12, 0.05, 0.0),
                    help="per-frame sensor translation (m)")
    args = ap.parse_args(argv)
    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)

    import jax
    import jax.numpy as jnp

    from toyslam_tpu.pipelines import icp_slam
    from toyslam_tpu.utils import evalio

    rng = np.random.default_rng(args.seed)
    # icpslam.py's scenario: one random world field seen from a moving
    # sensor (``ICP/icpslam.py:31-44`` uses fresh random frames with a
    # known misalignment; a persistent field makes GT well-defined).
    base = rng.uniform(-5, 5, size=(args.points, 3))
    S = args.frames
    cap = 1 << int(np.ceil(np.log2(args.points + 64)))
    xyzi = np.full((S, cap, 4), 1e9, np.float32)
    mask = np.zeros((S, cap), bool)
    gt_T = []
    step = np.asarray(args.step)
    for i in range(S):
        shift = step * i
        pts = base - shift + 0.002 * rng.normal(size=base.shape)
        xyzi[i, :args.points, :3] = pts
        xyzi[i, :args.points, 3] = 0
        mask[i, :args.points] = True
        T = np.eye(4)
        T[:3, 3] = shift
        gt_T.append(T)

    cfg = icp_slam.IcpSlamConfig(map_capacity=4 * cap, map_leaf=0.3)
    t0 = time.perf_counter()
    res = jax.block_until_ready(
        jax.jit(icp_slam.icp_slam, static_argnums=2)(
            jnp.asarray(xyzi), jnp.asarray(mask), cfg))
    wall = time.perf_counter() - t0

    est_T = np.asarray(res.poses, np.float64)
    times = np.arange(S, dtype=np.float64) * 0.1
    traj_gt = evalio.from_transforms(times, np.stack(gt_T))
    traj_est = evalio.from_transforms(times, est_T)
    evalio.write_evapos_csv(out / "Solution1.csv", traj_gt)
    evalio.write_evapos_csv(out / "Solution2.csv", traj_est)

    stats = evalio.compare_solutions(traj_gt, traj_est)
    ate_rmse, _ = evalio.ate(est_T[:, :3, 3], np.stack(gt_T)[:, :3, 3],
                             align=False)

    logger = evalio.MetricsLogger(out / "metrics.jsonl")
    errs = np.asarray(res.errors)
    for i in range(S):
        logger.log(frame=i, icp_error=float(errs[i]),
                   tx=float(est_T[i, 0, 3]), ty=float(est_T[i, 1, 3]))
    logger.log(event="evapos",
               **{k: {"avg": float(v.avg), "max": float(v.max)}
                  for k, v in stats.items()})

    print(json.dumps({
        "frames": S,
        "map_points": int(np.asarray(res.map_mask).sum()),
        "ate_rmse_m": round(float(ate_rmse), 5),
        "pos_3d_avg_m": round(float(stats["pos_3d"].avg), 5),
        "wall_s": round(wall, 2),
        "backend": jax.default_backend(),
    }))
    return 0 if float(ate_rmse) < 0.1 else 1


if __name__ == "__main__":
    sys.exit(main())
