#!/usr/bin/env python
"""End-to-end UWB/IMU fusion demo: the flagship smoother as a CLI.

The complete ``uwb_imu_batch_node`` user story without ROS:

    python apps/fusion_demo.py out_dir [--trajectory circle|figure8]
        [--duration 25] [--imu-hz 200] [--kf-hz 4] [--seed 0]

Simulates a trajectory with IMU + UWB beacon ranges (the reference's
``uwb_imu_sim_node``), trilaterates per-keyframe position fixes
(``uwb_node``'s Ceres NLLS), preintegrates the IMU between keyframes, and
runs the sliding-window smoother with marginalization — then writes:

    out_dir/trajectory.txt   TUM-format smoothed poses
    out_dir/solution.csv     EvaPos-compatible CSV
    out_dir/metrics.jsonl    per-keyframe residuals + timing
and prints the smoothed / raw-fix / ground-truth RMSE comparison.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--trajectory", choices=("circle", "figure8"),
                    default="circle")
    ap.add_argument("--duration", type=float, default=25.0)
    ap.add_argument("--imu-hz", type=float, default=200.0)
    ap.add_argument("--kf-hz", type=float, default=4.0)
    ap.add_argument("--range-noise", type=float, default=0.05)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--device", choices=("auto", "tpu", "cpu"),
                    default="auto",
                    help="tpu runs the smoother on-chip in f32 (Cholesky "
                         "GN; f32-vs-f64 parity < 1 cm pinned by "
                         "test_window_f32_matches_f64); cpu uses the f64 "
                         "oracle path")
    args = ap.parse_args(argv)

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    use_tpu = args.device != "cpu" and jax.default_backend() in ("tpu",)
    if use_tpu and args.device == "auto" or args.device == "tpu":
        dtype_name = "float32"  # TPU has no f64 dense solves
    else:
        jax.config.update("jax_platforms", "cpu")
        dtype_name = "float64"
    if dtype_name == "float64":
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    dtype = jnp.float32 if dtype_name == "float32" else jnp.float64
    print(f"backend: {jax.default_backend()}, dtype: {dtype_name}")

    from toyslam_tpu.core import se3
    from toyslam_tpu.estimators import preintegration, trilateration, window
    from toyslam_tpu.estimators.factors import NavState
    from toyslam_tpu.sim import sensors, trajectories
    from toyslam_tpu.utils import evalio

    dt = 1.0 / args.imu_hz
    T = int(args.duration * args.imu_hz)
    imu_per_kf = max(int(args.imu_hz / args.kf_hz), 2)
    n_kf = T // imu_per_kf
    t = (jnp.arange(T, dtype=dtype) + 1) * dt
    traj_fn = getattr(trajectories, args.trajectory)
    traj = traj_fn(t)

    key = jax.random.PRNGKey(args.seed)
    k_imu, k_uwb = jax.random.split(key)
    acc, gyro = sensors.simulate_imu(k_imu, traj)
    kf_idx = np.arange(imu_per_kf - 1, T, imu_per_kf)[:n_kf]
    ranges = sensors.simulate_uwb_ranges(
        k_uwb, traj["pos"][kf_idx], noise_std=args.range_noise)

    # uwb_node: NLLS position fixes from ranges
    fixes, rms = trilateration.solve_positions_batch(
        ranges, sensors.DEFAULT_BEACONS,
        jnp.asarray([0.0, 0.0, 1.0], dtype))
    fixes = np.asarray(fixes)

    cfg = window.WindowConfig(window_size=10, gn_iterations=5,
                              pos_sigma=max(args.range_noise, 0.01))
    win = window.window_init(cfg, dtype)
    params = preintegration.PreintegrationParams(acc_noise=0.03,
                                                 gyro_noise=0.002)
    gw = jnp.asarray([0.0, 0.0, -9.81], dtype)

    push = jax.jit(window.window_push, static_argnums=7)
    optimize = jax.jit(window.window_optimize, static_argnums=1)
    preint = jax.jit(preintegration.preintegrate, static_argnums=())

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    log = evalio.MetricsLogger(out_dir / "metrics.jsonl")

    est_p, est_q, times = [], [], []
    t0 = time.perf_counter()
    for k in range(n_kf):
        lo, hi = k * imu_per_kf, (k + 1) * imu_per_kf
        q_start = traj["quat"][lo] if k > 0 else traj_fn(
            jnp.zeros((), dtype))["quat"]
        R_T = se3.quat_to_rot(se3.quat_conjugate(q_start))
        pre = preint(
            acc[lo:hi], gyro[lo:hi], jnp.full((imu_per_kf,), dt, dtype),
            jnp.zeros(3, dtype), jnp.zeros(3, dtype),
            gravity_sensor=R_T @ gw, params=params)

        guess = NavState(
            p=jnp.asarray(fixes[k]), q=traj["quat"][hi - 1],
            v=jnp.zeros(3, dtype), ba=jnp.zeros(3, dtype),
            bg=jnp.zeros(3, dtype))
        stamp = jnp.asarray(float(kf_idx[k]) * dt, dtype)
        win = push(win, guess, stamp, jnp.asarray(fixes[k]),
                   jnp.asarray(True), pre,
                   jnp.asarray(imu_per_kf * dt, dtype), cfg)
        win = optimize(win, cfg)

        newest = int(win.count) - 1
        est = jax.tree_util.tree_map(lambda x: x[newest], win.states)
        est_p.append(np.asarray(est.p))
        est_q.append(np.asarray(est.q))
        times.append(float(stamp))
        log.log(keyframe=k, time=float(stamp),
                fix_rms=float(rms[k]) if np.ndim(rms) else float(rms),
                speed=float(jnp.linalg.norm(est.v)))
    wall = time.perf_counter() - t0

    est_p = np.stack(est_p)
    est_q = np.stack(est_q)
    gt_p = np.asarray(traj["pos"][kf_idx])

    poses = np.tile(np.eye(4), (n_kf, 1, 1))
    for k in range(n_kf):
        poses[k, :3, :3] = np.asarray(se3.quat_to_rot(jnp.asarray(est_q[k])))
        poses[k, :3, 3] = est_p[k]
    evalio.write_tum(out_dir / "trajectory.txt", np.asarray(times), poses)
    evalio.write_evapos_csv(out_dir / "solution.csv",
                            evalio.from_transforms(np.asarray(times), poses))

    warm = slice(5, None)  # skip the fill-up transient
    rmse = lambda a, b: float(np.sqrt(np.mean(
        np.sum((a[warm] - b[warm]) ** 2, axis=1))))
    print(f"{n_kf} keyframes in {wall:.1f} s "
          f"({n_kf / wall:.1f} keyframes/s incl. compile)")
    print(f"raw UWB fix RMSE vs GT:  {rmse(fixes, gt_p):.4f} m")
    print(f"smoothed RMSE vs GT:     {rmse(est_p, gt_p):.4f} m")
    print(f"wrote {out_dir}/trajectory.txt, solution.csv, metrics.jsonl")
    return 0


if __name__ == "__main__":
    sys.exit(main())
