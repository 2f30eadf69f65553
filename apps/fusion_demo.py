#!/usr/bin/env python
"""End-to-end UWB/GPS + IMU fusion demo: the flagship smoother as a CLI.

The complete ``uwb_imu_batch_node`` user story without ROS:

    python apps/fusion_demo.py out_dir [--trajectory circle|figure8]
        [--duration 25] [--imu-hz 200] [--kf-hz 4] [--seed 0]
        [--write-bag file.bag] [--bag file.bag]

Default mode simulates a trajectory with IMU + UWB beacon ranges (the
reference's ``uwb_imu_sim_node``), trilaterates per-keyframe position
fixes (``uwb_node``'s Ceres NLLS), preintegrates the IMU between
keyframes, and runs the sliding-window smoother with marginalization.

Real-data mode (``--bag``) replays a ROS1 bag instead: ``sensor_msgs/Imu``
on /imu/data + NovAtel INSPVAX (or NavSatFix) GPS — the reference's
``imuCallback``/``gpsCallback`` input graph (``uwb_imu_batch_node.cpp:
3027,2284``). GPS goes to ENU about the first fix via the reference's
flat-earth conversion (``:2182-2213``); each fix becomes a keyframe
(``:3147`` keyframe-per-measurement) with the IMU samples between fixes
preintegrated as a padded masked chunk. ``--write-bag`` dumps the
simulation's sensor streams in exactly that bag format (lz4 chunks), so
``--write-bag`` then ``--bag`` is a full real-format round trip.

Outputs:
    out_dir/trajectory.txt   TUM-format smoothed poses
    out_dir/solution.csv     EvaPos-compatible CSV
    out_dir/metrics.jsonl    per-keyframe residuals + timing
and prints the smoothed / raw-fix (/ ground-truth when known) RMSE.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

# Hong Kong reference point for synthesized GPS streams (the dataset the
# reference targets is UrbanNav-HK).
_REF_LAT_DEG, _REF_LON_DEG, _REF_ALT = 22.3, 114.18, 5.0
_BAG_BASE_UNIX = 1.7e9  # arbitrary 2023-era epoch for synthesized stamps


def _write_sensor_bag(path, t_imu, acc, gyro, kf_times, fixes_enu):
    """Dump simulated sensors as the real-format mixed bag: 200 Hz
    sensor_msgs/Imu + per-keyframe INSPVAX (GPS) records, lz4 chunks."""
    from toyslam_tpu.core import geodesy
    from toyslam_tpu.runtime import rosbag

    ref_lat = np.deg2rad(_REF_LAT_DEG)
    ref_lon = np.deg2rad(_REF_LON_DEG)
    lat, lon, alt = geodesy.flat_earth_enu_to_gps(
        np.asarray(fixes_enu, np.float64), ref_lat, ref_lon, _REF_ALT)
    records = []
    for i in range(len(t_imu)):
        t = _BAG_BASE_UNIX + float(t_imu[i])
        records.append(("/imu/data", "sensor_msgs/Imu", t,
                        rosbag.encode_imu(t, np.asarray(gyro[i]),
                                          np.asarray(acc[i]))))
    for k in range(len(kf_times)):
        t = _BAG_BASE_UNIX + float(kf_times[k])
        week, tow = geodesy.unix_to_gps_time(np.float64(t))
        records.append((
            "/novatel_data/inspvax", "novatel_msgs/INSPVAX", t,
            rosbag.encode_inspvax(int(week), int(round(float(tow) * 1000.0)),
                                  float(np.rad2deg(lat[k])),
                                  float(np.rad2deg(lon[k])), float(alt[k]))))
    records.sort(key=lambda r: r[2])
    rosbag.write_mixed_bag(path, records, compression="lz4")


def _load_bag_inputs(bag_path, dtype, jnp):
    """Bag -> per-keyframe fixed-shape inputs for the smoother loop.

    Returns (fixes [K,3], stamps [K], acc/gyro [K,R,3], dtc [K,R],
    validc [K,R]) — one keyframe per GPS fix, IMU samples between
    consecutive fixes as padded masked chunks (the zero-mask tail adds
    nothing to the preintegral)."""
    from toyslam_tpu.core import geodesy
    from toyslam_tpu.runtime import rosbag

    t_imu, acc, gyro, dt = rosbag.pack_bag_imu(bag_path)
    t_gps, lla, _vel = rosbag.pack_bag_gps(bag_path)
    if len(t_gps) < 2 or len(t_imu) < 2:
        raise SystemExit("bag must contain IMU and GPS messages")
    ref_lat, ref_lon = np.deg2rad(lla[0, 0]), np.deg2rad(lla[0, 1])
    fixes = np.asarray(geodesy.flat_earth_gps_to_enu(
        np.deg2rad(lla[:, 0]), np.deg2rad(lla[:, 1]), lla[:, 2],
        ref_lat, ref_lon, lla[0, 2]), np.float64)

    bounds = np.searchsorted(t_imu, t_gps, side="right")
    starts = np.concatenate([[0], bounds[:-1]])
    R = max(int((bounds - starts).max()), 2)
    K = len(t_gps)
    accs = np.zeros((K, R, 3), np.float32)
    gyrs = np.zeros((K, R, 3), np.float32)
    dtc = np.zeros((K, R), np.float32)
    vld = np.zeros((K, R), bool)
    for k in range(K):
        lo, hi = int(starts[k]), int(bounds[k])
        n = hi - lo
        accs[k, :n] = acc[lo:hi]
        gyrs[k, :n] = gyro[lo:hi]
        dtc[k, :n] = dt[lo:hi]
        vld[k, :n] = True
    stamps = t_gps - t_gps[0]
    return (fixes.astype(np.float64), stamps,
            jnp.asarray(accs, dtype), jnp.asarray(gyrs, dtype),
            jnp.asarray(dtc, dtype), jnp.asarray(vld))


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
    ap.add_argument("--bag", default=None,
                    help="replay a ROS1 bag (sensor_msgs/Imu + "
                         "INSPVAX/NavSatFix) instead of simulating")
    ap.add_argument("--write-bag", default=None,
                    help="also dump the simulated sensor streams as a "
                         "real-format lz4 bag (Imu + INSPVAX)")
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

    gt_p = None
    quat_src = None
    rms = None
    if args.bag:
        fixes, kf_times, accs, gyrs, dtc, vld = _load_bag_inputs(
            args.bag, dtype, jnp)
        n_kf = len(kf_times)
        pos_sigma = max(args.range_noise, 0.01)
        print(f"bag: {n_kf} GPS keyframes, IMU chunks up to "
              f"{accs.shape[1]} samples")
    else:
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
        fixes_j, rms = trilateration.solve_positions_batch(
            ranges, sensors.DEFAULT_BEACONS,
            jnp.asarray([0.0, 0.0, 1.0], dtype))
        fixes = np.asarray(fixes_j)
        kf_times = np.asarray(kf_idx, np.float64) * dt
        gt_p = np.asarray(traj["pos"][kf_idx])

        # Fixed-shape chunk views of the IMU stream (identical numbers to
        # the former acc[lo:hi] slicing).
        accs = acc[: n_kf * imu_per_kf].reshape(n_kf, imu_per_kf, 3)
        gyrs = gyro[: n_kf * imu_per_kf].reshape(n_kf, imu_per_kf, 3)
        dtc = jnp.full((n_kf, imu_per_kf), dt, dtype)
        vld = jnp.ones((n_kf, imu_per_kf), bool)
        # q hints from the simulated trajectory (start/end of each chunk)
        q0 = traj_fn(jnp.zeros((), dtype))["quat"]
        quat_src = (jnp.concatenate(
            [q0[None], traj["quat"][kf_idx[:-1] + 1]], 0),
            traj["quat"][kf_idx])
        pos_sigma = max(args.range_noise, 0.01)

        if args.write_bag:
            _write_sensor_bag(args.write_bag, np.asarray(t),
                              np.asarray(acc), np.asarray(gyro),
                              kf_times, fixes)
            print(f"wrote sensor bag: {args.write_bag}")

    cfg = window.WindowConfig(window_size=10, gn_iterations=5,
                              pos_sigma=pos_sigma)
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
    q_prev = jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype)
    t0 = time.perf_counter()
    for k in range(n_kf):
        q_start = quat_src[0][k] if quat_src is not None else q_prev
        R_T = se3.quat_to_rot(se3.quat_conjugate(q_start))
        pre = preint(accs[k], gyrs[k], dtc[k],
                     jnp.zeros(3, dtype), jnp.zeros(3, dtype),
                     gravity_sensor=R_T @ gw, params=params,
                     valid=vld[k])

        q_guess = quat_src[1][k] if quat_src is not None else q_prev
        guess = NavState(
            p=jnp.asarray(fixes[k], dtype), q=q_guess,
            v=jnp.zeros(3, dtype), ba=jnp.zeros(3, dtype),
            bg=jnp.zeros(3, dtype))
        stamp = jnp.asarray(float(kf_times[k]), dtype)
        span = jnp.asarray(float(np.sum(np.asarray(dtc[k]))), dtype)
        win = push(win, guess, stamp, jnp.asarray(fixes[k], dtype),
                   jnp.asarray(True), pre, span, cfg)
        win = optimize(win, cfg)

        newest = int(win.count) - 1
        est = jax.tree_util.tree_map(lambda x: x[newest], win.states)
        q_prev = est.q
        est_p.append(np.asarray(est.p))
        est_q.append(np.asarray(est.q))
        times.append(float(stamp))
        log.log(keyframe=k, time=float(stamp),
                fix_rms=float(rms[k]) if rms is not None else 0.0,
                speed=float(jnp.linalg.norm(est.v)))
    wall = time.perf_counter() - t0

    est_p = np.stack(est_p)
    est_q = np.stack(est_q)

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
    print(f"smoothed vs raw-fix RMSE:  {rmse(est_p, fixes):.4f} m")
    if gt_p is not None:
        print(f"raw UWB fix RMSE vs GT:  {rmse(fixes, gt_p):.4f} m")
        print(f"smoothed RMSE vs GT:     {rmse(est_p, gt_p):.4f} m")
    print(f"wrote {out_dir}/trajectory.txt, solution.csv, metrics.jsonl")
    return 0


if __name__ == "__main__":
    sys.exit(main())
