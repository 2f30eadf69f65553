#!/usr/bin/env python
"""End-to-end UWB positioning demo: the ``uwb_node`` + ``uwb_imu_EKF_node``
user stories as one CLI.

    python apps/uwb_demo.py out_dir [--duration 60] [--uwb-hz 10]
        [--imu-hz 200] [--range-noise 0.3] [--nlos-prob 0.05]
        [--no-eskf] [--device auto|tpu|cpu] [--seed 0]

Stage 1 (``uwb_node``): 8 anchors around a large circuit (the reference
defaults to 8 anchors at x10 scale, ``uwb_node.cpp:70-98``), noisy ranges
to a circular ground-truth trajectory at ``--uwb-hz``, and a per-epoch
Huber Gauss-Newton trilateration WARM-STARTED from the previous estimate
(``uwb_node.cpp:221``) — one ``lax.scan``, so the whole range log solves
in a single dispatch. Optional NLOS spikes (+1..3 m on a random anchor)
exercise the robust loss the way the reference's optional HuberLoss does.

Stage 2 (``uwb_imu_EKF_node``, skip with --no-eskf): a 200 Hz simulated
IMU (bias + noise, ``uwb_imu_sim_node.cpp:107-199``) and the stage-1
position fixes fuse in the 15-state ESKF (predict on every IMU tick,
position update when a fix lands) — again one ``lax.scan``.

Writes out_dir/{solution_uwb.csv,solution_eskf.csv} (EvaPos-compatible),
anchors.json, and prints the raw-trilateration vs fused RMSE. Exit 0 iff
the fused (or, with --no-eskf, the trilaterated) ATE < 0.5 m.

f32 is plenty for UWB-scale coordinates (meters): on a TPU backend the
whole program runs on-chip in f32; --device cpu pins the f64 oracle path.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--duration", type=float, default=60.0)
    ap.add_argument("--uwb-hz", type=float, default=10.0)
    ap.add_argument("--imu-hz", type=float, default=200.0)
    ap.add_argument("--range-noise", type=float, default=0.3)
    ap.add_argument("--nlos-prob", type=float, default=0.05,
                    help="per-epoch probability of a +1..3 m NLOS spike "
                         "on one random anchor")
    ap.add_argument("--no-eskf", action="store_true",
                    help="stop after trilateration (pure uwb_node story)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--device", choices=("auto", "tpu", "cpu"),
                    default="auto")
    args = ap.parse_args(argv)

    import jax

    if args.device == "cpu" or (
            args.device == "auto" and jax.default_backend() != "tpu"):
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        dtype = "float64"
    else:
        dtype = "float32"
    import jax.numpy as jnp

    from toyslam_tpu.estimators import eskf, trilateration
    from toyslam_tpu.sim import sensors, trajectories
    from toyslam_tpu.utils import evalio

    dt = jnp.dtype(dtype)
    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    key = jax.random.PRNGKey(args.seed)
    k_rng, k_nlos, k_anchor, k_imu = jax.random.split(key, 4)

    # ---- ground truth + anchors (x10-scale ring, uwb_node.cpp:70-98) ----
    R_traj, omega = 30.0, 0.08
    E = int(args.duration * args.uwb_hz)
    t_uwb = jnp.arange(E, dtype=dt) / args.uwb_hz
    gt = trajectories.circle(t_uwb, radius=R_traj, omega=omega, z=1.0)
    theta_a = jnp.arange(8, dtype=dt) * (2 * jnp.pi / 8)
    # Height-staggered ring (0/3/6/9 m): with all anchors on one plane the
    # vertical DOP at 50 m horizontal range is ~12x and the z error
    # dominates the ATE — same physics as the reference's x10-scale arena.
    anchors = jnp.stack([50.0 * jnp.cos(theta_a), 50.0 * jnp.sin(theta_a),
                         3.0 * (jnp.arange(8, dtype=dt) % 4)], -1)

    # ---- stage 1: ranges + warm-started trilateration scan ----
    ranges = sensors.simulate_uwb_ranges(
        k_rng, gt["pos"], anchors, noise_std=args.range_noise)
    nlos_hit = jax.random.uniform(k_nlos, (E,), dt) < args.nlos_prob
    nlos_anchor = jax.random.randint(
        jax.random.fold_in(k_nlos, 1), (E,), 0, 8)
    nlos_mag = jax.random.uniform(
        jax.random.fold_in(k_nlos, 2), (E,), dt, 1.0, 3.0)
    ranges = ranges + jnp.where(
        nlos_hit[:, None] & (jnp.arange(8)[None] == nlos_anchor[:, None]),
        nlos_mag[:, None], 0.0)

    tri_cfg = trilateration.TrilaterationConfig(huber_delta=0.5)

    def tri_step(prev, r):
        p, rms = trilateration.solve_position(r, anchors, prev,
                                              config=tri_cfg)
        return p, (p, rms)

    @jax.jit
    def run_trilateration(ranges):
        # Cold start at the arena center; every later epoch warm-starts
        # from the previous fix (uwb_node.cpp:221).
        init = jnp.asarray([1.0, 0.0, 0.5], dt)
        _, (fixes, rms) = jax.lax.scan(tri_step, init, ranges)
        return fixes, rms

    fixes, rms = jax.block_until_ready(run_trilateration(ranges))
    tri_d = np.asarray(fixes) - np.asarray(gt["pos"])
    tri_ate = float(np.sqrt(np.mean(np.sum(tri_d**2, 1))))
    # Vertical error is DOP-limited (anchors are ~50 m out with <= 9 m of
    # height spread); gate the uwb-only story on the horizontal ATE.
    tri_ate_h = float(np.sqrt(np.mean(np.sum(tri_d[:, :2] ** 2, 1))))

    T_mat = np.tile(np.eye(4), (E, 1, 1))
    T_mat[:, :3, 3] = np.asarray(fixes)
    evalio.write_evapos_csv(
        out / "solution_uwb.csv",
        evalio.from_transforms(np.asarray(t_uwb, np.float64), T_mat))
    with open(out / "anchors.json", "w") as f:
        json.dump({"anchors": np.asarray(anchors).tolist()}, f)

    print(f"trilateration: {E} epochs, ATE {tri_ate:.3f} m "
          f"(horizontal {tri_ate_h:.3f} m; range noise "
          f"{args.range_noise} m, {int(np.asarray(nlos_hit).sum())} "
          f"NLOS epochs)")

    if args.no_eskf:
        print(f"wrote {out}/solution_uwb.csv, anchors.json")
        return 0 if tri_ate_h < 0.5 else 1

    # ---- stage 2: 200 Hz IMU + position fixes -> ESKF scan ----
    ratio = max(int(round(args.imu_hz / args.uwb_hz)), 1)
    T_imu = E * ratio
    t_imu = jnp.arange(T_imu, dtype=dt) / args.imu_hz
    gt_imu = trajectories.circle(t_imu, radius=R_traj, omega=omega, z=1.0)
    acc, gyro = sensors.simulate_imu(k_imu, gt_imu)

    meas = jnp.zeros((T_imu, 3), dt)
    meas_valid = jnp.zeros((T_imu,), bool)
    # Fix e lands on the IMU tick at the same timestamp e * ratio.
    meas = meas.at[jnp.arange(E) * ratio].set(fixes)
    meas_valid = meas_valid.at[jnp.arange(E) * ratio].set(True)
    log = eskf.ESKFLog(
        dt=jnp.full((T_imu,), 1.0 / args.imu_hz, dt),
        acc=acc, gyro=gyro, meas=meas, meas_valid=meas_valid)

    # Initialize from the first fix (the reference EKF initializes its
    # nominal state from the first UWB position); attitude from GT yaw is
    # NOT used — identity quat converges through the position updates.
    state = eskf.init_state(dt)._replace(p=fixes[0])
    params = eskf.ESKFParams(meas_noise=float(args.range_noise) ** 2)
    _, traj_out = jax.block_until_ready(
        jax.jit(eskf.eskf_run)(log, state, params))

    fused_p = np.asarray(traj_out["p"])
    # The identity-attitude + zero-bias start takes ~10 s of position
    # updates to converge; discard that transient (capped at half the run).
    warm = min(int(10.0 * args.imu_hz), T_imu // 2)
    fused_err = np.linalg.norm(fused_p - np.asarray(gt_imu["pos"]), axis=1)
    fused_ate = float(np.sqrt(np.mean(fused_err[warm:] ** 2)))

    T_mat = np.tile(np.eye(4), (T_imu, 1, 1))
    T_mat[:, :3, 3] = fused_p
    sol = evalio.from_transforms(np.asarray(t_imu, np.float64), T_mat,
                                 vel=np.asarray(traj_out["v"]))
    evalio.write_evapos_csv(out / "solution_eskf.csv", sol)

    print(f"ESKF fused ({jax.default_backend()}, {dtype}): {T_imu} IMU "
          f"ticks, ATE {fused_ate:.3f} m (post-transient)")
    print(f"wrote {out}/solution_uwb.csv, solution_eskf.csv, anchors.json")
    return 0 if fused_ate < 0.5 else 1


if __name__ == "__main__":
    sys.exit(main())
