"""Trajectory IO + evaluation: EvaPos-compatible CSV, TUM text, metrics.

Capability port of the reference's evaluation layer:
- ``ICP/EvaPos.py`` CSV schema (``Time, PosXYZ, QuatWXYZ, VelXYZ``, Time in
  nanoseconds) with the same ns->s normalization and quaternion->Euler
  comparison — but headless (numbers out, no matplotlib).
- TUM-style trajectory text files like ``taslo_trajectory.txt``
  (``loam_mapping_node.cpp:1789+``).
- ATE / RPE metrics replacing in-node ``ErrorStats``
  (``uwb_imu_batch_node.cpp:1589-1616``) and per-scan JSONL metrics replacing
  the reference's "msec + fitness per scan" prints
  (``ndt_rosbag_mapping_node.cpp:127-133``).
"""

from __future__ import annotations

import csv
import json
from pathlib import Path
from typing import NamedTuple

import numpy as np

from toyslam_tpu.core import se3


class Trajectory(NamedTuple):
    time: np.ndarray  # [T] seconds
    pos: np.ndarray  # [T, 3]
    quat: np.ndarray  # [T, 4] wxyz
    vel: np.ndarray  # [T, 3]


def from_transforms(times, transforms, vel=None) -> Trajectory:
    """Build a Trajectory from [T, 4, 4] pose matrices."""
    import jax.numpy as jnp

    transforms = np.asarray(transforms)
    quat = np.asarray(se3.rot_to_quat(jnp.asarray(transforms[:, :3, :3])))
    pos = transforms[:, :3, 3]
    if vel is None:
        t = np.asarray(times, dtype=np.float64)
        if len(t) > 1:
            # Consistent central differences over the actual (possibly
            # irregular) sample times. np.gradient requires strictly
            # increasing coordinates; real logs contain exactly duplicated
            # AND out-of-order stamps, so clamp to monotone first and add
            # the 1e-9 jitter after — jitter-before-clamp leaves zero
            # spacing at an out-of-order stamp (NaN velocities), and a
            # 1e-12 jitter once produced ~1e12 velocities.
            tt = np.maximum.accumulate(t) + np.arange(len(t)) * 1e-9
            vel = np.gradient(pos, tt, axis=0)
        else:
            vel = np.zeros_like(pos)
    return Trajectory(np.asarray(times, np.float64), pos, quat, np.asarray(vel))


def write_evapos_csv(path: str | Path, traj: Trajectory) -> None:
    """Write the EvaPos CSV schema (Time in nanoseconds, trailing comma —
    matching ICP/Solution1.csv exactly)."""
    with open(path, "w", newline="") as f:
        f.write("Time,PosX,PosY,PosZ,QuatW,QuatX,QuatY,QuatZ,VelX,VelY,VelZ,\n")
        for i in range(len(traj.time)):
            t_ns = int(round(traj.time[i] * 1e9))
            row = [t_ns] + [f"{v:.5f}" for v in (*traj.pos[i], *traj.quat[i],
                                                 *traj.vel[i])]
            f.write(",".join(str(v) for v in row) + ",\n")


def read_evapos_csv(path: str | Path) -> Trajectory:
    """Read an EvaPos-schema CSV (ns Time, ns->s normalization as EvaPos)."""
    rows = []
    with open(path) as f:
        reader = csv.DictReader(f)
        for r in reader:
            rows.append([
                float(r["Time"]),
                float(r["PosX"]), float(r["PosY"]), float(r["PosZ"]),
                float(r["QuatW"]), float(r["QuatX"]), float(r["QuatY"]),
                float(r["QuatZ"]),
                float(r["VelX"]), float(r["VelY"]), float(r["VelZ"]),
            ])
    a = np.asarray(rows)
    time = (a[:, 0] - a[0, 0]) / 1e9  # EvaPos.py:17 normalization
    return Trajectory(time, a[:, 1:4], a[:, 4:8], a[:, 8:11])


def write_tum(path: str | Path, times, transforms) -> None:
    """TUM format: ``t x y z qx qy qz qw`` per line."""
    import jax.numpy as jnp

    transforms = np.asarray(transforms)
    quat = np.asarray(se3.rot_to_quat(jnp.asarray(transforms[:, :3, :3])))
    with open(path, "w") as f:
        for t, T, q in zip(np.asarray(times), transforms, quat):
            x, y, z = T[:3, 3]
            f.write(f"{t:.6f} {x:.6f} {y:.6f} {z:.6f} "
                    f"{q[1]:.6f} {q[2]:.6f} {q[3]:.6f} {q[0]:.6f}\n")


def read_tum(path: str | Path):
    data = np.loadtxt(path)
    times = data[:, 0]
    pos = data[:, 1:4]
    quat_xyzw = data[:, 4:8]
    quat = np.concatenate([quat_xyzw[:, 3:4], quat_xyzw[:, :3]], 1)
    return times, pos, quat


class ErrorStats(NamedTuple):
    """Mirror of the batch node's ErrorStats (``uwb_imu_batch_node.cpp:
    1589-1616``): current/min/max/avg over a stream."""

    current: float
    min: float
    max: float
    avg: float
    rmse: float
    count: int


def error_stats(errors) -> ErrorStats:
    e = np.asarray(errors, np.float64)
    return ErrorStats(
        current=float(e[-1]) if len(e) else 0.0,
        min=float(e.min()) if len(e) else 0.0,
        max=float(e.max()) if len(e) else 0.0,
        avg=float(e.mean()) if len(e) else 0.0,
        rmse=float(np.sqrt(np.mean(e**2))) if len(e) else 0.0,
        count=len(e),
    )


def ate(est_pos, gt_pos, align: bool = True):
    """Absolute trajectory error (RMSE) with optional SE(3) Umeyama align."""
    est = np.asarray(est_pos, np.float64)
    gt = np.asarray(gt_pos, np.float64)
    if align:
        mu_e, mu_g = est.mean(0), gt.mean(0)
        W = (est - mu_e).T @ (gt - mu_g)
        u, _, vt = np.linalg.svd(W)
        d = np.sign(np.linalg.det(vt.T @ u.T))
        D = np.diag([1.0, 1.0, d])
        R = vt.T @ D @ u.T
        t = mu_g - R @ mu_e
        est = est @ R.T + t
    err = np.linalg.norm(est - gt, axis=1)
    return float(np.sqrt(np.mean(err**2))), err


def rpe(est_T, gt_T, delta: int = 1):
    """Relative pose error over a fixed frame delta; est/gt [T, 4, 4]."""
    est = np.asarray(est_T, np.float64)
    gt = np.asarray(gt_T, np.float64)
    errs_t, errs_r = [], []
    for i in range(len(est) - delta):
        d_est = np.linalg.inv(est[i]) @ est[i + delta]
        d_gt = np.linalg.inv(gt[i]) @ gt[i + delta]
        e = np.linalg.inv(d_gt) @ d_est
        errs_t.append(np.linalg.norm(e[:3, 3]))
        c = np.clip((np.trace(e[:3, :3]) - 1) / 2, -1, 1)
        errs_r.append(np.arccos(c))
    return (float(np.sqrt(np.mean(np.square(errs_t)))),
            float(np.sqrt(np.mean(np.square(errs_r)))))


class MetricsLogger:
    """Append-only JSONL per-scan metrics (replaces the reference's inline
    "align: N msec, fitness: F" prints with a structured sink)."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)

    def log(self, **metrics):
        with open(self.path, "a") as f:
            f.write(json.dumps(metrics) + "\n")

    def read(self):
        if not self.path.exists():
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]


def compare_solutions(traj_a: Trajectory, traj_b: Trajectory):
    """EvaPos-style comparison of two solutions ("Baseline vs Proposed",
    ``ICP/EvaPos.py:40-89``) — headless: returns the numbers the plots show.

    Interpolates B onto A's timestamps; returns dict of ErrorStats for
    position components, horizontal/3D error, velocity and yaw difference.
    """
    import jax.numpy as jnp

    tb = traj_b.time
    out = {}
    interp = lambda col: np.interp(traj_a.time, tb, col)
    pos_b = np.stack([interp(traj_b.pos[:, i]) for i in range(3)], -1)
    vel_b = np.stack([interp(traj_b.vel[:, i]) for i in range(3)], -1)

    d = traj_a.pos - pos_b
    out["pos_x"] = error_stats(np.abs(d[:, 0]))
    out["pos_y"] = error_stats(np.abs(d[:, 1]))
    out["pos_z"] = error_stats(np.abs(d[:, 2]))
    out["pos_2d"] = error_stats(np.linalg.norm(d[:, :2], axis=1))
    out["pos_3d"] = error_stats(np.linalg.norm(d, axis=1))
    out["vel_3d"] = error_stats(
        np.linalg.norm(traj_a.vel - vel_b, axis=1))

    # Yaw from quaternions (EvaPos converts to Euler for comparison)
    def yaw_of(q):
        w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
        return np.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))

    yaw_a = yaw_of(traj_a.quat)
    yaw_b = np.interp(traj_a.time, tb, np.unwrap(yaw_of(traj_b.quat)))
    dyaw = np.mod(yaw_a - yaw_b + np.pi, 2 * np.pi) - np.pi
    out["yaw"] = error_stats(np.abs(dyaw))
    return out
