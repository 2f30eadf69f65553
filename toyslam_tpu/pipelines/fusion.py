"""Fused NDT-odometry + ESKF pipeline (the BASELINE stretch configuration).

Combines the scan-matching front end (``pipelines/odometry``) with the
loosely-coupled ESKF back end (``estimators/eskf``) in one compiled program:
NDT provides per-scan position fixes which the filter fuses with the IMU
stream — the framework's equivalent of running the reference's
``ndt_rosbag_mapping_node`` + ``uwb_imu_EKF_node`` graph as a single
process. Batches over independent sequences with ``vmap`` and shards over a
device mesh via ``toyslam_tpu.parallel.batch.sharded_fusion``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from toyslam_tpu.estimators import eskf
from toyslam_tpu.pipelines import odometry as odo


class FusionConfig(NamedTuple):
    odometry: odo.OdometryConfig = odo.OdometryConfig()
    eskf: eskf.ESKFParams = eskf.ESKFParams(
        acc_noise=0.03, gyro_noise=0.002, meas_noise=0.01)
    imu_per_scan: int = 20  # IMU samples between consecutive scans


class FusionOutput(NamedTuple):
    poses: jnp.ndarray  # [S, 4, 4] NDT odometry poses
    fused_p: jnp.ndarray  # [T, 3] ESKF positions (T = S * imu_per_scan)
    fused_v: jnp.ndarray  # [T, 3]
    fused_q: jnp.ndarray  # [T, 4]
    converged: jnp.ndarray  # [S]


def ndt_eskf_fusion(scans_xyzi, scans_mask, imu_acc, imu_gyro, imu_dt,
                    config: FusionConfig = FusionConfig()) -> FusionOutput:
    """Run odometry over the scan stack, then fuse its position fixes with
    the IMU stream in one ESKF pass.

    scans: [S, N, 4]/[S, N]; imu: [S * imu_per_scan, 3] aligned so that scan
    i lands at IMU tick (i+1) * imu_per_scan - 1.
    """
    S = scans_xyzi.shape[0]
    R = config.imu_per_scan
    T = imu_acc.shape[0]

    out = odo.ndt_odometry(scans_xyzi, scans_mask, config.odometry)
    fixes = out.poses[:, :3, 3]  # [S, 3]

    meas = jnp.zeros((T, 3), imu_acc.dtype)
    meas_valid = jnp.zeros((T,), bool)
    idx = jnp.minimum((jnp.arange(S) + 1) * R - 1, T - 1)
    meas = meas.at[idx].set(fixes)
    meas_valid = meas_valid.at[idx].set(out.converged)

    log = eskf.ESKFLog(dt=imu_dt, acc=imu_acc, gyro=imu_gyro,
                       meas=meas, meas_valid=meas_valid)
    _, traj = eskf.eskf_run(log, None, config.eskf)
    return FusionOutput(
        poses=out.poses, fused_p=traj["p"], fused_v=traj["v"],
        fused_q=traj["q"], converged=out.converged,
    )


# Per-chip fleet width that keeps the NDT stats gathers in the fast cache
# regime on v5e. Measured on chip (S=16, 16k-pt scans, 8k work capacity,
# aggregate scans/s): B=8 -> 235, B=16 -> 331, B=32 -> 273, B=64 -> 104.
# Wider lockstep fleets push the combined per-lane hash tables (2 MB each)
# past the fast-gather footprint — at B=64 the [B, K*N] stats gathers run
# at ~26 ns/row vs ~10 at B=16, and gathers are >60% of the program
# (docs/TPU_NOTES.md "Fleet batched-gather experiment").
FLEET_CHUNK = 16


def fleet_fusion(scans_xyzi, scans_mask, imu_acc, imu_gyro, imu_dt,
                 config: FusionConfig = FusionConfig(),
                 chunk: int = FLEET_CHUNK) -> FusionOutput:
    """Run a B-lane fleet of independent fusion sequences on one chip.

    Lanes run vmap-batched in chunks of ``chunk`` and the chunks run
    sequentially (``lax.map``), which is bit-identical per lane to one
    wide vmap — each lane's program touches only its own data — but keeps
    the working set of the gather-bound NDT inner loops inside the fast
    footprint regime (see ``FLEET_CHUNK``). The reference's counterpart
    is N independent single-threaded processes (one ROS node per
    sequence); here the fleet is one compiled program per chip, shardable
    over a mesh via ``parallel.batch.sharded_fusion``.
    """
    B = scans_xyzi.shape[0]
    if B % chunk:
        raise ValueError(f"fleet width {B} not divisible by chunk {chunk}")
    # Batched lanes keep XLA's unpack for the stats repack: at the fleet's
    # 8192-point lanes the batch-gridded Pallas repack kernel measured ~4%
    # slower than the batched XLA passes (single-sequence it wins big —
    # see NDTConfig.repack_pallas). Bit-identical either way.
    if config.odometry.ndt.repack_pallas is None:
        config = config._replace(odometry=config.odometry._replace(
            ndt=config.odometry.ndt._replace(repack_pallas=False)))
    n = B // chunk
    if n == 1:
        return jax.vmap(lambda *a: ndt_eskf_fusion(*a, config=config))(
            scans_xyzi, scans_mask, imu_acc, imu_gyro, imu_dt)

    def regroup(x):
        return x.reshape((n, chunk) + x.shape[1:])

    out = jax.lax.map(
        lambda a: jax.vmap(lambda *b: ndt_eskf_fusion(*b, config=config))(*a),
        tuple(map(regroup, (scans_xyzi, scans_mask, imu_acc, imu_gyro,
                            imu_dt))))
    return jax.tree_util.tree_map(
        lambda x: x.reshape((B,) + x.shape[2:]), out)
