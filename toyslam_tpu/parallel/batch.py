"""Batch / multi-chip scaling layer.

The reference's only "distributed" axis is running independent ROS nodes on
one machine (SURVEY §2.4). The TPU-native equivalents:

- ``vmap_align``      — vmap over independent scan pairs (one chip).
- ``sharded_odometry``— shard a batch of independent scan *sequences* over a
  ``jax.sharding.Mesh`` data axis; each device runs its sequences' ``lax.scan``
  locally, trajectories are all-gathered (rides ICI). This is the 64-way
  "batched odometry" BASELINE config.

- ``sharded_align``   — tensor-parallel single align: the SOURCE POINTS are
  sharded over the mesh (map replicated); each device computes its shard's
  partial derivative sums and one [28]-vector ``psum`` per evaluation rides
  ICI. Latency-scales one registration across chips (the collective payload
  is tiny, so efficiency stays near-linear until shards get gather-bound).

Sequence-level sharding needs no collectives inside the registration math;
``sharded_align`` is the model-parallel option when a single huge scan (or
a latency target) matters more than batch throughput.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from toyslam_tpu.core.pointcloud import PointCloud
from toyslam_tpu.pipelines import odometry as odo
from toyslam_tpu.registration import ndt


def vmap_align(targets_xyzi, targets_mask, sources_xyzi, sources_mask,
               config: ndt.NDTConfig = ndt.NDTConfig()):
    """Align B independent pairs in one compiled program.

    targets/sources: [B, N, 4] + [B, N]. Returns NDTResult with leading B.
    """

    def one(t_xyzi, t_mask, s_xyzi, s_mask):
        m = ndt.build_ndt_map(PointCloud(t_xyzi, t_mask), config)
        return ndt.ndt_align(
            m, PointCloud(s_xyzi, s_mask),
            jnp.eye(4, dtype=t_xyzi.dtype), config,
        )

    return jax.vmap(one)(targets_xyzi, targets_mask, sources_xyzi, sources_mask)


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    """1-D device mesh over all visible devices.

    Multi-host: under ``jax.distributed.initialize`` (one process per
    host), ``jax.devices()`` already spans every host's chips, so the
    same data-parallel shardings work across hosts — sequence-level
    sharding has no inter-sequence collectives, so nothing rides DCN but
    the final all-gather; ``sharded_align``'s per-evaluation [28]-float
    psum is latency-bound on DCN and should stay within one host's ICI
    (pass that host's device slice).
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devs), (axis,))


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None):
    """Join a multi-host run (the framework's DCN story).

    Thin wrapper over ``jax.distributed.initialize`` so launchers don't
    import jax internals: call once per host process before any backend
    use; afterwards ``make_mesh()`` spans the full pod slice. No-op if
    already initialized (checked explicitly — a second
    ``jax.distributed.initialize`` after the backend came up raises a
    generic RuntimeError, not an "already initialized" one).
    """
    try:
        if jax.distributed.is_initialized():
            return
    except AttributeError:  # older jax without is_initialized
        pass
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    except RuntimeError as e:  # raced/duplicate initialization
        if "already" not in str(e):
            raise


def sharded_odometry(mesh: Mesh, scans_xyzi, scans_mask,
                     config: odo.OdometryConfig = odo.OdometryConfig(),
                     axis: str = "data"):
    """Run B independent odometry sequences sharded over the mesh data axis.

    scans: [B, S, N, 4] / [B, S, N] with B divisible by mesh size. Each
    device scans its local sequences; outputs stay sharded (gather at the
    caller if a replicated trajectory is wanted).
    """
    batched = jax.vmap(partial(odo.ndt_odometry, config=config))

    in_specs = (P(axis), P(axis))
    out_specs = P(axis)

    fn = jax.shard_map(
        lambda x, m: batched(x, m),
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=False,
    )
    return fn(scans_xyzi, scans_mask)


def sharded_fusion(mesh: Mesh, scans_xyzi, scans_mask, imu_acc, imu_gyro,
                   imu_dt, config=None, axis: str = "data"):
    """Shard the fused NDT+ESKF pipeline over independent sequences.

    All inputs carry a leading batch dim divisible by the mesh size.
    (BASELINE config 5: 64-way batched odometry + EKF fusion.)
    """
    from toyslam_tpu.pipelines import fusion as fus

    cfg = config or fus.FusionConfig()
    batched = jax.vmap(partial(fus.ndt_eskf_fusion, config=cfg))
    fn = jax.shard_map(
        batched,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    return fn(scans_xyzi, scans_mask, imu_acc, imu_gyro, imu_dt)


def sharded_align(mesh: Mesh, ndt_map: ndt.NDTMap, source: PointCloud,
                  guess=None, config: ndt.NDTConfig = ndt.NDTConfig(),
                  axis: str = "data"):
    """Point-sharded SPMD NDT align over the mesh.

    source capacity must be divisible by the mesh size; the map and guess
    are replicated, every device runs the identical Newton/More-Thuente
    scalar program on psum-completed derivatives, and the (replicated)
    result is returned unsharded.
    """
    if guess is None:
        guess = jnp.eye(4, dtype=source.xyzi.dtype)

    def local(map_, xyzi_shard, mask_shard, g):
        res = ndt.ndt_align(map_, PointCloud(xyzi_shard, mask_shard), g,
                            config, axis_name=axis)
        return res

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(ndt_map, source.xyzi, source.mask, guess)


def sharded_batch_fusion(mesh: Mesh, imu_acc, imu_gyro, imu_dt, imu_valid,
                         meas_t, meas_p, meas_p_valid, config=None,
                         axis: str = "data"):
    """Shard B independent streaming-smoother logs over the mesh data axis
    (the flagship estimator as a fleet: one UWB/GPS+IMU log per vehicle).

    All inputs carry a leading batch dim divisible by the mesh size;
    leaves of the returned BatchFusionOutput stay sharded on that axis.
    """
    from toyslam_tpu.pipelines import batch_fusion as bf

    cfg = config or bf.BatchFusionConfig()
    batched = jax.vmap(partial(bf.batch_fusion, config=cfg))
    fn = jax.shard_map(
        batched,
        mesh=mesh,
        in_specs=(P(axis),) * 7,
        out_specs=P(axis),
        check_vma=False,
    )
    return fn(imu_acc, imu_gyro, imu_dt, imu_valid, meas_t, meas_p,
              meas_p_valid)
