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


def _chunked_lanes(one_lane, chunk: int):
    """Per-device lane runner: execute the local lanes as SEQUENTIAL
    ``lax.map`` chunks of ``chunk`` vmapped lanes instead of one wide vmap.

    Bit-identical per lane to the wide vmap (lanes never interact), but it
    keeps the lockstep gather working set inside the measured fast
    footprint regime on real chips: per-device widths past ~16 lanes push
    the combined NDT stats tables out of the fast-gather footprint
    (B=16 -> 331 agg scans/s vs B=64 -> 104 on v5e; docs/TPU_NOTES.md
    "Fleet efficiency", ``fusion.FLEET_CHUNK``). A local batch that is
    not a multiple of ``chunk`` runs floor(B/chunk) full chunks plus one
    narrower remainder vmap — NO lane ever runs in a wider-than-chunk
    lockstep group (the former silent wide-vmap fallback put e.g. a
    24-lane/device fleet straight into the measured slow regime).
    """

    def run(*args):
        B = args[0].shape[0]
        if B <= chunk:
            return jax.vmap(one_lane)(*args)
        n, rem = divmod(B, chunk)

        def regroup(x):
            return x[:n * chunk].reshape((n, chunk) + x.shape[1:])

        out = jax.lax.map(lambda a: jax.vmap(one_lane)(*a),
                          tuple(map(regroup, args)))
        flat = jax.tree_util.tree_map(
            lambda x: x.reshape((n * chunk,) + x.shape[2:]), out)
        if not rem:
            return flat
        tail = jax.vmap(one_lane)(*(a[n * chunk:] for a in args))
        return jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a, b], axis=0), flat, tail)

    return run


def _fleet_chunk(chunk: int | None) -> int:
    if chunk is not None:
        return chunk
    from toyslam_tpu.pipelines import fusion as fus

    return fus.FLEET_CHUNK


def _pin_repack(ndt_cfg):
    # Batched (vmapped) lanes keep XLA's unpack for the stats repack: at
    # fleet-sized lanes the batch-gridded Pallas repack kernel measured
    # ~4% slower than the batched XLA passes (single-sequence it wins
    # big). Bit-identical either way; see fusion.fleet_fusion.
    if ndt_cfg.repack_pallas is None:
        return ndt_cfg._replace(repack_pallas=False)
    return ndt_cfg


def sharded_odometry(mesh: Mesh, scans_xyzi, scans_mask,
                     config: odo.OdometryConfig = odo.OdometryConfig(),
                     axis: str = "data", chunk: int | None = None):
    """Run B independent odometry sequences sharded over the mesh data axis.

    scans: [B, S, N, 4] / [B, S, N] with B divisible by mesh size. Each
    device scans its local sequences as sequential ``chunk``-lane vmap
    groups (default ``fusion.FLEET_CHUNK`` — the measured fast gather-
    footprint regime; see ``_chunked_lanes``); outputs stay sharded
    (gather at the caller if a replicated trajectory is wanted).
    """
    config = config._replace(ndt=_pin_repack(config.ndt))
    lanes = _chunked_lanes(partial(odo.ndt_odometry, config=config),
                           _fleet_chunk(chunk))

    fn = jax.shard_map(
        lanes,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    return fn(scans_xyzi, scans_mask)


def sharded_fusion(mesh: Mesh, scans_xyzi, scans_mask, imu_acc, imu_gyro,
                   imu_dt, config=None, axis: str = "data",
                   chunk: int | None = None):
    """Shard the fused NDT+ESKF pipeline over independent sequences.

    All inputs carry a leading batch dim divisible by the mesh size.
    (BASELINE config 5: 64-way batched odometry + EKF fusion.) Each
    device runs its local lanes as sequential ``chunk``-lane vmap groups
    exactly like ``fusion.fleet_fusion`` (see ``_chunked_lanes``).
    """
    from toyslam_tpu.pipelines import fusion as fus

    cfg = config or fus.FusionConfig()
    cfg = cfg._replace(odometry=cfg.odometry._replace(
        ndt=_pin_repack(cfg.odometry.ndt)))
    lanes = _chunked_lanes(partial(fus.ndt_eskf_fusion, config=cfg),
                           _fleet_chunk(chunk))
    fn = jax.shard_map(
        lanes,
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
                         axis: str = "data", chunk: int | None = None):
    """Shard B independent streaming-smoother logs over the mesh data axis
    (the flagship estimator as a fleet: one UWB/GPS+IMU log per vehicle).

    All inputs carry a leading batch dim divisible by the mesh size;
    leaves of the returned BatchFusionOutput stay sharded on that axis.
    Local lanes run as sequential ``chunk``-lane vmap groups (see
    ``_chunked_lanes`` — the smoother has no stats gathers, but its
    batched dense linear algebra has the same working-set scaling, so it
    inherits the same default).
    """
    from toyslam_tpu.pipelines import batch_fusion as bf

    cfg = config or bf.BatchFusionConfig()
    lanes = _chunked_lanes(partial(bf.batch_fusion, config=cfg),
                           _fleet_chunk(chunk))
    fn = jax.shard_map(
        lanes,
        mesh=mesh,
        in_specs=(P(axis),) * 7,
        out_specs=P(axis),
        check_vma=False,
    )
    return fn(imu_acc, imu_gyro, imu_dt, imu_valid, meas_t, meas_p,
              meas_p_valid)
