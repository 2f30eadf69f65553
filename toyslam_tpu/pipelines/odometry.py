"""Sequential NDT odometry / mapping pipelines as ``lax.scan`` programs.

Capability port of the reference's pipeline nodes:

- ``ndt_odometry``  — scan-to-previous-scan NDT with warm start and pose
  chaining, the loop of ``ndt_rosbag_mapping_node.cpp:27-144`` (warm start
  ``:130``, pose chain ``pose = pose * T`` ``:64``, identity fallback on
  non-convergence ``:140-143``) and ``ndt_omp_mapping_node.cpp:88-97``.
- ``ndt_mapping``   — odometry + bounded global map accumulation
  (reference re-voxelizes the whole map each scan at 0.5 m,
  ``ndt_rosbag_mapping_node.cpp:146-161``; here a fixed-capacity voxel
  re-filter keeps shapes static and memory bounded).

The ROS graph is replaced by pure functions over pre-decoded scan stacks
``[S, N, 4]``; everything runs as one compiled program per call.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from toyslam_tpu.core.pointcloud import PointCloud, voxel_downsample
from toyslam_tpu.registration import ndt

_HP = jax.lax.Precision.HIGHEST


class OdometryConfig(NamedTuple):
    """Shipped default = the round-3 measured config that satisfies BOTH
    BASELINE targets with one setting (driver targets: >= 100 scans/s on
    256k-pt scans AND trajectory ATE <= 1e-3 m vs pclomp): 133 scans/s on
    the TPU v5e 256k bench and 7.6e-4 m ATE vs the f64 golden over a
    64-scan drifting sequence (test_parity_config_long_sequence_ate_vs_
    golden; frontier table in docs/TPU_NOTES.md)."""

    ndt: ndt.NDTConfig = ndt.NDTConfig(
        # ndt_rosbag_mapping_node defaults (:81-92,103): res 1.0, step 0.1,
        # 64 iters (the Newton loop is a lax.while_loop with early exit,
        # so the full budget costs nothing once converged). map_capacity
        # sized for single-scan maps.
        resolution=1.0,
        step_size=0.1,
        # The reference's rosbag node uses eps 0.01 (:103); the tighter
        # 0.001 here is what makes long-chain golden parity hold: the
        # eps-ball termination slack random-walks over chained aligns
        # (measured 64-scan ATE 1.6e-2 at eps 0.01 vs 7.6e-4 at 0.001 —
        # for EVERY control-flow variant, including exact), while warm
        # starts keep the extra Newton iterations near zero (~2.2 -> 2.3
        # average) and the 256k throughput at 133 scans/s.
        transformation_epsilon=0.001,
        max_iterations=64,
        map_capacity=8192,
        # 32k hash slots comfortably hold the <= 8192 map voxels (aliasing
        # ~1-2% at single-scan occupancies) and halve the per-scan
        # hash-table scatter/init cost vs the 64k default.
        grid_capacity=1 << 15,
        # Line-search trials reuse the first trial's voxel gather (the
        # dominant cost); first-trial-accepted iterations stay exact.
        frozen_linesearch=True,
        # Regather the voxel neighborhood for the first 4 Newton steps and
        # carry it afterwards: gathers are the hard cost floor
        # (~9-12 ns/row), warm-started odometry poses move sub-voxel after
        # a few steps, and 4 regathers keep the 64-scan golden-parity ATE
        # at 7.6e-4 m (2 regathers drifted to 2.2e-3; the carry still
        # saves the gathers of late iterations on hard aligns).
        regather_iterations=4,
    )
    scan_leaf: float = 0.3  # per-scan downsample (``:88``)
    map_leaf: float = 0.5  # global-map re-filter (``:153``)
    warm_start: bool = True  # align(prev_transform) (``:130``)
    # Static capacity of the downsampled working clouds inside the scan
    # loop. 0.3 m-leaf urban scans hold ~4-15k points; keeping the full raw
    # capacity would make every registration process dead padded lanes.
    work_capacity: int = 16384
    # Coarse-to-fine align: run Newton first on a coarser downsample of the
    # source (same map), then refine on the full working cloud warm-started
    # from the coarse pose. OFF by default: measured round 3 (verified
    # elision-proof harness), the coarse stage no longer pays for itself
    # at the 256k scale (133 scans/s without vs 117 with) and its guess
    # perturbation breaks the <= 1e-3 golden-parity bound (64-scan ATE
    # 1.8e-3 even with a fully-regathered fine stage). Retained as an
    # opt-in for cold starts / poor initial guesses.
    coarse_leaf: float = 0.0
    coarse_capacity: int = 6144
    # Fine-stage regather budget when coarse-to-fine is enabled (the
    # coarse pose is already sub-voxel, so a frozen initial gather can
    # serve the refinement; 0 = freeze the initial gather).
    fine_regather: int = 0
    # Carry the intensity channel through the per-scan downsample. NDT
    # never reads it, so odometry defaults to False (drops ~20% of the
    # downsample's sort/segment-reduce payload traffic; poses are
    # bit-identical). The mapping pipelines force it True — the
    # reference's global map averages intensity like any field
    # (pcl::VoxelGrid in ``ndt_rosbag_mapping_node.cpp:108-118``).
    keep_intensity: bool = False


class OdometryOutput(NamedTuple):
    poses: jax.Array  # [S, 4, 4] world-from-scan
    pairwise: jax.Array  # [S, 4, 4] T(scan_{i-1} <- scan_i)
    converged: jax.Array  # [S]
    iterations: jax.Array  # [S]
    trans_probability: jax.Array  # [S]
    # Per-scan work accounting (coarse + fine stages summed): derivative
    # evaluations and full stats-table gathers — drives bench.py's
    # pct_of_gather_floor utilization line.
    evaluations: jax.Array = 0  # [S]
    gathers: jax.Array = 0  # [S]


def _scan_step(cfg: OdometryConfig):
    def step(carry, scan):
        prev_ds, pose, prev_T = carry
        xyzi, mask = scan
        cur = PointCloud(xyzi, mask)
        cur_ds = voxel_downsample(cur, cfg.scan_leaf, cfg.work_capacity,
                                  with_intensity=cfg.keep_intensity)

        m = ndt.build_ndt_map(prev_ds, cfg.ndt)
        guess = prev_T if cfg.warm_start else jnp.eye(4, dtype=xyzi.dtype)
        n_ev = jnp.zeros((), jnp.int32)
        n_ga = jnp.zeros((), jnp.int32)
        if cfg.coarse_leaf > 0:
            # Coarse stage: same map, fewer source points (downsampled
            # from the already-downsampled working cloud — cheap sort).
            # (Cheapening the coarse stage further — regather 1 or a
            # loosened eps — was measured to push the end-to-end deviation
            # past the 5 mm bound; its seeding quality is load-bearing.)
            cur_coarse = voxel_downsample(cur_ds, cfg.coarse_leaf,
                                          cfg.coarse_capacity,
                                          with_intensity=cfg.keep_intensity)
            res_c = ndt.ndt_align(m, cur_coarse, guess, cfg.ndt)
            guess = jnp.where(res_c.converged, res_c.transform, guess)
            n_ev += res_c.evaluations
            n_ga += res_c.gathers
            fine_cfg = cfg.ndt._replace(
                regather_iterations=min(cfg.fine_regather,
                                        cfg.ndt.regather_iterations))
            res = ndt.ndt_align(m, cur_ds, guess, fine_cfg)
        else:
            res = ndt.ndt_align(m, cur_ds, guess, cfg.ndt)
        n_ev += res.evaluations
        n_ga += res.gathers

        eye = jnp.eye(4, dtype=xyzi.dtype)
        T = jnp.where(res.converged, res.transform, eye)
        pose_new = jnp.matmul(pose, T, precision=_HP)
        out = (pose_new, T, res.converged, res.iterations,
               res.trans_probability, n_ev, n_ga)
        return (cur_ds, pose_new, T), out

    return step


def ndt_odometry(scans_xyzi, scans_mask, config: OdometryConfig = OdometryConfig(),
                 initial_pose=None) -> OdometryOutput:
    """Run NDT odometry over a scan stack [S, N, 4] / [S, N].

    Scan 0 seeds the target; poses[0] = initial_pose (identity by default).
    """
    dtype = scans_xyzi.dtype
    S = scans_xyzi.shape[0]
    if initial_pose is None:
        initial_pose = jnp.eye(4, dtype=dtype)

    first = PointCloud(scans_xyzi[0], scans_mask[0])
    first_ds = voxel_downsample(first, config.scan_leaf,
                                config.work_capacity,
                                with_intensity=config.keep_intensity)
    eye = jnp.eye(4, dtype=dtype)

    carry0 = (first_ds, initial_pose.astype(dtype), eye)
    step = _scan_step(config)
    _, outs = jax.lax.scan(step, carry0, (scans_xyzi[1:], scans_mask[1:]))
    poses_rest, pairwise_rest, conv, iters, prob, evals, gathers = outs

    poses = jnp.concatenate([initial_pose[None].astype(dtype), poses_rest], 0)
    pairwise = jnp.concatenate([eye[None], pairwise_rest], 0)
    converged = jnp.concatenate([jnp.ones((1,), bool), conv])
    iterations = jnp.concatenate([jnp.zeros((1,), iters.dtype), iters])
    probs = jnp.concatenate([jnp.zeros((1,), dtype), prob])
    zero_i = jnp.zeros((1,), evals.dtype)
    return OdometryOutput(poses, pairwise, converged, iterations, probs,
                          jnp.concatenate([zero_i, evals]),
                          jnp.concatenate([zero_i, gathers]))


class MappingOutput(NamedTuple):
    odometry: OdometryOutput
    map_xyzi: jax.Array  # [M, 4] accumulated global map (voxel filtered)
    map_mask: jax.Array  # [M]


def _merge_into_map(map_cloud: PointCloud, cur_ds: PointCloud, pose,
                    config: "OdometryConfig") -> PointCloud:
    """Transform the downsampled scan into the world frame, merge into the
    fixed-capacity map and re-apply the map voxel filter (the reference's
    unbounded concat+refilter, ``ndt_rosbag_mapping_node.cpp:146-161``,
    made memory-static). Capacity = map_cloud's own (static) row count."""
    world_xyz = jnp.matmul(
        cur_ds.xyzi[:, :3], pose[:3, :3].T, precision=_HP) + pose[:3, 3]
    world_xyz = jnp.where(cur_ds.mask[:, None], world_xyz,
                          cur_ds.xyzi[:, :3])
    merged = PointCloud(
        jnp.concatenate(
            [map_cloud.xyzi,
             jnp.concatenate([world_xyz, cur_ds.xyzi[:, 3:4]], 1)], 0),
        jnp.concatenate([map_cloud.mask, cur_ds.mask], 0),
    )
    return voxel_downsample(merged, config.map_leaf,
                            map_cloud.xyzi.shape[0])


def ndt_mapping(scans_xyzi, scans_mask, map_capacity: int,
                config: OdometryConfig = OdometryConfig()) -> MappingOutput:
    """Odometry + bounded global-map accumulation.

    Each step transforms the downsampled scan into the world frame, merges it
    into a fixed-capacity map cloud and re-applies the 0.5 m voxel filter
    (the reference's unbounded concat+refilter, made memory-static).
    """
    # The global map averages intensity like the reference's VoxelGrid;
    # keep the channel regardless of the odometry default.
    config = config._replace(keep_intensity=True)
    dtype = scans_xyzi.dtype
    N = scans_xyzi.shape[1]

    first = PointCloud(scans_xyzi[0], scans_mask[0])
    first_ds = voxel_downsample(first, config.scan_leaf,
                                config.work_capacity)

    map0 = voxel_downsample(first_ds, config.map_leaf)
    from toyslam_tpu.core.pointcloud import pad_to

    map0 = pad_to(map0, map_capacity)

    eye = jnp.eye(4, dtype=dtype)
    step_odo = _scan_step(config)

    def step(carry, scan):
        odo_carry, map_cloud = carry
        odo_carry_new, out = step_odo(odo_carry, scan)
        cur_ds, pose_new, _T = odo_carry_new
        new_map = _merge_into_map(map_cloud, cur_ds, pose_new, config)
        return (odo_carry_new, new_map), out

    carry0 = ((first_ds, eye, eye), map0)
    (_, final_map), outs = jax.lax.scan(
        step, carry0, (scans_xyzi[1:], scans_mask[1:])
    )
    poses_rest, pairwise_rest, conv, iters, prob, evals, gathers = outs
    poses = jnp.concatenate([eye[None], poses_rest], 0)
    pairwise = jnp.concatenate([eye[None], pairwise_rest], 0)
    zero_i = jnp.zeros((1,), evals.dtype)
    odo = OdometryOutput(
        poses,
        pairwise,
        jnp.concatenate([jnp.ones((1,), bool), conv]),
        jnp.concatenate([jnp.zeros((1,), iters.dtype), iters]),
        jnp.concatenate([jnp.zeros((1,), dtype), prob]),
        jnp.concatenate([zero_i, evals]),
        jnp.concatenate([zero_i, gathers]),
    )
    return MappingOutput(odo, final_map.xyzi, final_map.mask)


class OdometryState(NamedTuple):
    """Carry for online (scan-at-a-time) odometry — the streaming mode of
    ``ndt_omp_mapping_node`` (scans appearing over time, ``:72-108``)."""

    prev_ds: PointCloud
    pose: jax.Array  # [4, 4]
    prev_T: jax.Array  # [4, 4]


def odometry_init(first_xyzi, first_mask,
                  config: OdometryConfig = OdometryConfig()) -> OdometryState:
    first_ds = voxel_downsample(PointCloud(first_xyzi, first_mask),
                                config.scan_leaf, config.work_capacity,
                                with_intensity=config.keep_intensity)
    eye = jnp.eye(4, dtype=first_xyzi.dtype)
    return OdometryState(prev_ds=first_ds, pose=eye, prev_T=eye)


def odometry_step(state: OdometryState, xyzi, mask,
                  config: OdometryConfig = OdometryConfig()):
    """Process one scan; returns (new_state, (pose, pairwise_T, converged,
    iterations, trans_probability)). jit this with static config and feed it
    from a host loop / runtime.loader.ScanStream."""
    carry, out = _scan_step(config)((state.prev_ds, state.pose, state.prev_T),
                                    (xyzi, mask))
    prev_ds, pose, prev_T = carry
    return OdometryState(prev_ds=prev_ds, pose=pose, prev_T=prev_T), out


class MappingState(NamedTuple):
    """Carry for online (scan-at-a-time) mapping — odometry plus the
    bounded global map, i.e. the full streaming loop of
    ``ndt_omp_mapping_node`` (dir watch -> align -> accumulate map ->
    publish, ``:72-108,195-211``). A pure pytree: snapshot it with
    ``utils/checkpoint`` and resume bit-identically mid-bag."""

    odometry: OdometryState
    map_cloud: PointCloud


def mapping_init(first_xyzi, first_mask, map_capacity: int,
                 config: OdometryConfig = OdometryConfig()) -> MappingState:
    from toyslam_tpu.core.pointcloud import pad_to

    config = config._replace(keep_intensity=True)  # see ndt_mapping
    odo = odometry_init(first_xyzi, first_mask, config)
    map0 = pad_to(voxel_downsample(odo.prev_ds, config.map_leaf),
                  map_capacity)
    return MappingState(odometry=odo, map_cloud=map0)


def mapping_step(state: MappingState, xyzi, mask,
                 config: OdometryConfig = OdometryConfig()):
    """One scan of online mapping; chained steps match ``ndt_mapping``
    exactly (``test_online_mapping_step_matches_batch``). Returns
    (new_state, (pose, pairwise_T, converged, iterations, prob))."""
    config = config._replace(keep_intensity=True)  # see ndt_mapping
    odo_state, out = odometry_step(state.odometry, xyzi, mask, config)
    new_map = _merge_into_map(state.map_cloud, odo_state.prev_ds,
                              odo_state.pose, config)
    return MappingState(odometry=odo_state, map_cloud=new_map), out
