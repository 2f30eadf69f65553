"""Toy incremental ICP mapping pipeline.

Capability port of ``ICP/iterative_closest_point/icpslam.py`` (10 random
frames ICP-aligned into an accumulated map, ``:31-54``) and ``toyicp.py``'s
iteration-by-iteration alignment demo — as one ``lax.scan`` program:
each frame is ICP-aligned to the accumulated map, chained into the
trajectory, and merged into a bounded map cloud.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from toyslam_tpu.core.pointcloud import PointCloud, voxel_downsample
from toyslam_tpu.registration import icp

_HP = jax.lax.Precision.HIGHEST


class IcpSlamConfig(NamedTuple):
    icp: icp.ICPConfig = icp.ICPConfig()
    map_capacity: int = 16384
    map_leaf: float = 0.2  # bounded-map refilter


class IcpSlamOutput(NamedTuple):
    poses: jax.Array  # [S, 4, 4]
    errors: jax.Array  # [S] final ICP mean matched distance
    map_xyzi: jax.Array  # [M, 4]
    map_mask: jax.Array  # [M]


def icp_slam(scans_xyzi, scans_mask,
             config: IcpSlamConfig = IcpSlamConfig()) -> IcpSlamOutput:
    """Incremental ICP mapping over a scan stack [S, N, 4]."""
    dtype = scans_xyzi.dtype
    M = config.map_capacity
    eye = jnp.eye(4, dtype=dtype)

    first = PointCloud(scans_xyzi[0], scans_mask[0])
    map0 = voxel_downsample(first, config.map_leaf)
    from toyslam_tpu.core.pointcloud import pad_to

    map0 = pad_to(map0, M)

    def step(carry, scan):
        map_cloud, pose = carry
        xyzi, mask = scan
        cur = PointCloud(xyzi, mask)

        res = icp.icp_align(cur, map_cloud, guess=pose, config=config.icp)
        pose_new = jnp.where(res.converged, res.transform, pose)

        # Merge the aligned frame into the bounded map
        world_xyz = jnp.matmul(cur.xyzi[:, :3], pose_new[:3, :3].T,
                               precision=_HP) + pose_new[:3, 3]
        world_xyz = jnp.where(cur.mask[:, None], world_xyz, cur.xyzi[:, :3])
        merged = PointCloud(
            jnp.concatenate(
                [map_cloud.xyzi,
                 jnp.concatenate([world_xyz, cur.xyzi[:, 3:4]], 1)], 0),
            jnp.concatenate([map_cloud.mask, cur.mask], 0),
        )
        refiltered = voxel_downsample(merged, config.map_leaf)
        new_map = PointCloud(refiltered.xyzi[:M], refiltered.mask[:M])
        return (new_map, pose_new), (pose_new, res.error)

    (final_map, _), (poses, errors) = jax.lax.scan(
        step, (map0, eye), (scans_xyzi[1:], scans_mask[1:]))
    poses = jnp.concatenate([eye[None], poses], 0)
    errors = jnp.concatenate([jnp.zeros((1,), dtype), errors])
    return IcpSlamOutput(poses, errors, final_map.xyzi, final_map.mask)
