#!/usr/bin/env python
"""Sub-stage cost of voxel_downsample at 256k (round 5).

profile_stages_r5.py showed the 256k odometry step is downsample-bound
(~2.96 of ~5.2 ms/scan; map build only ~0.29 ms) — so this splits the
downsample itself with the same honest recipe (stages as runnable
prefixes inside a lax.scan, full stage output checksummed):

  ids        masked_min_max + voxel id computation
  +sort      + the 5-operand kv sort (keys + 4 masked coordinate chans)
  +tree      + the 18-round segmented doubling-tree reduction
  full       the real voxel_downsample (adds the compaction sort +
             centroid finalization)
"""

import sys

sys.path.insert(0, "/root/repo")

import json

import numpy as np

import bench as B

CAP = 16384  # the SHIPPED work_capacity (stages_r5 used 24576)


def main():
    import jax
    import jax.numpy as jnp

    from toyslam_tpu.core import pcd_io, pointcloud as pc

    print("backend:", jax.default_backend(), file=sys.stderr)
    target_np = pcd_io.read_pcd("/root/reference/ndt_omp/data/251370668.pcd")
    S = 16
    big_np = B._big_scans(target_np, S)
    masks = jax.device_put(jnp.ones((S, 262144), bool))
    leaf = 0.3

    def stage_ids(scans, m):
        def step(c, sm):
            x, mk = sm
            vid, min_b, div_mul = pc.voxel_ids(pc.PointCloud(x, mk), leaf)
            return c + jnp.sum(vid) + jnp.sum(min_b) + jnp.sum(div_mul), None
        out, _ = jax.lax.scan(step, jnp.int32(0), (scans, m))
        return out

    def _sorted(x, mk):
        cloud = pc.PointCloud(x, mk)
        vid, _, _ = pc.voxel_ids(cloud, leaf)
        px = jnp.where(mk, x[:, 0], 0.0)
        py = jnp.where(mk, x[:, 1], 0.0)
        pz = jnp.where(mk, x[:, 2], 0.0)
        pi = jnp.where(mk, x[:, 3], 0.0)
        return jax.lax.sort((vid, px, py, pz, pi), num_keys=1)

    def stage_sort(scans, m):
        def step(c, sm):
            x, mk = sm
            sv, sx, sy, sz, si = _sorted(x, mk)
            return c + sx[0] + sy[-1] + sz[100] + si[7] + sv[0].astype(
                jnp.float32) + sx[-1] + sy[0], None
        out, _ = jax.lax.scan(step, jnp.float32(0), (scans, m))
        return out

    def stage_tree(scans, m):
        def step(c, sm):
            x, mk = sm
            sv, sx, sy, sz, si = _sorted(x, mk)
            n = sv.shape[0]
            first = jnp.concatenate(
                [jnp.ones((1,), bool), sv[1:] != sv[:-1]]
            ) & (sv != jnp.iinfo(jnp.int32).max)
            pos = jnp.cumsum(first.astype(jnp.int32)) - 1
            w = (sv != jnp.iinfo(jnp.int32).max).astype(jnp.float32)
            vals = jnp.stack([w, sx * w, sy * w, sz * w, si * w])
            seg_start = jax.lax.cummax(
                jnp.where(first, jnp.arange(n, dtype=jnp.int32), -1))
            off = jnp.arange(n, dtype=jnp.int32) - seg_start
            k = 1
            while k < n:
                take = ((off % (2 * k)) == 0) & (pos == jnp.concatenate(
                    [pos[k:], jnp.full((k,), -1, pos.dtype)]))
                shifted = jnp.concatenate(
                    [vals[:, k:], jnp.zeros((vals.shape[0], k),
                                            jnp.float32)], axis=1)
                vals = vals + jnp.where(take[None, :], shifted, 0.0)
                k *= 2
            return c + jnp.sum(vals[:, ::97]), None
        out, _ = jax.lax.scan(step, jnp.float32(0), (scans, m))
        return out

    def stage_full(scans, m):
        def step(c, sm):
            x, mk = sm
            d = pc.voxel_downsample(pc.PointCloud(x, mk), leaf, CAP)
            return c + jnp.sum(d.xyzi * jnp.where(d.mask[:, None], 1.0, 0.0)
                               ) + jnp.sum(d.mask), None
        out, _ = jax.lax.scan(step, jnp.float32(0), (scans, m))
        return out

    res = {}
    for name, fn in (("ids", stage_ids), ("+sort", stage_sort),
                     ("+tree", stage_tree), ("full", stage_full)):
        run = B._jit_with_probe(fn)
        sec, _ = B._timed(
            run, lambda r: (jax.device_put(
                jnp.asarray(big_np + np.float32(1e-3 * r))), masks))
        res[name] = round(sec / S * 1e3, 3)
        print(f"{name:8s} {res[name]:.3f} ms/scan", file=sys.stderr)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
