#!/usr/bin/env python
"""Honest-recipe per-stage cost of the 256k odometry step (round 5).

profile_256k.py's isolated stages get elided/DCE'd (downsample measured
0.005 ms); this version keeps every stage inside a lax.scan over S scans
with the FULL stage output checksummed into the carry, measured with
bench.py's _timed (fresh uploads + checksum-close). Stages are nested
prefixes of the real step, so subtraction attributes cost:

  ds        voxel_downsample(262144 -> work_capacity)
  ds+map    + build_ndt_map on the downsampled cloud
  full      the real composed odometry step (bench config, S=32)
"""

import sys
sys.path.insert(0, "/root/repo")

import json

import numpy as np

import bench as B


def main():
    import jax
    import jax.numpy as jnp

    from toyslam_tpu.core import pcd_io
    from toyslam_tpu.core.pointcloud import PointCloud, voxel_downsample
    from toyslam_tpu.pipelines import odometry as odo
    from toyslam_tpu.registration import ndt

    print("backend:", jax.default_backend(), file=sys.stderr)
    target_np = pcd_io.read_pcd("/root/reference/ndt_omp/data/251370668.pcd")
    S = 16
    big_np = B._big_scans(target_np, S)
    masks = jax.device_put(jnp.ones((S, 262144), bool))
    cfg = odo.OdometryConfig(work_capacity=24576)

    def stage_ds(scans, m):
        def step(c, sm):
            x, mk = sm
            d = voxel_downsample(PointCloud(x, mk), cfg.scan_leaf,
                                 cfg.work_capacity)
            return c + jnp.sum(d.xyzi * jnp.where(d.mask[:, None], 1.0, 0.0)
                               ) + jnp.sum(d.mask), None
        out, _ = jax.lax.scan(step, jnp.float32(0), (scans, m))
        return out

    def stage_dsmap(scans, m):
        def step(c, sm):
            x, mk = sm
            d = voxel_downsample(PointCloud(x, mk), cfg.scan_leaf,
                                 cfg.work_capacity)
            nm = ndt.build_ndt_map(d, cfg.ndt)
            return c + jnp.sum(nm.hash_table) + jnp.sum(nm.mean3), None
        out, _ = jax.lax.scan(step, jnp.float32(0), (scans, m))
        return out

    res = {}
    for name, fn, scans_per_run in (("ds", stage_ds, S),
                                    ("ds+map", stage_dsmap, S)):
        run = B._jit_with_probe(fn)
        sec, _ = B._timed(
            run, lambda r: (jax.device_put(
                jnp.asarray(big_np + np.float32(1e-3 * r))), masks))
        res[name] = round(sec / scans_per_run * 1e3, 3)
        print(f"{name:8s} {res[name]:.3f} ms/scan", file=sys.stderr)

    run = B._jit_with_probe(lambda s_, m_: odo.ndt_odometry(s_, m_, cfg))
    sec, out = B._timed(
        run, lambda r: (jax.device_put(
            jnp.asarray(big_np + np.float32(1e-3 * r))), masks))
    res["full"] = round(sec / (S - 1) * 1e3, 3)
    res["iters"] = np.asarray(out.iterations).tolist()
    res["gathers"] = np.asarray(out.gathers).tolist()
    res["evals"] = np.asarray(out.evaluations).tolist()
    d = jax.jit(voxel_downsample, static_argnums=(1, 2))(
        PointCloud(jnp.asarray(big_np[0]), masks[0]), cfg.scan_leaf,
        cfg.work_capacity)
    res["ds_count"] = int(np.asarray(d.count))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
