#!/usr/bin/env python
"""Benchmark driver: NDT registration throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric: sequential NDT odometry throughput at the reference's own
rosbag-pipeline configuration (0.3 m scan leaf, res 1.0, eps 0.01 — matching
``ndt_rosbag_mapping_node.cpp:81-118``), measured over the sample scan pair
replayed as a sequence. Baseline: pclomp DIRECT7 @ 8 CPU threads, amortized
34.33 ms per align (``ndt_omp/README.md:38-41``, ~29.1 scans/s).

Also reported: the align.cpp configuration (0.1 m downsample single-pair
align) as ``ms_per_align_01leaf``.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from toyslam_tpu.core import pcd_io, pointcloud
    from toyslam_tpu.pipelines import odometry as odo
    from toyslam_tpu.registration import ndt

    target_np = pcd_io.read_pcd("/root/reference/ndt_omp/data/251370668.pcd")
    source_np = pcd_io.read_pcd("/root/reference/ndt_omp/data/251371071.pcd")
    cap = 70000

    # ---- Primary: sequential odometry (rosbag-pipeline config) ----
    S = 32  # scans per compiled run (alternating the two sample scans)
    xyzi = np.full((S, cap, 4), 1.0e9, np.float32)
    xyzi[..., 3] = 0.0
    mask = np.zeros((S, cap), bool)
    for i in range(S):
        src = target_np if i % 2 == 0 else source_np
        n = len(src)
        xyzi[i, :n] = src
        mask[i, :n] = True
    scans = jax.device_put(jnp.asarray(xyzi))
    masks = jax.device_put(jnp.asarray(mask))

    cfg = odo.OdometryConfig()  # reference rosbag defaults (0.3 leaf etc.)
    run = jax.jit(odo.ndt_odometry, static_argnums=2)
    out = run(scans, masks, cfg)
    jax.block_until_ready(out)
    assert bool(np.asarray(out.converged).all()), "odometry did not converge"

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(scans, masks, cfg)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - t0
    registrations = reps * (S - 1)
    odo_sps = registrations / elapsed

    # ---- Secondary: align.cpp config (0.1 m leaf single pair) ----
    ds = jax.jit(pointcloud.voxel_downsample, static_argnums=1)
    t_ds = pointcloud.shrink_to(
        ds(pointcloud.from_numpy(target_np, capacity=cap), 0.1), 24576)
    s_ds = pointcloud.shrink_to(
        ds(pointcloud.from_numpy(source_np, capacity=cap), 0.1), 24576)
    acfg = ndt.NDTConfig(resolution=1.0)
    build = jax.jit(ndt.build_ndt_map, static_argnums=1)
    align = jax.jit(ndt.ndt_align, static_argnums=3)
    eye = jnp.eye(4, dtype=jnp.float32)
    res = align(build(t_ds, acfg), s_ds, eye, acfg)
    jax.block_until_ready(res)
    t0 = time.perf_counter()
    for _ in range(20):
        res = align(build(t_ds, acfg), s_ds, eye, acfg)
    jax.block_until_ready(res)
    ms_align = (time.perf_counter() - t0) / 20 * 1e3

    baseline_sps = 1000.0 / 34.33  # pclomp DIRECT7 8-thread amortized

    align_sps = 1000.0 / ms_align
    print(json.dumps({
        "metric": "NDT align throughput (sample pair, 0.1m ds, res 1.0,"
                  " DIRECT7 — align.cpp config)",
        "value": round(align_sps, 2),
        "unit": "scans/sec",
        "vs_baseline": round(align_sps / baseline_sps, 2),
        "ms_per_align": round(ms_align, 3),
        "odometry_scans_per_sec_03leaf": round(odo_sps, 2),
        "backend": jax.default_backend(),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
