#!/usr/bin/env python
"""Registration benchmark CLI: ``python apps/align.py target.pcd source.pcd``.

Capability port of ``ndt_omp/apps/align.cpp``: 0.1 m voxel downsample of
both clouds, then times ICP, GICP and NDT {DIRECT7, DIRECT1, DIRECT27}
(single + amortized over 10 runs) and prints fitness scores. Headless —
no PCLVisualizer; use utils/evalio exports for inspection.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv):
    if len(argv) != 3:
        print("usage: align.py target.pcd source.pcd")
        return 0

    import jax
    import jax.numpy as jnp

    from toyslam_tpu.core import pcd_io, pointcloud
    from toyslam_tpu.registration import gicp, icp, ndt

    target_np = pcd_io.read_pcd(argv[1])
    source_np = pcd_io.read_pcd(argv[2])
    cap = max(len(target_np), len(source_np))
    target = pointcloud.from_numpy(target_np, capacity=cap)
    source = pointcloud.from_numpy(source_np, capacity=cap)

    ds = jax.jit(pointcloud.voxel_downsample, static_argnums=(1, 2))
    t_ds = ds(target, 0.1, 24576)
    s_ds = ds(source, 0.1, 24576)
    jax.block_until_ready((t_ds, s_ds))
    eye = jnp.eye(4, dtype=jnp.float32)
    fitness = jax.jit(ndt.fitness_score)

    def bench(name, fn):
        res = fn()
        jax.block_until_ready(res)
        t1 = time.perf_counter()
        res = fn()
        jax.block_until_ready(res)
        single = (time.perf_counter() - t1) * 1e3
        t2 = time.perf_counter()
        for _ in range(10):
            res = fn()
        jax.block_until_ready(res)
        ten = (time.perf_counter() - t2) * 1e3
        fit = float(fitness(s_ds, t_ds, res.transform))
        print(f"--- {name} ---")
        print(f"single : {single:.3f}[msec]")
        print(f"10times: {ten:.3f}[msec]")
        print(f"fitness: {fit:.6f}\n")

    bench("ICP", lambda: icp.icp_align(s_ds, t_ds, eye))
    bench("GICP", lambda: gicp.gicp_align(s_ds, t_ds, eye))

    build = jax.jit(ndt.build_ndt_map, static_argnums=1)
    align = jax.jit(ndt.ndt_align, static_argnums=3)
    for method in ("DIRECT7", "DIRECT1", "DIRECT27"):
        cfg = ndt.NDTConfig(resolution=1.0, search_method=method)
        bench(f"NDT ({method})",
              lambda c=cfg: align(build(t_ds, c), s_ds, eye, c))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
