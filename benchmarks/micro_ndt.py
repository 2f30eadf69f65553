#!/usr/bin/env python
"""Micro-benchmarks for the NDT align inner loop on the real chip.

Answers (for the 256k odometry config, NK = 24576*7 = 172032):
  1. eval cost with frozen stats (no gathers), hessian on/off
  2. gather cost: current 2-gather (lut rows + table rows) vs a direct
     hash-addressed stats table (1 gather) at different grid capacities
  3. map build sub-stage costs and the effect of map/grid capacity
"""

import sys
sys.path.insert(0, "/root/repo")

import time

import numpy as np


def timed(run, args_fn, reps, n_timed=3, label=""):
    import jax

    jax.block_until_ready(run(*args_fn(0)))
    jax.block_until_ready(run(*args_fn(1)))
    times = []
    for r in range(n_timed):
        a = args_fn(2 + r)
        t0 = time.perf_counter()
        out = run(*a)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / reps * 1e3)
    keep = [t for t in times if t > 0.3 * max(times)]
    ms = min(keep)
    print(f"{label:44s} {ms:8.3f} ms")
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from toyslam_tpu.core import pcd_io, pointcloud
    from toyslam_tpu.core.pointcloud import PointCloud
    from toyslam_tpu.registration import ndt

    print("backend:", jax.default_backend())
    target_np = pcd_io.read_pcd("/root/reference/ndt_omp/data/251370668.pcd")
    rng = np.random.default_rng(0)
    copies = []
    for i in range(4):
        c = target_np.copy()
        c[:, :3] += rng.normal(0, 0.02, (len(c), 3)).astype(np.float32)
        c[:, :2] += np.array([30.0 * i, 60.0 * (i % 2)], np.float32)
        copies.append(c)
    big = np.concatenate(copies)[:262144]

    cap = 24576
    cfg = ndt.NDTConfig(resolution=1.0, map_capacity=8192)
    ds = jax.jit(pointcloud.voxel_downsample, static_argnums=(1, 2))
    cloud = ds(PointCloud(jnp.asarray(big), jnp.ones((262144,), bool)),
               0.3, cap)
    cloud = jax.block_until_ready(cloud)
    m = jax.jit(ndt.build_ndt_map, static_argnums=1)(cloud, cfg)
    m = jax.block_until_ready(m)
    d1, d2, _ = ndt.gauss_coefficients(1.0, 0.55)
    offsets = ndt._OFFSETS["DIRECT7"]
    src_xyz = cloud.xyzi[:, :3]
    src_mask = cloud.mask
    REPS = 16
    epss = [jax.device_put(np.linspace(0, 1e-5, REPS).astype(np.float32)
                           + np.float32(r * 1e-5)) for r in range(8)]

    p0 = jnp.zeros(6, jnp.float32)
    stats = ndt.gather_neighborhood(m, src_xyz, src_mask, p0, 1.0, offsets)
    stats = jax.block_until_ready(stats)

    # ---- 1. eval with frozen stats ----
    def eval_only(hessian):
        def many(eps):
            def one(carry, k):
                p = p0.at[0].add(eps[k])
                s, g, h = ndt.compute_derivatives(
                    m, src_xyz, src_mask, p, d1, d2, 1.0, offsets,
                    compute_hessian=hessian, stats=stats)
                return carry + s, None

            tot, _ = jax.lax.scan(one, jnp.float32(0), jnp.arange(REPS))
            return tot

        return jax.jit(many)

    timed(eval_only(True), lambda r: (epss[r],), REPS,
          label="eval frozen stats, hessian")
    timed(eval_only(False), lambda r: (epss[r],), REPS,
          label="eval frozen stats, no hessian")

    # ---- 2a. gather (current 2-gather path) ----
    def many_gather(eps):
        def one(carry, k):
            p = p0.at[0].add(eps[k])
            s = ndt.gather_neighborhood(m, src_xyz, src_mask, p, 1.0,
                                        offsets)
            return carry + s.mx[0] + s.cxx[0], None

        tot, _ = jax.lax.scan(one, jnp.float32(0), jnp.arange(REPS))
        return tot

    timed(jax.jit(many_gather), lambda r: (epss[r],), REPS,
          label="gather_neighborhood 2-gather (grid 64k)")

    # ---- 2b. direct hash-addressed stats table, 1 gather ----
    for g_bits in (14, 15, 16):
        g_cap = 1 << g_bits

        # scatter valid table rows to hash slots
        h = np.asarray(m.unique_ids) & (g_cap - 1)
        valid = np.asarray(m.valid)
        big_table = np.zeros((g_cap, 16), np.float32)
        big_table[:, 10] = -1
        big_table[:, 11] = -1
        big_table[h[valid]] = np.asarray(m.table)[valid]
        bt = jax.device_put(jnp.asarray(big_table))

        def many_direct(table, eps, g_cap=g_cap):
            inv_leaf = jnp.float32(1.0)

            def one(carry, k):
                p = p0.at[0].add(eps[k])
                T = jnp.eye(4, dtype=jnp.float32).at[0, 3].add(p[0])
                xyz = src_xyz + T[:3, 3]
                N = xyz.shape[0]
                K = len(offsets)
                ijk = jnp.floor(xyz * inv_leaf).astype(jnp.int32) - m.min_b
                off = jnp.asarray(offsets, jnp.int32)
                nijk = ijk[:, None, :] + off[None, :, :]
                nvid = jnp.sum(nijk * m.div_mul, -1).reshape(N * K)
                hh = nvid & (g_cap - 1)
                rows = table[hh]  # [NK, 16] one gather
                return carry + rows[0, 0] + rows[1, 3], None

            tot, _ = jax.lax.scan(one, jnp.float32(0), jnp.arange(REPS))
            return tot

        timed(jax.jit(many_direct), lambda r: (bt, epss[r]), REPS,
              label=f"direct stats gather 1-gather (grid {g_cap})")

    # ---- 3. map build capacity sweep ----
    for mc, gc in ((8192, 1 << 16), (4096, 1 << 14), (2048, 1 << 14)):
        cfg2 = ndt.NDTConfig(resolution=1.0, map_capacity=mc,
                             grid_capacity=gc)

        def many_map(xyzi, mask, eps, cfg2=cfg2):
            def one(carry, k):
                mm = ndt.build_ndt_map(
                    PointCloud(xyzi.at[0, 0].add(eps[k]), mask), cfg2)
                return carry + mm.table[0, 0], mm.valid.sum()

            tot, v = jax.lax.scan(one, jnp.float32(0), jnp.arange(REPS))
            return tot, v

        run = jax.jit(many_map)
        timed(run, lambda r: (cloud.xyzi, cloud.mask, epss[r]), REPS,
              label=f"build_ndt_map cap={mc} grid={gc}")
        _, v = run(cloud.xyzi, cloud.mask, epss[0])
        print(f"    valid voxels: {int(np.asarray(v)[0])}")


if __name__ == "__main__":
    main()
