#!/usr/bin/env python
"""Per-stage breakdown of the 256k-point odometry step (VERDICT r1 item 2).

Times each stage of one odometry scan step separately on the real chip with
the honest single-dispatch recipe from docs/TPU_NOTES.md: R repetitions
inside one lax.scan with per-rep distinct small inputs, >=2 warm runs,
min over >=3 timed runs after dropping elided (<30% of max) runs.

Stages:
  downsample  voxel_downsample 262144 -> work_capacity   (per scan)
  map_build   build_ndt_map on the downsampled cloud     (per scan)
  align       ndt_align warm-started                     (per scan)
  full_step   the composed odometry _scan_step           (per scan)
"""

import sys
sys.path.insert(0, "/root/repo")

import argparse
import json
import time

import numpy as np


def make_256k(target_np):
    rng = np.random.default_rng(0)
    copies = []
    for i in range(4):
        c = target_np.copy()
        c[:, :3] += rng.normal(0, 0.02, (len(c), 3)).astype(np.float32)
        c[:, :2] += np.array([30.0 * i, 60.0 * (i % 2)], np.float32)
        copies.append(c)
    big = np.concatenate(copies)[:262144]
    nxt = big.copy()
    nxt[:, 0] -= 0.3
    nxt[:, 1] -= 0.1
    return big, nxt


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
    print(f"{label:12s} {ms:8.3f} ms/scan   (runs: "
          + " ".join(f"{t:.3f}" for t in times) + ")")
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work-capacity", type=int, default=24576)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--regather", type=int, default=None,
                    help="NDTConfig.regather_iterations override")
    ap.add_argument("--pallas", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from toyslam_tpu.core import pcd_io, pointcloud
    from toyslam_tpu.core.pointcloud import PointCloud
    from toyslam_tpu.pipelines import odometry as odo
    from toyslam_tpu.registration import ndt

    print("backend:", jax.default_backend())
    target_np = pcd_io.read_pcd("/root/reference/ndt_omp/data/251370668.pcd")
    big, nxt = make_256k(target_np)
    REPS = args.reps

    cfg = odo.OdometryConfig(work_capacity=args.work_capacity)
    ncfg = cfg.ndt
    if args.regather is not None:
        ncfg = ncfg._replace(regather_iterations=args.regather)
    if args.pallas:
        ncfg = ncfg._replace(use_pallas=True)
    cfg = cfg._replace(ndt=ncfg)

    big_d = jax.device_put(jnp.asarray(big))
    nxt_d = jax.device_put(jnp.asarray(nxt))
    mask_d = jax.device_put(jnp.ones((262144,), bool))

    # ---- stage: downsample ----
    def many_ds(xyzi, mask, eps):
        def one(carry, k):
            c = PointCloud(xyzi.at[0, 0].add(eps[k]), mask)
            d = pointcloud.voxel_downsample(c, cfg.scan_leaf,
                                            cfg.work_capacity)
            return carry + d.xyzi[0, 0], d.count

        tot, cnts = jax.lax.scan(one, jnp.float32(0), jnp.arange(REPS))
        return tot, cnts

    run_ds = jax.jit(many_ds)
    epss = [jax.device_put(np.linspace(0, 1e-5, REPS).astype(np.float32)
                           + np.float32(r * 1e-5)) for r in range(8)]
    ms_ds = timed(run_ds, lambda r: (big_d, mask_d, epss[r]), REPS,
                  label="downsample")
    _, cnts = run_ds(big_d, mask_d, epss[0])
    print(f"  downsampled count: {int(np.asarray(cnts)[0])} "
          f"/ capacity {cfg.work_capacity}")

    # Precompute downsampled clouds for isolated map/align stages
    ds_prev = jax.jit(pointcloud.voxel_downsample, static_argnums=(1, 2))(
        PointCloud(big_d, mask_d), cfg.scan_leaf, cfg.work_capacity)
    ds_cur = jax.jit(pointcloud.voxel_downsample, static_argnums=(1, 2))(
        PointCloud(nxt_d, mask_d), cfg.scan_leaf, cfg.work_capacity)
    ds_prev = jax.block_until_ready(ds_prev)
    ds_cur = jax.block_until_ready(ds_cur)

    # ---- stage: map build ----
    def many_map(xyzi, mask, eps):
        def one(carry, k):
            m = ndt.build_ndt_map(PointCloud(xyzi.at[0, 0].add(eps[k]), mask),
                                  cfg.ndt)
            return carry + m.table[0, 0], m.valid.sum()

        tot, v = jax.lax.scan(one, jnp.float32(0), jnp.arange(REPS))
        return tot, v

    run_map = jax.jit(many_map)
    ms_map = timed(run_map, lambda r: (ds_prev.xyzi, ds_prev.mask, epss[r]),
                   REPS, label="map_build")
    _, vv = run_map(ds_prev.xyzi, ds_prev.mask, epss[0])
    print(f"  valid voxels: {int(np.asarray(vv)[0])} "
          f"/ map_capacity {cfg.ndt.map_capacity}")

    # ---- stage: align (warm start = small offset, like odometry) ----
    m_prev = jax.jit(ndt.build_ndt_map, static_argnums=1)(ds_prev, cfg.ndt)
    m_prev = jax.block_until_ready(m_prev)

    def many_align(table, src_xyzi, src_mask, eps):
        m = m_prev._replace(hash_table=table)

        def one(carry, k):
            guess = jnp.eye(4, dtype=jnp.float32).at[0, 3].add(eps[k])
            r = ndt.ndt_align(m, PointCloud(src_xyzi, src_mask), guess,
                              cfg.ndt)
            return carry + r.pose6, (r.converged, r.iterations)

        tot, (conv, iters) = jax.lax.scan(one, jnp.zeros(6, jnp.float32),
                                          jnp.arange(REPS))
        return tot, conv, iters

    run_al = jax.jit(many_align)
    ms_al = timed(run_al,
                  lambda r: (m_prev.hash_table, ds_cur.xyzi, ds_cur.mask, epss[r]),
                  REPS, label="align")
    _, conv, iters = run_al(m_prev.hash_table, ds_cur.xyzi, ds_cur.mask, epss[0])
    print(f"  converged: {np.asarray(conv).all()}, "
          f"iters: {np.asarray(iters).tolist()}")

    # ---- full composed step ----
    S2 = 4
    big_scans = np.stack([big] * S2)
    for k in range(S2):
        big_scans[k, :, 0] -= 0.3 * k
        big_scans[k, :, 1] -= 0.1 * k
    scans_d = jax.device_put(jnp.asarray(big_scans))
    masks_d = jax.device_put(jnp.ones((S2, 262144), bool))
    run256 = jax.jit(lambda s_, m_, d: odo.ndt_odometry(s_ + d, m_, cfg))

    def run_full(s_, m_, d):
        return run256(s_, m_, d)

    deltas = [jax.device_put(np.float32(r * 1e-5)) for r in range(8)]
    ms_full = timed(run_full, lambda r: (scans_d, masks_d, deltas[r]),
                    S2 - 1, label="full_step")

    print(json.dumps({
        "work_capacity": args.work_capacity,
        "regather": args.regather,
        "pallas": args.pallas,
        "ms_downsample": round(ms_ds, 3),
        "ms_map_build": round(ms_map, 3),
        "ms_align": round(ms_al, 3),
        "ms_full_step": round(ms_full, 3),
        "scans_per_sec_full": round(1000.0 / ms_full, 2),
    }))


if __name__ == "__main__":
    main()
