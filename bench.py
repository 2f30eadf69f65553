#!/usr/bin/env python
"""Benchmark driver: NDT registration throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measurement note: the execution runtime in this environment was observed to
elide repeated dispatches with identical (or converged-identical) inputs, so
every number here comes from a SINGLE device dispatch that performs all
repetitions internally in a ``lax.scan`` — nothing host-visible repeats.

Primary metric: amortized single-pair NDT align at the align.cpp
configuration (0.1 m downsample, resolution 1.0, DIRECT7) — the config with
a published reference number: pclomp DIRECT7 @ 8 CPU threads, 34.33 ms
amortized (``ndt_omp/README.md:38-41``, ~29.1 scans/s).

Also reported: sequential odometry throughput at the reference's
rosbag-pipeline configuration (0.3 m scan leaf, warm start), one lax.scan
over a 32-scan stack.
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

    # ---- Primary: align.cpp config, 24 aligns inside one lax.scan ----
    ds = jax.jit(pointcloud.voxel_downsample, static_argnums=(1, 2))
    # 0.1 m-leaf downsamples of the sample pair hold ~15.8/16.0k points;
    # capacities sized to the data (dead lanes cost linearly).
    t_ds = ds(pointcloud.from_numpy(target_np, capacity=cap), 0.1, 16384)
    s_ds = ds(pointcloud.from_numpy(source_np, capacity=cap), 0.1, 16384)
    acfg = ndt.NDTConfig(resolution=1.0, map_capacity=8192)
    REPS = 24

    def many_aligns(t_cloud, s_cloud, eps):
        # Map built once per dispatch, outside the rep scan — align.cpp's
        # own timing loop re-aligns against one setInputTarget too
        # (``ndt_omp/apps/align.cpp:88-105``).
        m = ndt.build_ndt_map(t_cloud, acfg)

        def one(carry, k):
            guess = jnp.eye(4, dtype=jnp.float32).at[0, 3].add(eps[k])
            r = ndt.ndt_align(m, s_cloud, guess, acfg)
            return carry + r.pose6, (r.converged, r.pose6)

        total, (conv, poses) = jax.lax.scan(
            one, jnp.zeros(6, jnp.float32), jnp.arange(REPS))
        return total, conv, poses

    run_aligns = jax.jit(many_aligns)
    eps = jax.device_put(np.linspace(0, 1e-4, REPS).astype(np.float32))
    out = run_aligns(t_ds, s_ds, eps)
    jax.block_until_ready(out)
    assert bool(np.asarray(out[1]).all()), "align did not converge"
    # Steady state needs >= 2 warm runs (the first timed run after a single
    # warmup measured ~5x inflated); distinct small inputs per run prevent
    # the runtime's repeated-dispatch elision. Report the min of 3.
    jax.block_until_ready(run_aligns(t_ds, s_ds, eps + np.float32(1e-4)))
    times = []
    for r in range(3):
        shift = np.float32(2e-4 + r * 1e-4)
        t0 = time.perf_counter()
        out = run_aligns(t_ds, s_ds, eps + shift)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / REPS * 1e3)
    # drop outright-elided runs (stale buffers in ~0 ms) before the min
    ms_align = min(t for t in times if t > 0.3 * max(times))
    align_sps = 1000.0 / ms_align

    # ---- Secondary: sequential odometry (rosbag config), one dispatch ----
    S = 32
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
    cfg = odo.OdometryConfig()
    run = jax.jit(lambda s_, m_, d: odo.ndt_odometry(s_ + d, m_, cfg))
    jax.block_until_ready(run(scans, masks, jnp.float32(0.0)))
    jax.block_until_ready(run(scans, masks, jnp.float32(1e-5)))
    times = []
    for r in range(3):
        t0 = time.perf_counter()
        outo = run(scans, masks, jnp.float32(2e-5 + r * 1e-5))
        jax.block_until_ready(outo)
        times.append(time.perf_counter() - t0)
    odo_sps = (S - 1) / min(t for t in times if t > 0.3 * max(times))

    # ---- Tertiary: 256k-point scans (driver target scale), one dispatch.
    # SYNTHETIC input: the UrbanNav bag is absent, so each 262144-pt scan
    # is four jittered, spatially shifted copies of the 69k sample cloud
    # with realistic scan-to-scan motion (0.3 m/scan). S2=32 scans inside
    # one lax.scan amortize the per-dispatch relay overhead the way a real
    # bag replay would. ----
    S2 = 32
    rng = np.random.default_rng(0)
    copies = []
    for i in range(4):
        c = target_np.copy()
        c[:, :3] += rng.normal(0, 0.02, (len(c), 3)).astype(np.float32)
        c[:, :2] += np.array([30.0 * i, 60.0 * (i % 2)], np.float32)
        copies.append(c)
    big = np.concatenate(copies)[:262144]
    big_scans = np.stack([big + np.float32(0)] * S2)
    for k in range(S2):
        big_scans[k, :, 0] -= 0.3 * k
        big_scans[k, :, 1] -= 0.1 * k
    big_scans = jax.device_put(jnp.asarray(big_scans))
    big_masks = jax.device_put(jnp.ones((S2, 262144), bool))
    cfg256 = odo.OdometryConfig(work_capacity=24576)
    run256 = jax.jit(
        lambda s_, m_, d: odo.ndt_odometry(s_ + d, m_, cfg256))
    jax.block_until_ready(run256(big_scans, big_masks, jnp.float32(0.0)))
    jax.block_until_ready(run256(big_scans, big_masks, jnp.float32(1e-5)))
    times = []
    for r in range(3):
        t0 = time.perf_counter()
        o256 = run256(big_scans, big_masks, jnp.float32(2e-5 + r * 1e-5))
        jax.block_until_ready(o256)
        times.append(time.perf_counter() - t0)
    assert bool(np.asarray(o256.converged)[1:].all()), "256k odometry diverged"
    sps256 = (S2 - 1) / min(t for t in times if t > 0.3 * max(times))

    baseline_sps = 1000.0 / 34.33  # pclomp DIRECT7 8-thread amortized

    print(json.dumps({
        "metric": "NDT align throughput (sample pair, 0.1m ds, res 1.0,"
                  " DIRECT7 - align.cpp config)",
        "value": round(align_sps, 2),
        "unit": "scans/sec",
        "vs_baseline": round(align_sps / baseline_sps, 2),
        "ms_per_align": round(ms_align, 3),
        "odometry_scans_per_sec_03leaf": round(odo_sps, 2),
        "odometry_scans_per_sec_256kpt_synthetic": round(sps256, 2),
        "backend": jax.default_backend(),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
