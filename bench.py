#!/usr/bin/env python
"""Benchmark driver: the framework's headline numbers, ONE JSON line.

Measurement note: the execution runtime in this environment elides repeated
dispatches aggressively — round-3 measurements showed it returning stale
results in ~0.1 ms even when small input buffers (scalars, 100-float
vectors) carry NEW values; only dispatches whose LARGE array operands are
freshly uploaded device buffers with changed contents reliably execute. So
every number here comes from a SINGLE device dispatch that performs all
repetitions internally in a ``lax.scan``, and every timed run receives its
large inputs as a fresh ``jax.device_put`` of host-jittered numpy (upload
happens outside the timed region), with two warm runs and elided-run
rejection (< 30% of max) before taking the min.

Primary metric: amortized single-pair NDT align at the align.cpp
configuration (0.1 m downsample, resolution 1.0, DIRECT7) — the config with
a published reference number: pclomp DIRECT7 @ 8 CPU threads, 34.33 ms
amortized (``ndt_omp/README.md:38-41``, ~29.1 scans/s).

Also reported (all honest-recipe):
- sequential odometry at the rosbag config (0.3 m leaf, warm start);
- 256k-point odometry, BOTH the shipped turbo default and the
  exact-reference-control-flow config (BASELINE demands >=100 scans/s AND
  <=1e-3 m ATE; the exact config is the one the golden-parity tests pin);
- full-bag mapping with bounded map accumulation (BASELINE config 4);
- 64-way batched NDT odometry + ESKF fusion (BASELINE config 5);
- flagship sliding-window smoother (window 20, f32) keyframes/s;
- LOAM feature odometry scans/s;
- GICP and toy ICP ms/align on the sample pair (configs 1-2 kernels);
- GNSS local-frame f32 epoch solve epochs/s (gnss/local.py).
"""

import json
import sys
import time

import numpy as np


def _jit_with_probe(fn, probe=0):
    """jit ``fn`` so the dispatch ALSO returns a checksum of input
    ``probe``'s first array leaf, computed INSIDE the program. An elided
    dispatch hands back the previous run's outputs — including this
    checksum — so staleness is detectable; and because the value depends
    on the fresh input, fetching it to host provably waits for this run's
    execution."""
    import jax
    import jax.numpy as jnp

    def wrapped(*a):
        out = fn(*a)
        chk = sum(
            jnp.sum(leaf.reshape(-1)[:8192].astype(jnp.float32))
            for leaf in jax.tree_util.tree_leaves(a[probe]))
        return out, chk

    return jax.jit(wrapped)


def _force_resident(args):
    """Touch every uploaded array ON DEVICE and fetch one element, so its
    bytes are provably resident before the timing window opens.

    Defensive: ``jax.block_until_ready`` on a ``device_put`` result is
    not documented to await the relay's actual byte transfer. The r5
    noop controls (benchmarks/profile_soa_ab.py) showed the dominant
    fixed cost is the ~25 ms/program dispatch+fetch round-trip, not a
    hidden upload (forcing residency moved the noop floor only 0.84 ->
    0.79 ms/scan at S=32) — but this guard pins any upload tail outside
    the window for ~one extra round-trip per run, outside the timing.
    """
    import jax
    import jax.numpy as jnp

    for a in jax.tree_util.tree_leaves(args):
        if hasattr(a, "ravel") and getattr(a, "size", 0):
            float(jnp.ravel(a)[-1].astype(jnp.float32))


def _timed(run, make_args, reps_inside=1):
    """Two warm runs + 4 verified timed runs (min >= 3); returns
    (best_sec, last_out).

    ``run`` must come from ``_jit_with_probe`` (returns (out, checksum)).
    ``make_args(r)`` MUST return freshly ``device_put`` large-array
    operands with r-dependent contents (uploads happen here, outside the
    timed region, and are forced resident by ``_force_resident`` before
    the clock starts). A timed run only counts if its checksum differs
    from the previous run's — the runtime in this environment was
    observed (r3) to elide dispatches and hand back stale buffers in
    ~0.1 ms even for changed inputs; the timing window closes on the
    host fetch of the checksum, which cannot complete before this run's
    real execution.
    """
    import jax

    r_next = 0

    def call():
        nonlocal r_next
        a = make_args(r_next)
        r_next += 1
        jax.block_until_ready(a)
        _force_resident(a)
        t0 = time.perf_counter()
        out, chk = run(*a)
        chk_v = float(chk)  # closes the timing window
        dt = time.perf_counter() - t0
        return out, chk_v, dt

    _, last_chk, _ = call()  # warm runs (compile + cache)
    _, c, _ = call()
    if c != last_chk:
        last_chk = c
    times, out = [], None
    for _attempt in range(12):
        out, c, dt = call()
        if c == last_chk:  # stale output: the dispatch was elided
            continue
        last_chk = c
        times.append(dt)
        if len(times) == 4:
            break
    if len(times) < 3:
        raise RuntimeError(
            "dispatch elision defeated the measurement (stale checksums)")
    jax.block_until_ready(out)
    best = min(t for t in times if t > 0.3 * max(times))
    return best / reps_inside, out


def bench_align(jax, jnp, t_ds, s_ds, ndt):
    acfg = ndt.NDTConfig(resolution=1.0, map_capacity=8192)
    # 96 aligns per dispatch: the relay round-trip is ~25 ms per timed
    # program (r5 noop control, benchmarks/profile_soa_ab.py) — at 24
    # reps that was ~1 ms/align of pure overhead in a ~1.6 ms metric.
    REPS = 96

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

    run = _jit_with_probe(many_aligns, probe=1)
    eps = np.linspace(0, 1e-4, REPS).astype(np.float32)
    s_np = np.asarray(s_ds.xyzi)

    # Elision hardening: a fresh host-jittered UPLOAD of the source cloud
    # per run (r mm shifts — unelidable, converged pose unchanged far
    # below the 1 m resolution; see module docstring).
    def args(r):
        from toyslam_tpu.core.pointcloud import PointCloud

        s_jit = PointCloud(
            jax.device_put(jnp.asarray(s_np + np.float32(1e-3 * r))),
            s_ds.mask)
        return (t_ds, s_jit, jax.device_put(eps + np.float32(1e-4 * r)))

    sec, out = _timed(run, args, reps_inside=REPS)
    assert bool(np.asarray(out[1]).all()), "align did not converge"
    return sec * 1e3  # ms per align


def _scan_stack(target_np, source_np, S, cap):
    xyzi = np.full((S, cap, 4), 1.0e9, np.float32)
    xyzi[..., 3] = 0.0
    mask = np.zeros((S, cap), bool)
    for i in range(S):
        src = target_np if i % 2 == 0 else source_np
        n = len(src)
        xyzi[i, :n] = src
        mask[i, :n] = True
    return xyzi, mask


def _big_scans(target_np, S2=32):
    """SYNTHETIC 262144-pt scans: the UrbanNav bag is absent, so each scan
    is four jittered, spatially shifted copies of the 69k sample cloud with
    realistic scan-to-scan motion (0.3 m/scan)."""
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
    return big_scans


# Measured hash-table row-gather rate of the composed odometry program on
# the v5e: ~1.5 ns/row with the single-scan map resident in alternate
# memory (benchmarks/profile_exact_trace.py round 4: fusion.999 at
# 0.26 ms / 172032 rows; docs/TPU_NOTES.md "Exact control flow to 126
# scans/s"). The utilization line divides this floor by measured wall so
# perf claims stay auditable against physics rather than prior rounds.
GATHER_NS_PER_ROW = 1.5


def bench_odometry(jax, jnp, odo, scans_np, masks, cfg, S,
                   floor_out: dict | None = None, floor_key: str = ""):
    """scans_np: HOST numpy stack; each timed run uploads a fresh r mm
    jittered copy (see module docstring — device-side `+ d` is elided).

    With ``floor_out``, also records ``pct_of_gather_floor`` for this
    config: executed stats-table gather rows (from the odometry's own
    work accounting) x the measured ns/row floor, over measured wall.
    """
    run = _jit_with_probe(lambda s_, m_: odo.ndt_odometry(s_, m_, cfg))
    sec, out = _timed(
        run,
        lambda r: (jax.device_put(
            jnp.asarray(scans_np + np.float32(1e-3 * r))), masks))
    assert bool(np.asarray(out.converged)[1:].all()), "odometry diverged"
    if floor_out is not None:
        rows_per_gather = cfg.work_capacity * 7  # DIRECT7
        rows = int(np.asarray(out.gathers)[1:].sum()) * rows_per_gather
        floor_sec = rows * GATHER_NS_PER_ROW * 1e-9
        floor_out[floor_key] = round(100.0 * floor_sec / sec, 1)
    return (S - 1) / sec  # scans per second


def bench_batch64_fusion(jax, jnp, target_np):
    """BASELINE config 5: 64 independent sequences x (NDT odometry + ESKF
    fusion), sequence-level batching on the single chip. Lanes run in
    chunks of ``fusion.FLEET_CHUNK`` (measured on-chip optimum: wider
    lockstep fleets leave the fast gather-footprint regime — see
    ``fusion.fleet_fusion``); S=16 so steady state dominates the lockstep
    cold start (the S=4 shape spent most of its time in the first align).
    The same program shards over a mesh via parallel.batch.sharded_fusion.
    """
    from toyslam_tpu.pipelines import fusion as fus
    from toyslam_tpu.pipelines import odometry as odo
    from toyslam_tpu.registration import ndt

    B, S, R = 64, 16, 20
    cap = 16384
    rng = np.random.default_rng(1)
    base = target_np[
        rng.choice(len(target_np), cap, replace=False)].astype(np.float32)
    xyzi = np.zeros((B, S, cap, 4), np.float32)
    for b in range(B):
        for s in range(S):
            jit_pts = base.copy()
            jit_pts[:, 0] += 0.3 * s + 0.01 * b
            jit_pts[:, 1] += 0.1 * s
            xyzi[b, s] = jit_pts
    mask = np.ones((B, S, cap), bool)
    imu_acc = np.tile(np.asarray([0.0, 0.0, 9.81], np.float32),
                      (B, S * R, 1))
    imu_gyro = np.zeros((B, S * R, 3), np.float32)
    imu_dt = np.full((B, S * R), 0.005, np.float32)

    cfg = fus.FusionConfig(
        odometry=odo.OdometryConfig(work_capacity=8192),
        imu_per_scan=R)
    run = _jit_with_probe(lambda *a: fus.fleet_fusion(*a, config=cfg))
    rest = tuple(map(jax.device_put, (jnp.asarray(mask),
                                      jnp.asarray(imu_acc),
                                      jnp.asarray(imu_gyro),
                                      jnp.asarray(imu_dt))))
    sec, out = _timed(
        run,
        lambda r: (jax.device_put(
            jnp.asarray(xyzi + np.float32(1e-3 * r))),) + rest)
    assert bool(np.isfinite(np.asarray(out.fused_p)).all())
    return B * (S - 1) / sec  # aggregate scans/s across the fleet


def bench_smoother(jax, jnp):
    """Flagship sliding-window smoother (window 20 — the reference default,
    ``uwb_imu_batch_node.cpp:3229``) in f32, keyframes/s."""
    from toyslam_tpu.pipelines import batch_fusion as bf

    # M=256 keyframes per dispatch: device time is ~3 ms per keyframe
    # window-step; the relay costs ~25 ms per timed program (r5 noop
    # control) — M=32 understated by ~25%, M=128 still ~7%.
    M, R = 256, 20
    rng = np.random.default_rng(2)
    t = np.arange(M) * 0.1
    meas_p = np.stack([np.cos(t), np.sin(t), 0 * t], 1).astype(np.float32) \
        + rng.normal(0, 0.05, (M, 3)).astype(np.float32)
    imu_acc = np.tile(np.asarray([0.0, 0.0, 9.81], np.float32), (M, R, 1)) \
        + rng.normal(0, 0.02, (M, R, 3)).astype(np.float32)
    imu_gyro = rng.normal(0, 0.01, (M, R, 3)).astype(np.float32)
    imu_dt = np.full((M, R), 0.005, np.float32)
    imu_valid = np.ones((M, R), bool)

    cfg = bf.BatchFusionConfig()  # window 20 default
    run = _jit_with_probe(lambda a, g, dt, v, mt, mp, ok: bf.batch_fusion(
        a, g, dt, v, mt, mp, ok, config=cfg))
    rest = (jnp.asarray(imu_gyro), jnp.asarray(imu_dt),
            jnp.asarray(imu_valid), jnp.asarray(t, jnp.float32),
            jnp.asarray(meas_p), jnp.ones((M,), bool))
    sec, out = _timed(
        run,
        lambda r: (jax.device_put(
            jnp.asarray(imu_acc + np.float32(1e-4 * r))),) + rest)
    assert bool(np.isfinite(np.asarray(out.kf_p)).all())
    return M / sec  # keyframes per second


def bench_loam(jax, jnp):
    """LOAM ("TASLO") feature odometry on the synthetic HDL-style drive."""
    import sys as _sys
    from pathlib import Path

    _sys.path.insert(0, str(Path(__file__).resolve().parent / "tests"))
    from test_loam import _synthetic_lidar_scan

    from toyslam_tpu.core import se3
    from toyslam_tpu.pipelines import loam

    rng = np.random.default_rng(3)
    # S=64: device time is ~3.4 ms/scan (r4 trace) but the relay costs
    # ~25 ms per timed program (r5 noop control) — S=8 spent a third of
    # the metric on overhead, S=24 still ~1 ms/scan.
    S = 64
    T = np.eye(4)
    scans = []
    for i in range(S):
        scans.append(_synthetic_lidar_scan(rng, T))
        step = np.asarray(se3.pose6_to_matrix(
            jnp.asarray([0.35, 0.05, 0.0, 0.0, 0.0, 0.05], jnp.float64)))
        T = T @ step
    cap = max(len(s) for s in scans) + 64
    xyzi = np.full((S, cap, 4), 1e9, np.float32)
    mask = np.zeros((S, cap), bool)
    for i, s in enumerate(scans):
        xyzi[i, :len(s), :3] = s
        xyzi[i, :len(s), 3] = 0
        mask[i, :len(s)] = True

    cfg = loam.LoamConfig(n_rings=16, vertical_fov_deg=(-25.0, 5.0))
    run = _jit_with_probe(lambda x, m: loam.loam_odometry(x, m, cfg))
    mask_d = jax.device_put(jnp.asarray(mask))
    sec, out = _timed(
        run,
        lambda r: (jax.device_put(
            jnp.asarray(xyzi + np.float32(1e-3 * r))), mask_d))
    assert bool(np.isfinite(np.asarray(out.positions)).all())
    return (S - 1) / sec


def bench_gicp(jax, jnp, t_ds, s_ds):
    from toyslam_tpu.registration import gicp

    from toyslam_tpu.core.pointcloud import PointCloud

    cfg = gicp.GICPConfig()
    eye = jnp.eye(4, dtype=jnp.float32)
    s_np = np.asarray(s_ds.xyzi)
    # REPS full aligns (BOTH covariance stages + outer loop) inside one
    # lax.scan, like bench_align: a single align per dispatch measures
    # mostly the ~25 ms/program axon relay overhead (r5 noop control;
    # r4 trace: 15.5 ms device vs 41 ms wall), not the framework.
    REPS = 24

    def many(s_xyzi, s_mask, t_cloud, eps):
        def one(carry, k):
            s_cloud = PointCloud(s_xyzi.at[0, 0].add(eps[k]), s_mask)
            r = gicp.gicp_align(s_cloud, t_cloud,
                                eye.at[0, 3].add(eps[k]), cfg)
            return carry + r.transform[0, 3], r.converged

        tot, conv = jax.lax.scan(one, jnp.zeros((), jnp.float32),
                                 jnp.arange(REPS))
        return tot, conv

    run = _jit_with_probe(many)
    epss = np.linspace(0, 1e-4, REPS).astype(np.float32)

    def args(r):
        s_jit = jax.device_put(jnp.asarray(s_np + np.float32(1e-3 * r)))
        return (s_jit, s_ds.mask, t_ds,
                jax.device_put(jnp.asarray(epss + np.float32(1e-5 * r))))

    sec, out = _timed(run, args, reps_inside=REPS)
    assert bool(np.isfinite(np.asarray(out[0])))
    return sec * 1e3  # ms per align


def bench_icp(jax, jnp, t_ds, s_ds):
    """BASELINE ladder config 2 kernel: toy point-to-point ICP on the
    downsampled sample pair (the EvaPos-scored pipeline lives in
    apps/icp_demo.py; this times its registration core).

    Cost accounting (updated r5): the pair converges in 13 iterations,
    each paying one 16k x 16k NN kernel. Since r5 the DEFAULT ranking is
    the single-pass x6 expansion (HIGHEST's 6 products in ONE MXU pass,
    ops/nn_pallas._ranking_dot) — sub-mm-pinned but NOT the bit-exact
    jnp.argmin contract; `ICPConfig(nn_mode="highest")` restores it at 6
    passes per NN. The r4 39.4 -> r5 12.7 ms/align drop is therefore
    BOTH the kernel change AND rep amortization. GICP remains cheaper
    per-capability because it searches correspondences once per OUTER
    iteration and reuses them across 8 GN steps. 16 aligns per dispatch
    amortize the ~25 ms/program axon relay overhead (r5 noop control).
    """
    from toyslam_tpu.core.pointcloud import PointCloud
    from toyslam_tpu.registration import icp

    cfg = icp.ICPConfig()
    eye = jnp.eye(4, dtype=jnp.float32)
    s_np = np.asarray(s_ds.xyzi)
    REPS = 16

    def many(s_xyzi, s_mask, t_cloud, eps):
        def one(carry, k):
            s_cloud = PointCloud(s_xyzi.at[0, 0].add(eps[k]), s_mask)
            r = icp.icp_align(s_cloud, t_cloud,
                              eye.at[0, 3].add(eps[k]), cfg)
            return carry + r.transform[0, 3], r.converged

        tot, conv = jax.lax.scan(one, jnp.zeros((), jnp.float32),
                                 jnp.arange(REPS))
        return tot, conv

    run = _jit_with_probe(many)
    epss = np.linspace(0, 1e-4, REPS).astype(np.float32)

    def args(r):
        s_jit = jax.device_put(jnp.asarray(s_np + np.float32(1e-3 * r)))
        return (s_jit, s_ds.mask, t_ds,
                jax.device_put(jnp.asarray(epss + np.float32(1e-5 * r))))

    sec, out = _timed(run, args, reps_inside=REPS)
    assert bool(np.isfinite(np.asarray(out[0])))
    return sec * 1e3  # ms per align


def bench_mapping(jax, jnp, odo, scans_np, masks, S):
    """BASELINE ladder config 4: full-bag mapping — odometry + bounded
    global-map accumulation + 0.5 m re-filter every scan
    (``ndt_rosbag_mapping_node.cpp:146-161``)."""
    cfg = odo.OdometryConfig()
    run = _jit_with_probe(
        lambda s_, m_: odo.ndt_mapping(s_, m_, 65536, cfg))
    sec, out = _timed(
        run,
        lambda r: (jax.device_put(
            jnp.asarray(scans_np + np.float32(1e-3 * r))), masks))
    assert bool(np.asarray(out.odometry.converged)[1:].all())
    assert int(np.asarray(out.map_mask).sum()) > 0
    return (S - 1) / sec  # scans per second


def bench_gnss(jax, jnp):
    """GNSS local-frame f32 epoch solve (gnss/local.py) on-chip: f64 host
    prep linearizes about the anchor, then E epochs solve in one scan."""
    jax.config.update("jax_enable_x64", True)
    cpu0 = jax.devices("cpu")[0]
    with jax.default_device(cpu0):
        from toyslam_tpu.core.geodesy import (
            EARTH_ROTATION_RATE, SPEED_OF_LIGHT, ecef_to_enu_rotation,
            lla_to_ecef)
        from toyslam_tpu.gnss import atmosphere, local, pipeline
        from toyslam_tpu.gnss.ephemeris import sat_pos_vel_clock

        # E=1024 epochs per dispatch (the relay's ~14 ms/dispatch was
        # ~26% of the former E=256 run).
        E, S = 1024, 24
        rng = np.random.default_rng(4)
        lat0, lon0 = np.deg2rad(22.3), np.deg2rad(114.17)
        ref = lla_to_ecef(jnp.float64(lat0), jnp.float64(lon0),
                          jnp.float64(50.0))
        R = ecef_to_enu_rotation(jnp.float64(lat0), jnp.float64(lon0))
        v_ecef = jnp.matmul(R.T, jnp.asarray([1.5, 0.4, 0.0], jnp.float64))
        eph = pipeline.synthetic_constellation(S, toe=1000.0)
        store = pipeline.store_init()
        for k in range(S):
            store = store.update(
                jax.tree_util.tree_map(lambda x: x[k], eph))
        iono = atmosphere.IonoParams(alpha=jnp.zeros(4, jnp.float64),
                                     beta=jnp.zeros(4, jnp.float64))
        tows = 1000.0 + jnp.arange(E, dtype=jnp.float64)
        pos = ref[None, :] + v_ecef[None, :] * jnp.arange(
            E, dtype=jnp.float64)[:, None]
        sat = sat_pos_vel_clock(eph, jnp.broadcast_to(tows[:, None], (E, S)))
        r0 = jnp.linalg.norm(sat["pos"] - pos[:, None, :], axis=-1)
        for _ in range(2):
            sat = sat_pos_vel_clock(eph, tows[:, None] - r0 / SPEED_OF_LIGHT)
            r0 = jnp.linalg.norm(sat["pos"] - pos[:, None, :], axis=-1)
        el = jnp.arcsin(jnp.clip(jnp.einsum(
            "ij,esj->esi", R, sat["pos"] - pos[:, None, :]
        )[..., 2] / r0, -1, 1))
        w_c = EARTH_ROTATION_RATE / SPEED_OF_LIGHT
        sagnac = -w_c * (pos[:, None, 0] * sat["pos"][..., 1]
                         - pos[:, None, 1] * sat["pos"][..., 0])
        pr = (r0 + 42.0 + sagnac - sat["clock_bias"] * SPEED_OF_LIGHT
              - eph.tgd * SPEED_OF_LIGHT
              + 2.3 / jnp.maximum(jnp.sin(jnp.abs(el)), 0.1)
              + jnp.asarray(rng.normal(0, 1.5, (E, S))))
        los = (sat["pos"] - pos[:, None, :]) / r0[..., None]
        sag_rate = w_c * (sat["vel"][..., 0] * pos[:, None, 1]
                          - sat["vel"][..., 1] * pos[:, None, 0])
        rr = (jnp.sum(los * (v_ecef - sat["vel"]), -1) - sag_rate
              + sat["clock_drift"] * SPEED_OF_LIGHT
              + jnp.asarray(rng.normal(0, 0.05, (E, S))))
        prn = jnp.tile(jnp.arange(1, S + 1, dtype=jnp.int32)[None], (E, 1))
        cn0 = jnp.full((E, S), 45.0)
        cfg = pipeline.EpochConfig(apply_iono_correction=False)
        ep = local.prep_epochs(store, iono, tows, prn, pr, rr, cn0,
                               el > 0, ref, config=cfg)
    ep_host = jax.tree_util.tree_map(np.asarray, ep)
    solve = _jit_with_probe(lambda e_: local.solve_epochs_local(e_, cfg))

    def args(r):
        fresh = ep_host._replace(
            y=ep_host.y + np.float32(1e-4 * r))
        return (jax.device_put(fresh, jax.devices()[0]),)

    sec, sol = _timed(solve, args)
    assert bool(np.asarray(sol.valid).all())
    return E / sec


def _backend_reachable(timeout_s: float = 240.0, retries: int = 3,
                       retry_wait_s: float = 60.0) -> bool:
    """Probe the default backend in a subprocess with a deadline.

    When the axon relay is down, the first jax device call blocks
    FOREVER in-process (observed r3); failing fast with an error JSON
    line beats a silent hang in the driver. Relay outages are often
    transient (observed r3: minutes-scale), so retry a few times with a
    pause before giving up — a recovered tunnel on probe 2 or 3 still
    yields real round numbers."""
    import subprocess

    for attempt in range(retries):
        try:
            out = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=timeout_s)
            if out.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if attempt + 1 < retries:
            time.sleep(retry_wait_s)
    return False


def main():
    # Metrics land in `out` the moment each stage completes, and `out` is
    # printed no matter how far we got: a tunnel death in stage 7 of 10
    # (the axon relay has died mid-round twice in r3) must not cost the
    # stages already measured. Order = importance: the primary align
    # metric is measured first.
    out = {
        "metric": "NDT align throughput (sample pair, 0.1m ds, res 1.0,"
                  " DIRECT7 - align.cpp config)",
        "value": 0.0,
        "unit": "scans/sec",
        "vs_baseline": 0.0,
    }
    if not _backend_reachable():
        out["metric"] = "NDT align throughput"
        out["error"] = "device backend unreachable (axon tunnel down?)"
        print(json.dumps(out))
        return 1
    try:
        return _run_stages(out)
    except BaseException as e:  # noqa: BLE001 — partial metrics still count
        out["error"] = f"{type(e).__name__}: {e}"[:300]
        print(json.dumps(out))
        return 1


def _run_stages(out):
    import jax
    import jax.numpy as jnp

    from toyslam_tpu.core import pcd_io, pointcloud
    from toyslam_tpu.pipelines import odometry as odo
    from toyslam_tpu.registration import ndt

    out["backend"] = jax.default_backend()
    baseline_sps = 1000.0 / 34.33  # pclomp DIRECT7 8-thread amortized

    target_np = pcd_io.read_pcd("/root/reference/ndt_omp/data/251370668.pcd")
    source_np = pcd_io.read_pcd("/root/reference/ndt_omp/data/251371071.pcd")
    cap = 70000

    # ---- Primary: align.cpp config, 24 aligns inside one lax.scan ----
    ds = jax.jit(pointcloud.voxel_downsample, static_argnums=(1, 2))
    t_ds = ds(pointcloud.from_numpy(target_np, capacity=cap), 0.1, 16384)
    s_ds = ds(pointcloud.from_numpy(source_np, capacity=cap), 0.1, 16384)
    ms_align = bench_align(jax, jnp, t_ds, s_ds, ndt)
    align_sps = 1000.0 / ms_align
    out["value"] = round(align_sps, 2)
    out["vs_baseline"] = round(align_sps / baseline_sps, 2)
    out["ms_per_align"] = round(ms_align, 3)

    # ---- Sequential odometry (rosbag config), one dispatch ----
    # 64 scans per dispatch: ~25 ms/program relay round-trip (r5 noop
    # control) was ~0.8 ms/scan of the former S=32 metric.
    S = 64
    xyzi, mask = _scan_stack(target_np, source_np, S, cap)
    masks = jax.device_put(jnp.asarray(mask))
    out["odometry_scans_per_sec_03leaf"] = round(
        bench_odometry(jax, jnp, odo, xyzi, masks, odo.OdometryConfig(), S),
        2)

    # ---- 256k-point scans (driver target scale): the SHIPPED DEFAULT
    # (the one config proven to hold <= 1e-3 m golden-parity ATE over 64
    # scans, test_parity_config_long_sequence_ate_vs_golden) AND the
    # exact-reference-control-flow variant (no frozen line search, no
    # regather carry) at the same termination epsilon ----
    # 96 scans per dispatch (~0.26 ms/scan residual relay floor). S=128
    # was measured slightly better amortized but killed the axon remote
    # compile helper (HTTP 500, subprocess exit 1) on this box — the
    # driver's bench run must never die on a compile, so stay at 96.
    S2 = 96
    big_np = _big_scans(target_np, S2)
    big_masks = jax.device_put(jnp.ones((S2, 262144), bool))
    cfg_default = odo.OdometryConfig(work_capacity=24576)
    out["odometry_scans_per_sec_256kpt_synthetic"] = round(
        bench_odometry(jax, jnp, odo, big_np, big_masks, cfg_default, S2,
                       floor_out=out,
                       floor_key="odometry_256kpt_pct_of_gather_floor"), 2)
    cfg_exact = cfg_default._replace(
        ndt=cfg_default.ndt._replace(frozen_linesearch=False,
                                     regather_iterations=1 << 30))
    out["odometry_exact_scans_per_sec_256kpt_synthetic"] = round(
        bench_odometry(jax, jnp, odo, big_np, big_masks, cfg_exact, S2,
                       floor_out=out,
                       floor_key="odometry_exact_256kpt_pct_of_gather_floor"),
        2)

    # ---- Full-bag mapping (BASELINE ladder config 4) ----
    out["mapping_scans_per_sec_03leaf"] = round(
        bench_mapping(jax, jnp, odo, xyzi, masks, S), 2)

    # ---- Wider model surface ----
    out["batch64_scans_per_sec"] = round(
        bench_batch64_fusion(jax, jnp, target_np), 2)
    out["smoother_keyframes_per_sec_w20_f32"] = round(
        bench_smoother(jax, jnp), 2)
    out["loam_scans_per_sec"] = round(bench_loam(jax, jnp), 2)
    out["gicp_ms_per_align"] = round(bench_gicp(jax, jnp, t_ds, s_ds), 3)
    out["icp_ms_per_align"] = round(bench_icp(jax, jnp, t_ds, s_ds), 3)
    out["gnss_epochs_per_sec_f32"] = round(bench_gnss(jax, jnp), 2)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
