"""On-chip validation of the claims the CPU suite can only approximate.

The CPU suite (tests/) validates everything numerically but never executes
on the TPU backend: the Pallas kernel runs in interpret mode there, and
the f32 claims are checked on CPU f32. This lane re-proves the
hardware-facing claims on the real chip (VERDICT r2 item 3):

1. the fused Pallas derivative kernel (default-on for TPU f32,
   ``registration/ndt.py:654-657``) equals the jnp path ON HARDWARE;
2. the end-to-end f32 align on the reference sample pair lands on the
   f64 golden pose (<= 1e-3 m / 1e-4 rad; oracle runs host-side NumPy);
3. one f32 ``window_optimize`` step is finite and reduces the cost;
4. ``vmap_align`` (the batched fleet primitive) matches per-pair aligns;
5. the GICP correspondence + GN-terms + covariance kernels equal the
   jnp paths;
6. the single-pass stats repack kernel is bit-identical to the jnp
   unpack under the real Mosaic compiler;
7. the ICP single-pass x6 NN ranking (the ICP default) lands on the
   nn_mode="highest" path's transform (x3 deliberately excluded — its
   association flips stall ICP's convergence check on-chip);
8. the flattened batched-gather lowering is bit-identical to the
   default batched gather.

Reference behaviors being validated: ``ndt_omp_impl.hpp`` derivative
stack, ``uwb_imu_batch_node.cpp`` windowed GN, ``align.cpp`` batch use.
"""

import numpy as np
import jax
import jax.numpy as jnp

from toyslam_tpu.core import pointcloud
from toyslam_tpu.registration import ndt


def _structured_cloud(rng, n=4000):
    """Floor + two walls + noise (same scene family as tests/test_ndt)."""
    floor = np.stack(
        [rng.uniform(-20, 20, n), rng.uniform(-20, 20, n),
         0.05 * rng.normal(size=n)], 1)
    wall1 = np.stack(
        [rng.uniform(-20, 20, n // 2),
         np.full(n // 2, 8.0) + 0.05 * rng.normal(size=n // 2),
         rng.uniform(0, 5, n // 2)], 1)
    wall2 = np.stack(
        [np.full(n // 2, -12.0) + 0.05 * rng.normal(size=n // 2),
         rng.uniform(-20, 20, n // 2), rng.uniform(0, 5, n // 2)], 1)
    return np.concatenate([floor, wall1, wall2], 0)


def test_pallas_deriv_matches_jnp_on_hardware(rng):
    """The real-Mosaic-compiled kernel (not interpret mode) must agree
    with the jnp derivative path, both executed on the chip in f32."""
    pts = _structured_cloud(rng, 700)
    pts4 = np.concatenate([pts, np.zeros((len(pts), 1))], 1)
    target = pointcloud.from_numpy(pts4, capacity=2048, dtype=jnp.float32)
    cfg = ndt.NDTConfig(resolution=2.0, map_capacity=2048,
                        grid_capacity=1 << 14)
    m = jax.jit(ndt.build_ndt_map, static_argnums=1)(target, cfg)

    n_src = 1024  # divisible by the 1024-row Pallas tile
    src = jnp.asarray(np.tile(pts4, (2, 1))[:n_src] + 0.1, jnp.float32)
    mask = jnp.ones(n_src, bool)
    d1, d2, _ = ndt.gauss_coefficients(2.0, 0.55, jnp.float32)
    p = jnp.asarray([0.05, -0.1, 0.08, 0.02, -0.03, 0.05], jnp.float32)
    offs = ndt._OFFSETS["DIRECT7"]

    f_jnp = jax.jit(lambda: ndt.compute_derivatives(
        m, src, mask, p, d1, d2, 2.0, offs, use_pallas=False))
    # stats=None -> the raw-gather kernel (ndt_terms_raw)
    f_raw = jax.jit(lambda: ndt.compute_derivatives(
        m, src, mask, p, d1, d2, 2.0, offs, use_pallas=True))
    # explicit stats -> the packed-channel kernel (ndt_terms)
    f_pak = jax.jit(lambda: ndt.compute_derivatives(
        m, src, mask, p, d1, d2, 2.0, offs, use_pallas=True,
        stats=ndt.gather_neighborhood(m, src, mask, p, 2.0, offs)))
    s0, g0, h0 = jax.block_until_ready(f_jnp())

    for f_pal in (f_raw, f_pak):
        s1, g1, h1 = jax.block_until_ready(f_pal())
        # Both paths are f32 on the same data; differences are summation
        # order only.
        np.testing.assert_allclose(float(s1), float(s0), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(h1), np.asarray(h0),
                                   rtol=1e-3, atol=1e-3)


def test_sample_pair_align_matches_golden_on_hardware(sample_pcds):
    """End-to-end f32 align on the chip vs the f64 NumPy golden oracle
    (exact pclomp control flow) on the reference benchmark pair."""
    import golden_ndt

    target_np, source_np = sample_pcds
    cap = 70000
    target = pointcloud.from_numpy(target_np, capacity=cap,
                                   dtype=jnp.float32)
    source = pointcloud.from_numpy(source_np, capacity=cap,
                                   dtype=jnp.float32)
    target_ds = jax.jit(pointcloud.voxel_downsample, static_argnums=1)(
        target, 0.1)
    source_ds = jax.jit(pointcloud.voxel_downsample, static_argnums=1)(
        source, 0.1)

    cfg = ndt.NDTConfig(resolution=1.0)
    m = jax.jit(ndt.build_ndt_map, static_argnums=1)(target_ds, cfg)
    result = jax.block_until_ready(
        jax.jit(ndt.ndt_align, static_argnums=3)(
            m, source_ds, jnp.eye(4, dtype=jnp.float32), cfg))
    assert bool(result.converged)

    t_pts = np.asarray(target_ds.xyzi)[np.asarray(target_ds.mask)][:, :3]
    s_pts = np.asarray(source_ds.xyzi)[np.asarray(source_ds.mask)][:, :3]
    leaves, min_b, max_b, div = golden_ndt.build_map(
        t_pts.astype(np.float64), 1.0)
    _, p_gold, _, _ = golden_ndt.align(
        leaves, min_b, max_b, div, s_pts.astype(np.float64))

    p_tpu = np.asarray(result.pose6)
    assert np.abs(p_tpu[:3] - p_gold[:3]).max() < 1e-3, (p_tpu, p_gold)
    assert np.abs(p_tpu[3:] - p_gold[3:]).max() < 1e-4, (p_tpu, p_gold)

    fit = float(ndt.fitness_score(source_ds, target_ds, result.transform))
    assert abs(fit - 0.204504) < 2e-3, fit


def test_window_f32_step_on_hardware():
    """One keyframe push + GN optimize of the flagship smoother in f32 on
    the chip: states stay finite and the optimized position moves toward
    the measurement from a deliberately offset guess."""
    from toyslam_tpu.estimators import window, preintegration
    from toyslam_tpu.estimators.factors import NavState

    cfg = window.WindowConfig(window_size=10, gn_iterations=5,
                              pos_sigma=0.05)
    win = window.window_init(cfg, jnp.float32)
    params = preintegration.PreintegrationParams(acc_noise=0.03,
                                                 gyro_noise=0.002)
    R = 50
    dt = jnp.full((R,), 1.0 / 200.0, jnp.float32)
    acc = jnp.tile(jnp.asarray([0.0, 0.0, 9.81], jnp.float32), (R, 1))
    gyro = jnp.zeros((R, 3), jnp.float32)
    pre = preintegration.preintegrate(
        acc, gyro, dt, jnp.zeros(3, jnp.float32), jnp.zeros(3, jnp.float32),
        gravity_sensor=jnp.asarray([0.0, 0.0, -9.81], jnp.float32),
        params=params)

    meas = jnp.asarray([1.0, 2.0, 0.5], jnp.float32)
    guess = NavState(p=meas + 0.3,
                     q=jnp.asarray([1.0, 0, 0, 0], jnp.float32),
                     v=jnp.zeros(3, jnp.float32),
                     ba=jnp.zeros(3, jnp.float32),
                     bg=jnp.zeros(3, jnp.float32))
    win = jax.jit(window.window_push, static_argnums=7)(
        win, guess, jnp.asarray(0.0, jnp.float32), meas,
        jnp.asarray(True), pre, jnp.asarray(R / 200.0, jnp.float32), cfg)
    out = jax.block_until_ready(
        jax.jit(window.window_optimize, static_argnums=1)(win, cfg))

    p_opt = np.asarray(jax.tree_util.tree_map(lambda x: x[0], out.states).p)
    assert np.isfinite(np.asarray(out.states.p)).all()
    # GN with a 0.05-sigma position factor pulls the 0.3 m offset guess
    # onto the measurement.
    assert np.linalg.norm(p_opt - np.asarray(meas)) < 0.05


def test_vmap_align_batch_matches_sequential_on_hardware(rng):
    """The fleet primitive (one compiled program, B pairs) must equal
    per-pair aligns on the chip."""
    from toyslam_tpu.parallel import batch

    B, N = 3, 2048
    cfg = ndt.NDTConfig(resolution=2.0, map_capacity=2048,
                        grid_capacity=1 << 14)
    t_list, s_list = [], []
    for b in range(B):
        pts = _structured_cloud(rng, 600)[:N - 64]
        pts4 = np.concatenate([pts, np.zeros((len(pts), 1))], 1)
        pad = np.zeros((N - len(pts4), 4))
        t_list.append(np.concatenate([pts4, pad], 0))
        shift = np.array([0.3 + 0.1 * b, -0.2, 0.05 * b, 0.0])
        s_list.append(np.concatenate([pts4 + shift, pad], 0))
    mask = np.zeros((B, N), bool)
    mask[:, :len(pts4)] = True

    t_x = jnp.asarray(np.stack(t_list), jnp.float32)
    s_x = jnp.asarray(np.stack(s_list), jnp.float32)
    msk = jnp.asarray(mask)

    batched = jax.block_until_ready(
        jax.jit(batch.vmap_align, static_argnums=4)(
            t_x, msk, s_x, msk, cfg))

    for b in range(B):
        m = jax.jit(ndt.build_ndt_map, static_argnums=1)(
            pointcloud.PointCloud(t_x[b], msk[b]), cfg)
        one = jax.jit(ndt.ndt_align, static_argnums=3)(
            m, pointcloud.PointCloud(s_x[b], msk[b]),
            jnp.eye(4, dtype=jnp.float32), cfg)
        np.testing.assert_allclose(np.asarray(batched.pose6[b]),
                                   np.asarray(one.pose6),
                                   rtol=1e-4, atol=1e-4)


def test_gicp_kernels_match_jnp_on_hardware(sample_pcds):
    """The GICP correspondence kernel (ops/nn_pallas.py) and GN-terms
    kernel (ops/gicp_pallas.py), real-Mosaic-compiled, must reproduce the
    jnp paths on the sample pair: same iterations, matching transform."""
    from toyslam_tpu.registration import gicp

    target_np, source_np = sample_pcds
    ds = jax.jit(pointcloud.voxel_downsample, static_argnums=(1, 2))
    t_ds = ds(pointcloud.from_numpy(target_np, capacity=70000,
                                    dtype=jnp.float32), 0.1, 16384)
    s_ds = ds(pointcloud.from_numpy(source_np, capacity=70000,
                                    dtype=jnp.float32), 0.1, 16384)
    eye = jnp.eye(4, dtype=jnp.float32)

    # cov kernel pinned OFF here so the nn/terms kernels are isolated
    # (the cov kernel gets its own comparison below)
    cfg_pal = gicp.GICPConfig(use_pallas_nn=True, use_pallas_terms=True,
                              nn_mode="highest", use_pallas_cov=False)
    cfg_fast = gicp.GICPConfig(use_pallas_nn=True, use_pallas_terms=True,
                               use_pallas_cov=False)
    cfg_jnp = gicp.GICPConfig(use_pallas_nn=False, use_pallas_terms=False,
                              use_pallas_cov=False)
    r_pal = jax.block_until_ready(jax.jit(
        gicp.gicp_align, static_argnums=3)(s_ds, t_ds, eye, cfg_pal))
    r_fast = jax.block_until_ready(jax.jit(
        gicp.gicp_align, static_argnums=3)(s_ds, t_ds, eye, cfg_fast))
    r_jnp = jax.block_until_ready(jax.jit(
        gicp.gicp_align, static_argnums=3)(s_ds, t_ds, eye, cfg_jnp))

    assert bool(r_pal.converged) and bool(r_jnp.converged)
    assert int(r_pal.iterations) == int(r_jnp.iterations)
    np.testing.assert_allclose(np.asarray(r_pal.transform),
                               np.asarray(r_jnp.transform),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(r_pal.error), float(r_jnp.error),
                               rtol=1e-3)
    # The fast bf16x3 default flips a few near-tied correspondences; the
    # pose must still land within 1 mm of the exact path.
    assert bool(r_fast.converged)
    np.testing.assert_allclose(np.asarray(r_fast.transform),
                               np.asarray(r_jnp.transform), atol=1e-3)

    # Covariance-stage fused bf16 distance pass (neg_dist_bf16, default
    # ON): its adds round differently from the jnp HIGH-matmul path, so
    # near-tied k-NN membership flips on a minority of rows; the Segal
    # (eps,1,1) recomposition must keep the end-to-end transform within
    # a few mm (measured 1.0 mm on this pair, r4).
    cfg_cov_jnp = gicp.GICPConfig(use_pallas_cov=False)
    r_cov_jnp = jax.block_until_ready(jax.jit(
        gicp.gicp_align, static_argnums=3)(s_ds, t_ds, eye, cfg_cov_jnp))
    r_cov_pal = jax.block_until_ready(jax.jit(
        gicp.gicp_align, static_argnums=3)(
            s_ds, t_ds, eye, gicp.GICPConfig(use_pallas_cov=True)))
    assert bool(r_cov_pal.converged) and bool(r_cov_jnp.converged)
    np.testing.assert_allclose(np.asarray(r_cov_pal.transform),
                               np.asarray(r_cov_jnp.transform), atol=3e-3)


def test_repack_kernel_bit_identical_on_hardware(rng):
    """The single-pass stats repack kernel (ops/ndt_pallas.ndt_repack,
    default-on for the TPU f32 odometry path since r4) must reproduce
    gather_neighborhood's jnp unpack BIT-identically under the real
    Mosaic compiler — the CPU suite only proves this in interpret mode
    (tests/test_ndt.py::test_repack_kernel_bit_identical)."""
    pts = _structured_cloud(rng, 700)
    pts4 = np.concatenate([pts, np.zeros((len(pts), 1))], 1)
    target = pointcloud.from_numpy(pts4, capacity=2048, dtype=jnp.float32)
    cfg = ndt.NDTConfig(resolution=2.0, map_capacity=2048,
                        grid_capacity=1 << 14)
    m = jax.jit(ndt.build_ndt_map, static_argnums=1)(target, cfg)

    n_src = 1024  # divisible by the 1024-row Pallas tile
    # gather_neighborhood silently falls back to the jnp path when
    # N % 1024 != 0 — guard the precondition so a future n_src / tile
    # change can never degrade this into a vacuous jnp-vs-jnp
    # comparison (ADVICE r4).
    assert n_src % 1024 == 0
    src = jnp.asarray(np.tile(pts4, (2, 1))[:n_src] + 0.1, jnp.float32)
    mask = jnp.asarray(np.arange(n_src) % 13 != 0)  # exercise src_mask
    p = jnp.asarray([0.05, -0.1, 0.08, 0.02, -0.03, 0.05], jnp.float32)
    offs = ndt._OFFSETS["DIRECT7"]

    ref = jax.block_until_ready(jax.jit(
        lambda: ndt.gather_neighborhood(m, src, mask, p, 2.0, offs,
                                        use_pallas=False))())
    got = jax.block_until_ready(jax.jit(
        lambda: ndt.gather_neighborhood(m, src, mask, p, 2.0, offs,
                                        use_pallas=True))())
    assert np.array_equal(np.asarray(got.packed), np.asarray(ref.packed))


def test_icp_fast_nn_matches_exact_on_hardware(rng):
    """The single-pass x6 ranking (the ICP default) under the real
    Mosaic compiler: its accumulation-order deviation may flip a
    near-tied neighbor, but point-to-point Kabsch must land on the
    nn_mode="highest" path's transform to < 1 mm / 1e-4 rad (CPU twin:
    tests/test_icp.py, interpret mode). x3 is deliberately NOT asserted
    here: its larger (~2^-16) ranking error flips associations between
    iterations and stalled ICP's |d_err| convergence check on this very
    test (r5 run: 100 iterations, pose still near exact) — that is why
    ICP defaults to x6 while GICP (plane-to-plane, on-chip x3 coverage
    in test_gicp_kernels_match_jnp_on_hardware) keeps x3."""
    from toyslam_tpu.registration import icp
    from toyslam_tpu.core import se3

    n = 600
    pts = rng.uniform(-10, 10, size=(n, 3))
    true_p = np.array([0.5, -0.3, 0.2, 0.05, -0.03, 0.08])
    T_true = np.asarray(se3.pose6_to_matrix(
        jnp.asarray(true_p, jnp.float32)))
    moved = pts @ T_true[:3, :3].T + T_true[:3, 3]

    source = pointcloud.from_numpy(pts, capacity=1024, dtype=jnp.float32)
    target = pointcloud.from_numpy(moved, capacity=1024, dtype=jnp.float32)

    align = jax.jit(icp.icp_align, static_argnums=3)
    r_exact = jax.block_until_ready(align(
        source, target, jnp.eye(4, dtype=jnp.float32),
        icp.ICPConfig(use_pallas_nn=True, nn_mode="highest")))
    assert bool(r_exact.converged)
    Te = np.asarray(r_exact.transform)
    r_fast = jax.block_until_ready(align(
        source, target, jnp.eye(4, dtype=jnp.float32),
        icp.ICPConfig(use_pallas_nn=True, nn_mode="x6")))
    assert bool(r_fast.converged)
    Tf = np.asarray(r_fast.transform)
    assert np.linalg.norm(Tf[:3, 3] - Te[:3, 3]) < 1e-3, (Te, Tf)
    assert np.abs(Tf[:3, :3] - Te[:3, :3]).max() < 1e-4, (Te, Tf)


def test_flat_vmap_gather_matches_default_on_hardware(rng):
    """The flattened batched-gather lowering (ops/gatherflat.py) must be
    bit-identical to the default batched gather ON THE CHIP — the fleet
    can only ship whichever lowering wins if both fetch the same rows."""
    from toyslam_tpu.ops import gatherflat
    from toyslam_tpu.parallel import batch

    B, N = 3, 2048
    cfg = ndt.NDTConfig(resolution=2.0, map_capacity=2048,
                        grid_capacity=1 << 14, frozen_linesearch=True,
                        regather_iterations=4)
    t_list, s_list = [], []
    for b in range(B):
        pts = _structured_cloud(rng, 600)[:N - 64]
        pts4 = np.concatenate([pts, np.zeros((len(pts), 1))], 1)
        pad = np.zeros((N - len(pts4), 4))
        t_list.append(np.concatenate([pts4, pad], 0))
        shift = np.array([0.3 + 0.1 * b, -0.2, 0.05 * b, 0.0])
        s_list.append(np.concatenate([pts4 + shift, pad], 0))
    mask = np.zeros((B, N), bool)
    mask[:, :len(pts4)] = True

    t_x = jnp.asarray(np.stack(t_list), jnp.float32)
    s_x = jnp.asarray(np.stack(s_list), jnp.float32)
    msk = jnp.asarray(mask)

    def lane(tx, tm, sx, sm):
        m = ndt.build_ndt_map(pointcloud.PointCloud(tx, tm), cfg)
        r = ndt.ndt_align(m, pointcloud.PointCloud(sx, sm),
                          jnp.eye(4, dtype=jnp.float32), cfg)
        return r.pose6, r.iterations, r.converged

    with gatherflat.flatten_batched(False):
        ref = jax.block_until_ready(
            jax.jit(jax.vmap(lane))(t_x, msk, s_x, msk))
    with gatherflat.flatten_batched(True):
        flat = jax.block_until_ready(
            jax.jit(jax.vmap(lane))(t_x, msk, s_x, msk))

    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(flat[1]))
    np.testing.assert_array_equal(np.asarray(ref[2]), np.asarray(flat[2]))
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(flat[0]))
    assert bool(np.asarray(ref[2]).all())
