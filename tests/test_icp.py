import numpy as np
import jax.numpy as jnp

from toyslam_tpu.core import pointcloud, se3
from toyslam_tpu.registration import icp


def test_icp_recovers_transform(rng):
    # Reference-style random field benchmark
    # (iterative_closest_point.py:143-200): random points, known motion.
    n = 600
    pts = rng.uniform(-10, 10, size=(n, 3))
    true_p = np.array([0.5, -0.3, 0.2, 0.05, -0.03, 0.08])
    T_true = np.asarray(se3.pose6_to_matrix(jnp.asarray(true_p, jnp.float64)))
    moved = pts @ T_true[:3, :3].T + T_true[:3, 3]

    source = pointcloud.from_numpy(pts, capacity=768, dtype=jnp.float64)
    target = pointcloud.from_numpy(moved, capacity=768, dtype=jnp.float64)

    result = icp.icp_align(source, target)
    assert bool(result.converged)
    T = np.asarray(result.transform)
    np.testing.assert_allclose(T, T_true, atol=1e-4)
    assert float(result.error) < 1e-4


def test_icp_with_noise_and_padding(rng):
    n = 500
    pts = rng.uniform(-5, 5, size=(n, 3))
    T_true = np.asarray(
        se3.pose6_to_matrix(jnp.asarray([0.2, 0.1, -0.1, 0.02, 0.01, -0.03],
                                        jnp.float64))
    )
    moved = pts @ T_true[:3, :3].T + T_true[:3, 3] + 0.01 * rng.normal(size=(n, 3))

    source = pointcloud.from_numpy(pts, capacity=1024, dtype=jnp.float64)
    target = pointcloud.from_numpy(moved, capacity=700, dtype=jnp.float64)

    result = icp.icp_align(source, target)
    T = np.asarray(result.transform)
    assert np.linalg.norm(T[:3, 3] - T_true[:3, 3]) < 0.05
    assert np.abs(T[:3, :3] - T_true[:3, :3]).max() < 0.02


def test_icp_slam_pipeline(rng):
    """Incremental mapping over translated frames (icpslam.py scenario)."""
    import jax
    from toyslam_tpu.pipelines import icp_slam

    base = rng.uniform(-5, 5, size=(400, 3))
    S = 4
    cap = 512
    xyzi = np.full((S, cap, 4), 1e9, np.float32)
    mask = np.zeros((S, cap), bool)
    true_t = []
    for i in range(S):
        shift = np.array([0.1 * i, 0.05 * i, 0.0])
        # scan in the sensor frame: world points seen from a sensor at +shift
        pts = base - shift + 0.002 * rng.normal(size=base.shape)
        xyzi[i, :400, :3] = pts
        xyzi[i, :400, 3] = 0
        mask[i, :400] = True
        true_t.append(shift)

    cfg = icp_slam.IcpSlamConfig(map_capacity=2048, map_leaf=0.3)
    out = jax.jit(icp_slam.icp_slam, static_argnums=2)(
        jnp.asarray(xyzi), jnp.asarray(mask), cfg)
    est_t = np.asarray(out.poses)[:, :3, 3]
    err = np.linalg.norm(est_t - np.stack(true_t), axis=1)
    assert err.max() < 0.15, err
    assert int(np.asarray(out.map_mask).sum()) > 100


def test_icp_pallas_nn_matches_jnp(rng):
    """The fused Pallas association kernel (interpret mode on CPU) must
    reproduce the jnp argmin path end-to-end (ops/nn_pallas.py)."""
    from unittest import mock

    from toyslam_tpu.ops import nn_pallas

    n = 600
    pts = rng.uniform(-10, 10, size=(n, 3))
    true_p = np.array([0.5, -0.3, 0.2, 0.05, -0.03, 0.08])
    T_true = np.asarray(se3.pose6_to_matrix(jnp.asarray(true_p, jnp.float64)))
    moved = pts @ T_true[:3, :3].T + T_true[:3, 3]

    # f32 + power-of-two capacities so the kernel path engages; padded
    # target rows exercise the sentinel contract.
    source = pointcloud.from_numpy(pts, capacity=1024, dtype=jnp.float32)
    target = pointcloud.from_numpy(moved, capacity=1024, dtype=jnp.float32)

    r_jnp = icp.icp_align(source, target,
                          config=icp.ICPConfig(use_pallas_nn=False))
    orig = nn_pallas.nearest_neighbor
    with mock.patch.object(
            nn_pallas, "nearest_neighbor",
            lambda *a, **k: orig(*a, interpret=True, **k)):
        r_pal = icp.icp_align(source, target,
                              config=icp.ICPConfig(use_pallas_nn=True))

    assert bool(r_pal.converged) == bool(r_jnp.converged)
    np.testing.assert_allclose(np.asarray(r_pal.transform),
                               np.asarray(r_jnp.transform),
                               rtol=1e-4, atol=1e-5)


def test_registration_degenerate_inputs_stay_finite(rng):
    """Empty source or empty target must never produce NaN transforms in
    ICP or GICP — pipelines gate on convergence/error signals, so the
    failure contract is: finite transform, error flags the uselessness
    (0 matched points or sentinel-scale distances)."""
    from toyslam_tpu.registration import gicp

    pts = rng.uniform(-5, 5, (512, 4)).astype(np.float32)
    tgt = pointcloud.from_numpy(pts, capacity=1024, dtype=jnp.float32)
    empty = pointcloud.PointCloud(
        jnp.full((1024, 4), 1e9, jnp.float32).at[:, 3].set(0.0),
        jnp.zeros(1024, bool))

    for src, dst in ((empty, tgt), (tgt, empty), (empty, empty)):
        r = icp.icp_align(src, dst)
        assert bool(jnp.isfinite(r.transform).all()), (r.transform,)
        g = gicp.gicp_align(src, dst)
        assert bool(jnp.isfinite(g.transform).all()), (g.transform,)


def test_icp_fast_nn_matches_exact(rng):
    """The single-pass ranking modes ("x6" — the r5 default — and "x3")
    are not bit-equal to nn_mode="highest" (different MXU accumulation
    order / dropped sub-f32 cross terms), so a near-tied neighbor may
    flip; point-to-point Kabsch must still land on the same transform
    to < 1 mm / 1e-4 rad."""
    from unittest import mock

    from toyslam_tpu.ops import nn_pallas

    n = 600
    pts = rng.uniform(-10, 10, size=(n, 3))
    true_p = np.array([0.5, -0.3, 0.2, 0.05, -0.03, 0.08])
    T_true = np.asarray(se3.pose6_to_matrix(jnp.asarray(true_p, jnp.float64)))
    moved = pts @ T_true[:3, :3].T + T_true[:3, 3]

    source = pointcloud.from_numpy(pts, capacity=1024, dtype=jnp.float32)
    target = pointcloud.from_numpy(moved, capacity=1024, dtype=jnp.float32)

    orig = nn_pallas.nearest_neighbor
    with mock.patch.object(
            nn_pallas, "nearest_neighbor",
            lambda *a, **k: orig(*a, interpret=True, **k)):
        r_exact = icp.icp_align(
            source, target,
            config=icp.ICPConfig(use_pallas_nn=True, nn_mode="highest"))
        r_fast = {
            m: icp.icp_align(
                source, target,
                config=icp.ICPConfig(use_pallas_nn=True, nn_mode=m))
            for m in ("x6", "x3")
        }

    Te = np.asarray(r_exact.transform)
    for m, r in r_fast.items():
        assert bool(r.converged), m
        Tf = np.asarray(r.transform)
        assert np.linalg.norm(Tf[:3, 3] - Te[:3, 3]) < 1e-3, (m, Te, Tf)
        assert np.abs(Tf[:3, :3] - Te[:3, :3]).max() < 1e-4, (m, Te, Tf)
