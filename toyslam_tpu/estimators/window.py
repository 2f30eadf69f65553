"""Sliding-window factor-graph smoother with Schur marginalization.

Capability port of the flagship estimator ``uwb_imu_batch_node.cpp``
(VINS-Mono-style): a fixed-size window of keyframe states
[p, q, v, ba, bg], IMU preintegration factors between neighbors, UWB/GPS
position factors, the soft-constraint family, and a marginalization prior
summarizing slid-out history (``MarginalizationInfo``/``MarginalizationFactor``
``:537-1067``; window assembly ``optimizeFactorGraph`` ``:4354-4650``;
keyframe-per-measurement ``createKeyframe`` ``:3147``).

TPU design:
- Ceres + pointer bookkeeping become dense fixed-shape algebra: the window
  is a [K]-stacked NavState; Gauss-Newton runs on the 15K-dim tangent with
  Jacobians from ``jax.jacfwd`` of the stacked residual (JAX autodiff
  replaces Ceres Jets).
- Marginalization is a dense Schur complement onto the new oldest state
  (15x15 prior with eigendecomposition-regularized square root, mirroring
  ``:940-978``), carried as (sqrt_info, offset, linearization state).
- Everything is jit/scan-compatible; a whole measurement log can be smoothed
  by scanning ``window_push`` + ``window_optimize``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from toyslam_tpu.estimators import factors
from toyslam_tpu.estimators.factors import NavState
from toyslam_tpu.estimators.preintegration import Preintegrated

_HP = jax.lax.Precision.HIGHEST


class WindowConfig(NamedTuple):
    window_size: int = 20  # optimization_window_size default (batch node)
    gn_iterations: int = 8  # Ceres cap 10/20 (:4639-4650)
    damping: float = 1e-3
    pos_sigma: float = 0.05  # UWB position noise (m), ``:1401``
    # Huber robustness on the UWB position factor (HuberLoss(0.1),
    # ``:4490``), applied as an IRLS weight. <= 0 disables.
    huber_delta: float = 0.0
    enable_bias_constraint: bool = True
    bias_acc_weight: float = 1.0
    bias_gyro_weight: float = 10.0
    enable_velocity_constraint: bool = True
    max_velocity: float = 10.0
    enable_roll_pitch_prior: bool = False
    roll_pitch_weight: float = 0.5
    enable_orientation_smoothness: bool = True
    orientation_smoothness_weight: float = 0.5
    max_bias: float = 0.5  # post-solve clamps (:4656-4710)
    max_speed_clamp: float = 20.0
    # ---- GPS branch (use_gps_instead_of_uwb_, ``:4443-4478``) ----
    use_gps: bool = False
    gps_pos_sigma: float = 0.01  # gps_position_noise (``:1359``)
    # z-axis sigma multiplier: the reference divides the z residual by
    # noise*0.0001, pinning altitude to the fix (``GpsPositionFactor``,
    # ``:495-505``). 1.0 = isotropic.
    gps_pos_z_sigma_factor: float = 1.0e-4
    use_gps_velocity: bool = True  # ``:1366``; gated on velocity constraint
    gps_vel_sigma: float = 0.01  # gps_velocity_noise (``:1360``)
    use_gps_orientation: bool = False  # use_gps_orientation_as_constraint
    gps_orientation_sigma: float = 0.1  # rad (``:1361``)
    use_yaw_only_orientation: bool = False
    yaw_weight: float = 1.0
    # ---- soft-constraint family extensions ----
    enable_gravity_alignment: bool = False  # ``:296-334,4510-4536``
    gravity_alignment_weight: float = 1.0
    enable_horizontal_velocity_incentive: bool = False  # ``:183-218``
    min_horizontal_velocity: float = 0.5  # ``:1434``
    horizontal_velocity_weight: float = 0.5
    # Orientation smoothness is also applied i <-> i+2 at half weight
    # (``:4549-4556``) whenever enable_orientation_smoothness is on.
    # ---- first-N-optimizations simplified mode (``:4365-4372``) ----
    # While opt_count < simplified_first_n, the horizontal-velocity
    # incentive and orientation-smoothness residuals are gated off (the
    # reference also drops max_iterations to 5; the GN loop here keeps its
    # static bound — extra iterations at a converged point are no-ops).
    simplified_first_n: int = 5


class SlidingWindow(NamedTuple):
    states: NavState  # each leaf [K, ...]
    timestamps: jax.Array  # [K]
    meas_p: jax.Array  # [K, 3]
    meas_valid: jax.Array  # [K] bool
    meas_v: jax.Array  # [K, 3] GPS velocity fixes
    meas_v_valid: jax.Array  # [K] bool
    meas_q: jax.Array  # [K, 4] GPS orientation fixes (wxyz)
    meas_q_valid: jax.Array  # [K] bool
    mean_acc: jax.Array  # [K, 3] keyframe-nearest accelerometer sample
    acc_valid: jax.Array  # [K] bool
    active: jax.Array  # [K] bool (filled slots)
    count: jax.Array  # scalar int
    opt_count: jax.Array  # scalar int (simplified-first-N gate)
    # Preintegration between slot i and i+1 (leaf [K-1, ...])
    preints: Preintegrated
    pair_dt: jax.Array  # [K-1]
    pair_valid: jax.Array  # [K-1] bool
    lin_ba: jax.Array  # [K-1, 3]
    lin_bg: jax.Array  # [K-1, 3]
    # Marginalization prior on slot 0: r = sqrt_info @ (x0 ⊖ lin_state) + r0
    prior_sqrt_info: jax.Array  # [15, 15]
    prior_r0: jax.Array  # [15]
    prior_state: NavState  # linearization point
    prior_valid: jax.Array  # bool


def _empty_state(K, dtype):
    q = jnp.zeros((K, 4), dtype).at[:, 0].set(1.0)
    return NavState(
        p=jnp.zeros((K, 3), dtype), q=q, v=jnp.zeros((K, 3), dtype),
        ba=jnp.zeros((K, 3), dtype), bg=jnp.zeros((K, 3), dtype),
    )


def _empty_preint(K, dtype):
    q = jnp.zeros((K, 4), dtype).at[:, 0].set(1.0)
    return Preintegrated(
        delta_p=jnp.zeros((K, 3), dtype),
        delta_v=jnp.zeros((K, 3), dtype),
        delta_q=q,
        covariance=jnp.tile(jnp.eye(9, dtype=dtype)[None] * 1e-4, (K, 1, 1)),
        jacobian_bias=jnp.zeros((K, 9, 6), dtype),
        sum_dt=jnp.zeros((K,), dtype),
    )


def window_init(config: WindowConfig = WindowConfig(),
                dtype=jnp.float32) -> SlidingWindow:
    K = config.window_size
    one = _empty_state(1, dtype)
    return SlidingWindow(
        states=_empty_state(K, dtype),
        timestamps=jnp.zeros((K,), dtype),
        meas_p=jnp.zeros((K, 3), dtype),
        meas_valid=jnp.zeros((K,), bool),
        meas_v=jnp.zeros((K, 3), dtype),
        meas_v_valid=jnp.zeros((K,), bool),
        meas_q=jnp.zeros((K, 4), dtype).at[:, 0].set(1.0),
        meas_q_valid=jnp.zeros((K,), bool),
        mean_acc=jnp.zeros((K, 3), dtype),
        acc_valid=jnp.zeros((K,), bool),
        active=jnp.zeros((K,), bool),
        count=jnp.zeros((), jnp.int32),
        opt_count=jnp.zeros((), jnp.int32),
        preints=_empty_preint(K - 1, dtype),
        pair_dt=jnp.zeros((K - 1,), dtype),
        pair_valid=jnp.zeros((K - 1,), bool),
        lin_ba=jnp.zeros((K - 1, 3), dtype),
        lin_bg=jnp.zeros((K - 1, 3), dtype),
        prior_sqrt_info=jnp.zeros((15, 15), dtype),
        prior_r0=jnp.zeros((15,), dtype),
        prior_state=jax.tree_util.tree_map(lambda x: x[0], one),
        prior_valid=jnp.asarray(False),
    )


def _state_at(states: NavState, i) -> NavState:
    return jax.tree_util.tree_map(lambda x: x[i], states)


def _boxminus(a: NavState, b: NavState):
    """15-dim tangent a ⊖ b."""
    return jnp.concatenate([
        a.p - b.p, factors.quat_error(b.q, a.q), a.v - b.v,
        a.ba - b.ba, a.bg - b.bg,
    ])


def _stack_residuals(win: SlidingWindow, config: WindowConfig, deltas):
    """All window residuals as one vector, as a function of tangent deltas
    [K, 15] (for jacfwd). Inactive/invalid entries are zeroed."""
    K = config.window_size
    dtype = win.meas_p.dtype
    states = jax.vmap(factors.state_boxplus)(win.states, deltas)
    act = win.active.astype(dtype)
    # First-N-optimizations simplified mode (``:4365-4372``): gate the
    # fragile soft factors off as a 0/1 multiplier (residual shapes must
    # stay static under jit).
    full_mode = (win.opt_count >= config.simplified_first_n).astype(dtype)

    res = []
    # Position factors: GPS (anisotropic z, ``GpsPositionFactor:495-505``)
    # or UWB (isotropic + Huber IRLS, ``:4485-4492``)
    pos_gate = (win.meas_valid & win.active).astype(dtype)
    if config.use_gps:
        w_pos = jnp.asarray([
            1.0 / config.gps_pos_sigma, 1.0 / config.gps_pos_sigma,
            1.0 / (config.gps_pos_sigma * config.gps_pos_z_sigma_factor),
        ], dtype)
    else:
        w_pos = jnp.asarray(1.0 / config.pos_sigma, dtype)
    r_pos = jax.vmap(
        lambda s, m, v: factors.position_residual(s, m, w_pos) * v
    )(states, win.meas_p, pos_gate)
    if not config.use_gps and config.huber_delta > 0:
        # IRLS sqrt-Huber weight, held constant through the Jacobian
        # (standard robust GN; HuberLoss(0.1) in the reference).
        nrm = jnp.sqrt(jnp.sum(r_pos * r_pos, axis=1) + 1e-12)
        hw = jnp.sqrt(jnp.minimum(1.0, config.huber_delta
                                  / config.pos_sigma / nrm))
        r_pos = r_pos * jax.lax.stop_gradient(hw)[:, None]
    res.append(r_pos.reshape(-1))

    if config.use_gps and config.use_gps_velocity \
            and config.enable_velocity_constraint:
        # GPS velocity factor (``GpsVelocityFactor:507-533``)
        w_vel = 1.0 / config.gps_vel_sigma
        r_vel = jax.vmap(
            lambda s, m, v: factors.velocity_residual(s, m, w_vel) * v
        )(states, win.meas_v, (win.meas_v_valid & win.active).astype(dtype))
        res.append(r_vel.reshape(-1))

    if config.use_gps and config.use_gps_orientation:
        # Full GPS orientation factor (``GpsOrientationFactor:421-470``)
        w_q = 1.0 / config.gps_orientation_sigma
        r_q = jax.vmap(
            lambda s, m, v: factors.gps_orientation_residual(s, m, w_q) * v
        )(states, win.meas_q, (win.meas_q_valid & win.active).astype(dtype))
        res.append(r_q.reshape(-1))

    if config.use_gps and config.use_yaw_only_orientation:
        # Yaw-only heading factor (``YawOnlyOrientationFactor:336-418``)
        def one_yaw(s, mq, v):
            yaw = jnp.arctan2(
                2.0 * (mq[0] * mq[3] + mq[1] * mq[2]),
                1.0 - 2.0 * (mq[2] * mq[2] + mq[3] * mq[3]))
            return factors.yaw_only_orientation_residual(
                s, yaw, config.yaw_weight) * v

        r_yaw = jax.vmap(one_yaw)(
            states, win.meas_q, (win.meas_q_valid & win.active).astype(dtype))
        res.append(r_yaw.reshape(-1))

    # IMU factors between consecutive active pairs
    def one_imu(i):
        s_i = _state_at(states, i)
        s_j = _state_at(states, i + 1)
        pre = jax.tree_util.tree_map(lambda x: x[i], win.preints)
        r = factors.imu_residual(s_i, s_j, pre, win.pair_dt[i],
                                 win.lin_ba[i], win.lin_bg[i])
        U, ba_w, bg_w = factors.imu_sqrt_info(pre)
        r9 = jnp.matmul(U, r[:9], precision=_HP)
        rb = jnp.concatenate([r[9:12] * ba_w, r[12:15] * bg_w])
        return jnp.concatenate([r9, rb]) * win.pair_valid[i].astype(dtype)

    r_imu = jax.vmap(one_imu)(jnp.arange(K - 1))
    res.append(r_imu.reshape(-1))

    if config.enable_bias_constraint:
        r_b = jax.vmap(lambda s: factors.bias_magnitude_residual(
            s, config.bias_acc_weight, config.bias_gyro_weight))(states)
        res.append((r_b * act[:, None]).reshape(-1))

    if config.enable_velocity_constraint:
        r_v = jax.vmap(lambda s: factors.velocity_magnitude_residual(
            s, config.max_velocity))(states)
        res.append((r_v * act[:, None]).reshape(-1))

    if config.enable_roll_pitch_prior:
        r_rp = jax.vmap(lambda s: factors.roll_pitch_prior_residual(
            s, config.roll_pitch_weight))(states)
        res.append((r_rp * act[:, None]).reshape(-1))

    if config.enable_gravity_alignment:
        # GravityAlignmentFactor per keyframe against the nearest
        # accelerometer sample (``:296-334,4510-4536``)
        r_g = jax.vmap(lambda s, a, v: factors.gravity_alignment_residual(
            s, a, config.gravity_alignment_weight) * v)(
            states, win.mean_acc,
            (win.acc_valid & win.active).astype(dtype))
        res.append(r_g.reshape(-1))

    if config.enable_horizontal_velocity_incentive:
        # HorizontalVelocityIncentiveFactor (``:183-218``); gated off in
        # the simplified first-N phase (``:4367``)
        r_h = jax.vmap(
            lambda s: factors.horizontal_velocity_incentive_residual(
                s, config.min_horizontal_velocity,
                config.horizontal_velocity_weight))(states)
        res.append((r_h * (act * full_mode)[:, None]).reshape(-1))

    if config.enable_orientation_smoothness:
        # i <-> i+1 at full weight plus i <-> i+2 at half weight
        # (``:4539-4556``); gated off in the simplified first-N phase
        def one_sm(i):
            return factors.orientation_smoothness_residual(
                _state_at(states, i), _state_at(states, i + 1),
                config.orientation_smoothness_weight,
            ) * win.pair_valid[i].astype(dtype)
        r_sm = jax.vmap(one_sm)(jnp.arange(K - 1))
        res.append((r_sm * full_mode).reshape(-1))

        def one_sm2(i):
            gate = (win.pair_valid[i] & win.pair_valid[i + 1]).astype(dtype)
            return factors.orientation_smoothness_residual(
                _state_at(states, i), _state_at(states, i + 2),
                0.5 * config.orientation_smoothness_weight,
            ) * gate
        r_sm2 = jax.vmap(one_sm2)(jnp.arange(K - 2))
        res.append((r_sm2 * full_mode).reshape(-1))

    # Marginalization prior on slot 0
    r_prior = (jnp.matmul(
        win.prior_sqrt_info,
        _boxminus(_state_at(states, 0), win.prior_state),
        precision=_HP,
    ) + win.prior_r0) * win.prior_valid.astype(dtype)
    res.append(r_prior)

    return jnp.concatenate(res)


def window_optimize(win: SlidingWindow,
                    config: WindowConfig = WindowConfig()) -> SlidingWindow:
    """Damped Gauss-Newton on the window tangent (replaces Ceres
    SPARSE_NORMAL_CHOLESKY, ``:4639-4650``), with post-solve clamping."""
    K = config.window_size
    dtype = win.meas_p.dtype
    D = K * 15

    def gn_step(_, w):
        def r_of(delta_flat):
            return _stack_residuals(w, config, delta_flat.reshape(K, 15))

        r0 = r_of(jnp.zeros(D, dtype))
        J = jax.jacfwd(r_of)(jnp.zeros(D, dtype))
        H = jnp.matmul(J.T, J, precision=_HP)
        # Inactive slots get identity rows to keep H invertible
        act15 = jnp.repeat(w.active, 15).astype(dtype)
        H = H + jnp.diag(config.damping + (1.0 - act15))
        g = jnp.matmul(J.T, r0, precision=_HP)
        # Cholesky solve: H is SPD by construction (J^T J + damping), and
        # cho_solve is both cheaper and f32-TPU-stable where generic LU
        # pivoting loses digits (the fusion demo runs this on-chip in f32).
        chol = jax.scipy.linalg.cho_factor(0.5 * (H + H.T))
        delta = -jax.scipy.linalg.cho_solve(chol, g) * act15
        # Per-block step clamp (poor man's trust region; Ceres' LM bounds
        # steps the same way in spirit). Short-chunk IMU factors carry
        # enormous whitened weights, and an unclamped f32 GN step can
        # overshoot into a residual overflow -> NaN spiral; near
        # convergence steps are far below these bounds, so the fixed
        # point (and f64 parity) is untouched.
        d = delta.reshape(K, 15)
        caps = jnp.asarray([2.0] * 3 + [0.5] * 3 + [5.0] * 3 + [0.1] * 6,
                           dtype)
        d = jnp.clip(d, -caps, caps)
        # A residual overflow can make H indefinite in f32 -> Cholesky
        # NaN; rejecting the step (zero update) lets the next iteration
        # retry from the undamaged state instead of poisoning the window.
        d = jnp.where(jnp.isfinite(d), d, 0.0)
        states = jax.vmap(factors.state_boxplus)(w.states, d)
        return w._replace(states=states)

    win = jax.lax.fori_loop(0, config.gn_iterations, gn_step, win)
    win = win._replace(opt_count=win.opt_count + 1)

    # Post-solve sanity clamps (``:4656-4710``)
    s = win.states
    speed = jnp.linalg.norm(s.v, axis=-1, keepdims=True)
    scale = jnp.minimum(1.0, config.max_speed_clamp / jnp.maximum(speed, 1e-9))
    s = s._replace(
        v=s.v * scale,
        ba=jnp.clip(s.ba, -config.max_bias, config.max_bias),
        bg=jnp.clip(s.bg, -config.max_bias, config.max_bias),
    )
    return win._replace(states=s)


def _marginalize_oldest(win: SlidingWindow, config: WindowConfig):
    """Schur-complement slot 0 onto slot 1 and shift the window left.

    Linearizes ALL factors touching slot 0 that involve only slots 0/1
    (position/velocity/orientation measurements, IMU 0-1, the full
    soft-constraint family, existing prior) over the 30-dim (slot0, slot1)
    tangent, eliminates slot 0 (``MarginalizationInfo::marginalize``,
    ``:762-979``; the reference's MarginalizationFactor likewise keeps a
    fixed (slot1, slot0) block layout ``:1023-1030``, so the i <-> i+2
    smoothness term is dropped by both), and installs the resulting 15-dim
    prior on the new slot 0.
    """
    dtype = win.meas_p.dtype
    full_mode = (win.opt_count >= config.simplified_first_n).astype(dtype)

    def r01(delta30):
        d = delta30.reshape(2, 15)
        s0 = factors.state_boxplus(_state_at(win.states, 0), d[0])
        s1 = factors.state_boxplus(_state_at(win.states, 1), d[1])
        parts = []
        pos_gate = (win.meas_valid[0] & win.active[0]).astype(dtype)
        if config.use_gps:
            w_pos = jnp.asarray([
                1.0 / config.gps_pos_sigma, 1.0 / config.gps_pos_sigma,
                1.0 / (config.gps_pos_sigma * config.gps_pos_z_sigma_factor),
            ], dtype)
        else:
            w_pos = jnp.asarray(1.0 / config.pos_sigma, dtype)
        r_p0 = factors.position_residual(s0, win.meas_p[0], w_pos) * pos_gate
        if not config.use_gps and config.huber_delta > 0:
            # Mirror _stack_residuals' sqrt-Huber IRLS weight so the prior
            # installed on the new slot 0 linearizes the SAME robustified
            # cost the window optimized (an outlier fix on the marginalized
            # keyframe must not enter the prior at full weight).
            nrm = jnp.sqrt(jnp.sum(r_p0 * r_p0) + 1e-12)
            hw = jnp.sqrt(jnp.minimum(1.0, config.huber_delta
                                      / config.pos_sigma / nrm))
            r_p0 = r_p0 * jax.lax.stop_gradient(hw)
        parts.append(r_p0)
        if config.use_gps and config.use_yaw_only_orientation:
            mq = win.meas_q[0]
            yaw = jnp.arctan2(
                2.0 * (mq[0] * mq[3] + mq[1] * mq[2]),
                1.0 - 2.0 * (mq[2] * mq[2] + mq[3] * mq[3]))
            parts.append(factors.yaw_only_orientation_residual(
                s0, yaw, config.yaw_weight)
                * (win.meas_q_valid[0] & win.active[0]).astype(dtype))
        if config.use_gps and config.use_gps_velocity \
                and config.enable_velocity_constraint:
            parts.append(factors.velocity_residual(
                s0, win.meas_v[0], 1.0 / config.gps_vel_sigma)
                * (win.meas_v_valid[0] & win.active[0]).astype(dtype))
        if config.use_gps and config.use_gps_orientation:
            parts.append(factors.gps_orientation_residual(
                s0, win.meas_q[0], 1.0 / config.gps_orientation_sigma)
                * (win.meas_q_valid[0] & win.active[0]).astype(dtype))
        pre = jax.tree_util.tree_map(lambda x: x[0], win.preints)
        r = factors.imu_residual(s0, s1, pre, win.pair_dt[0],
                                 win.lin_ba[0], win.lin_bg[0])
        U, ba_w, bg_w = factors.imu_sqrt_info(pre)
        r9 = jnp.matmul(U, r[:9], precision=_HP)
        rb = jnp.concatenate([r[9:12] * ba_w, r[12:15] * bg_w])
        parts.append(jnp.concatenate([r9, rb])
                     * win.pair_valid[0].astype(dtype))
        if config.enable_bias_constraint:
            parts.append(factors.bias_magnitude_residual(
                s0, config.bias_acc_weight, config.bias_gyro_weight)
                * win.active[0].astype(dtype))
        if config.enable_velocity_constraint:
            parts.append(factors.velocity_magnitude_residual(
                s0, config.max_velocity) * win.active[0].astype(dtype))
        if config.enable_roll_pitch_prior:
            parts.append(factors.roll_pitch_prior_residual(
                s0, config.roll_pitch_weight) * win.active[0].astype(dtype))
        if config.enable_gravity_alignment:
            parts.append(factors.gravity_alignment_residual(
                s0, win.mean_acc[0], config.gravity_alignment_weight)
                * (win.acc_valid[0] & win.active[0]).astype(dtype))
        if config.enable_horizontal_velocity_incentive:
            parts.append(factors.horizontal_velocity_incentive_residual(
                s0, config.min_horizontal_velocity,
                config.horizontal_velocity_weight)
                * win.active[0].astype(dtype) * full_mode)
        if config.enable_orientation_smoothness:
            parts.append(factors.orientation_smoothness_residual(
                s0, s1, config.orientation_smoothness_weight)
                * win.pair_valid[0].astype(dtype) * full_mode)
        parts.append((jnp.matmul(
            win.prior_sqrt_info, _boxminus(s0, win.prior_state),
            precision=_HP) + win.prior_r0) * win.prior_valid.astype(dtype))
        return jnp.concatenate(parts)

    z30 = jnp.zeros(30, dtype)
    r0 = r01(z30)
    J = jax.jacfwd(r01)(z30)
    H = jnp.matmul(J.T, J, precision=_HP)
    b = jnp.matmul(J.T, r0, precision=_HP)

    Hmm = H[:15, :15] + 1e-8 * jnp.eye(15, dtype=dtype)
    Hmk = H[:15, 15:]
    Hkk = H[15:, 15:]
    bm = b[:15]
    bk = b[15:]
    Hmm_inv = jnp.linalg.inv(0.5 * (Hmm + Hmm.T))
    H_new = Hkk - jnp.matmul(Hmk.T, jnp.matmul(Hmm_inv, Hmk, precision=_HP),
                             precision=_HP)
    b_new = bk - jnp.matmul(Hmk.T, jnp.matmul(Hmm_inv, bm, precision=_HP),
                            precision=_HP)

    # Eigendecomposition-regularized square root (``:940-978``)
    evals, evecs = jnp.linalg.eigh(0.5 * (H_new + H_new.T))
    evals_c = jnp.maximum(evals, 0.0)
    sqrt_info = (evecs * jnp.sqrt(evals_c)[None, :]) @ evecs.T
    # r0 such that sqrt_info dx + r0 reproduces gradient: r0 = sqrt_info^+ b
    inv_sqrt = (evecs * jnp.where(evals_c > 1e-8,
                                  1.0 / jnp.sqrt(jnp.maximum(evals_c, 1e-8)),
                                  0.0)[None, :]) @ evecs.T
    r0_new = jnp.matmul(inv_sqrt, b_new, precision=_HP)

    # Shift everything left by one slot
    def shift(x, fill=0):
        return jnp.concatenate([x[1:], jnp.full_like(x[:1], fill)], 0)

    states = jax.tree_util.tree_map(lambda x: shift(x), win.states)
    states = states._replace(q=states.q.at[-1, 0].set(1.0))
    preints = jax.tree_util.tree_map(lambda x: shift(x), win.preints)
    preints = preints._replace(
        delta_q=preints.delta_q.at[-1, 0].set(1.0),
        covariance=preints.covariance.at[-1].set(
            jnp.eye(9, dtype=dtype) * 1e-4),
    )
    def shift_bool(x):
        return shift(x.astype(jnp.int32)).astype(bool)

    meas_q = shift(win.meas_q).at[-1, 0].set(1.0)
    return win._replace(
        states=states,
        timestamps=shift(win.timestamps),
        meas_p=shift(win.meas_p),
        meas_valid=shift_bool(win.meas_valid),
        meas_v=shift(win.meas_v),
        meas_v_valid=shift_bool(win.meas_v_valid),
        meas_q=meas_q,
        meas_q_valid=shift_bool(win.meas_q_valid),
        mean_acc=shift(win.mean_acc),
        acc_valid=shift_bool(win.acc_valid),
        active=shift_bool(win.active),
        count=win.count - 1,
        preints=preints,
        pair_dt=shift(win.pair_dt),
        pair_valid=shift(win.pair_valid.astype(jnp.int32)).astype(bool),
        lin_ba=shift(win.lin_ba),
        lin_bg=shift(win.lin_bg),
        prior_sqrt_info=sqrt_info,
        prior_r0=r0_new,
        prior_state=_state_at(win.states, 1),
        prior_valid=jnp.asarray(True),
    )


def window_push(win: SlidingWindow, state_guess: NavState, timestamp,
                meas_p, meas_valid, preint: Preintegrated, pair_dt,
                config: WindowConfig = WindowConfig(),
                meas_v=None, meas_v_valid=False,
                meas_q=None, meas_q_valid=False,
                mean_acc=None, acc_valid=False) -> SlidingWindow:
    """Append a keyframe (marginalizing the oldest first if full).

    ``preint`` integrates from the previous keyframe to this one (ignored
    for the first keyframe). Optional GPS velocity/orientation fixes and a
    keyframe-nearest accelerometer sample feed the GPS-branch factors.
    jit-safe: the marginalization branch runs via ``lax.cond``.
    """
    K = config.window_size
    dtype = win.meas_p.dtype
    if meas_v is None:
        meas_v = jnp.zeros(3, dtype)
    if meas_q is None:
        meas_q = jnp.zeros(4, dtype).at[0].set(1.0)
    if mean_acc is None:
        mean_acc = jnp.zeros(3, dtype)

    win = jax.lax.cond(
        win.count >= K,
        lambda w: _marginalize_oldest(w, config),
        lambda w: w,
        win,
    )
    i = win.count  # insertion slot

    def set_at(arr, idx, val):
        return arr.at[idx].set(val)

    states = jax.tree_util.tree_map(
        lambda buf, v: buf.at[i].set(v), win.states, state_guess)
    prev_state = _state_at(win.states, jnp.maximum(i - 1, 0))
    preints = jax.tree_util.tree_map(
        lambda buf, v: buf.at[jnp.maximum(i - 1, 0)].set(v),
        win.preints, preint)
    has_prev = i > 0
    return win._replace(
        states=states,
        timestamps=set_at(win.timestamps, i, timestamp),
        meas_p=set_at(win.meas_p, i, meas_p),
        meas_valid=set_at(win.meas_valid, i, meas_valid),
        meas_v=set_at(win.meas_v, i, meas_v),
        meas_v_valid=set_at(win.meas_v_valid, i,
                            jnp.asarray(meas_v_valid, bool)),
        meas_q=set_at(win.meas_q, i, meas_q),
        meas_q_valid=set_at(win.meas_q_valid, i,
                            jnp.asarray(meas_q_valid, bool)),
        mean_acc=set_at(win.mean_acc, i, mean_acc),
        acc_valid=set_at(win.acc_valid, i, jnp.asarray(acc_valid, bool)),
        active=set_at(win.active, i, True),
        count=win.count + 1,
        preints=preints,
        pair_dt=set_at(win.pair_dt, jnp.maximum(i - 1, 0),
                       jnp.where(has_prev, pair_dt, win.pair_dt[0])),
        pair_valid=set_at(win.pair_valid, jnp.maximum(i - 1, 0),
                          has_prev),
        lin_ba=set_at(win.lin_ba, jnp.maximum(i - 1, 0), prev_state.ba),
        lin_bg=set_at(win.lin_bg, jnp.maximum(i - 1, 0), prev_state.bg),
    )


def reset_to_measurement(win: SlidingWindow, meas_p,
                         config: WindowConfig = WindowConfig()) -> SlidingWindow:
    """Divergence recovery (``resetStateToUwb/Gps``, ``uwb_imu_batch_node.cpp:
    4135-4287``): snap the newest state's position to the raw measurement,
    zero velocity and biases, and drop the marginalization prior (history is
    no longer trustworthy)."""
    i = jnp.maximum(win.count - 1, 0)
    states = win.states
    dtype = states.p.dtype
    states = states._replace(
        p=states.p.at[i].set(meas_p),
        v=states.v.at[i].set(jnp.zeros(3, dtype)),
        ba=states.ba.at[i].set(jnp.zeros(3, dtype)),
        bg=states.bg.at[i].set(jnp.zeros(3, dtype)),
    )
    return win._replace(
        states=states,
        prior_valid=jnp.asarray(False),
        prior_sqrt_info=jnp.zeros_like(win.prior_sqrt_info),
        prior_r0=jnp.zeros_like(win.prior_r0),
    )


def window_is_diverged(win: SlidingWindow, meas_p,
                       max_position_error: float = 5.0):
    """Divergence test (PositionDriftFactor limit, ``uwb_imu_node.cpp:
    595-604``): newest state too far from the raw measurement."""
    i = jnp.maximum(win.count - 1, 0)
    return jnp.linalg.norm(win.states.p[i] - meas_p) > max_position_error
