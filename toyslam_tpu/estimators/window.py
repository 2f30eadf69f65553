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
    pos_sigma: float = 0.05  # UWB position noise (m)
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


class SlidingWindow(NamedTuple):
    states: NavState  # each leaf [K, ...]
    timestamps: jax.Array  # [K]
    meas_p: jax.Array  # [K, 3]
    meas_valid: jax.Array  # [K] bool
    active: jax.Array  # [K] bool (filled slots)
    count: jax.Array  # scalar int
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
        active=jnp.zeros((K,), bool),
        count=jnp.zeros((), jnp.int32),
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

    res = []
    # Position factors
    w_pos = 1.0 / config.pos_sigma
    r_pos = jax.vmap(
        lambda s, m, v: factors.position_residual(s, m, w_pos) * v
    )(states, win.meas_p, (win.meas_valid & win.active).astype(dtype))
    res.append(r_pos.reshape(-1))

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

    if config.enable_orientation_smoothness:
        def one_sm(i):
            return factors.orientation_smoothness_residual(
                _state_at(states, i), _state_at(states, i + 1),
                config.orientation_smoothness_weight,
            ) * win.pair_valid[i].astype(dtype)
        r_sm = jax.vmap(one_sm)(jnp.arange(K - 1))
        res.append(r_sm.reshape(-1))

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
        delta = -jnp.linalg.solve(H, g) * act15
        states = jax.vmap(factors.state_boxplus)(w.states, delta.reshape(K, 15))
        return w._replace(states=states)

    win = jax.lax.fori_loop(0, config.gn_iterations, gn_step, win)

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

    Linearizes the factors touching slot 0 (position, IMU 0-1, existing
    prior) over the 30-dim (slot0, slot1) tangent, eliminates slot 0
    (``MarginalizationInfo::marginalize``, ``:762-979``), and installs the
    resulting 15-dim prior on the new slot 0.
    """
    dtype = win.meas_p.dtype

    def r01(delta30):
        d = delta30.reshape(2, 15)
        s0 = factors.state_boxplus(_state_at(win.states, 0), d[0])
        s1 = factors.state_boxplus(_state_at(win.states, 1), d[1])
        parts = []
        w_pos = 1.0 / config.pos_sigma
        parts.append(factors.position_residual(s0, win.meas_p[0], w_pos)
                     * (win.meas_valid[0] & win.active[0]).astype(dtype))
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
    return win._replace(
        states=states,
        timestamps=shift(win.timestamps),
        meas_p=shift(win.meas_p),
        meas_valid=shift(win.meas_valid.astype(jnp.int32)).astype(bool),
        active=shift(win.active.astype(jnp.int32)).astype(bool),
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
                config: WindowConfig = WindowConfig()) -> SlidingWindow:
    """Append a keyframe (marginalizing the oldest first if full).

    ``preint`` integrates from the previous keyframe to this one (ignored
    for the first keyframe). jit-safe: the marginalization branch runs via
    ``lax.cond``.
    """
    K = config.window_size

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
