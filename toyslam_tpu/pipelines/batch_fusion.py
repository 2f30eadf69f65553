"""Streaming sliding-window smoother pipeline (the flagship estimator).

Capability port of ``uwb_imu_batch_node.cpp``'s runtime composition — the
piece between the callbacks and the solver:

- keyframe per measurement (``uwbCallback``/``gpsCallback`` ->
  ``createKeyframe``, ``:3100-3257,2284``), with the state guess propagated
  from the previous keyframe through the IMU chunk (``propagateState``,
  ``:4876-5030``);
- preintegration between keyframes with synthetic IMU gap fill when the
  buffer has a hole (``performPreintegrationBetweenKeyframes``,
  ``:3559-3781``);
- init-from-measurement with 70/30 position blending (50/50 for very large
  jumps), used both at initialization and on divergence reset
  (``resetStateToGps``, ``:4185-4287``, blend ``:4195``);
- window push + optimize per measurement (``optimizationTimerCallback`` ->
  ``optimizeFactorGraph``, ``:4003,4354``), UWB or GPS branch;
- high-rate IMU propagation of the latest optimized state between
  optimizations (``propagateStateWithImu`` + ``publishImuPose``,
  ``:5089-5220,4768-4875``).

TPU design: the whole measurement log is one ``lax.scan`` over fixed-shape
IMU chunks ``[M, R, 3]`` (R = max IMU samples per measurement gap, padded
with a validity mask); ROS callbacks/mutexes vanish. The high-rate output
is a separate ``vmap``-over-chunks pass from the optimized keyframes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from toyslam_tpu.core import se3
from toyslam_tpu.estimators import preintegration, window
from toyslam_tpu.estimators.factors import NavState
from toyslam_tpu.estimators.preintegration import (
    PreintegrationParams, Preintegrated)

_HP = jax.lax.Precision.HIGHEST


class BatchFusionConfig(NamedTuple):
    # Reference default: optimization_window_size = 20
    # (``uwb_imu_batch_node.cpp:3229-3235``).
    window: window.WindowConfig = window.WindowConfig(window_size=20)
    preint: PreintegrationParams = PreintegrationParams(
        acc_noise=0.03, gyro_noise=0.002)
    # Divergence reset threshold (PositionDriftFactor limit / reset logic)
    max_position_error: float = 5.0
    # Position blending on init/reset: blend*meas + (1-blend)*current
    # (``:4195``); jumps larger than 10 m use the conservative 0.5.
    init_blend: float = 0.7
    large_jump: float = 10.0
    # Seed orientation from the measurement when available
    # (use_gps_orientation_as_initial_, ``:1364``)
    use_orientation_as_initial: bool = True


class BatchFusionOutput(NamedTuple):
    kf_p: jax.Array  # [M, 3] optimized newest-keyframe position
    kf_q: jax.Array  # [M, 4]
    kf_v: jax.Array  # [M, 3]
    kf_ba: jax.Array  # [M, 3]
    kf_bg: jax.Array  # [M, 3]
    reset: jax.Array  # [M] bool (divergence reset fired)
    win: window.SlidingWindow  # final window


def _propagate(state: NavState, pre: Preintegrated, dt, gravity_w):
    """Predict the next keyframe state from a preintegrated chunk
    (``propagateState``, ``:4876``). The preintegrator compensates gravity
    inside the chunk with the start-frame attitude, so the deltas already
    exclude gravity."""
    R = se3.quat_to_rot(state.q)
    p = state.p + state.v * dt + jnp.matmul(R, pre.delta_p, precision=_HP)
    v = state.v + jnp.matmul(R, pre.delta_v, precision=_HP)
    q = se3.quat_multiply(state.q, pre.delta_q)
    q = q / jnp.linalg.norm(q)
    return NavState(p=p, q=q, v=v, ba=state.ba, bg=state.bg)


def batch_fusion(imu_acc, imu_gyro, imu_dt, imu_valid,
                 meas_t, meas_p, meas_p_valid,
                 meas_v=None, meas_v_valid=None,
                 meas_q=None, meas_q_valid=None,
                 mean_acc=None,
                 config: BatchFusionConfig = BatchFusionConfig(),
                 init_window: window.SlidingWindow | None = None,
                 init_state: NavState | None = None,
                 initialized: bool = False):
    """Run the streaming smoother over a measurement log.

    imu_*: [M, R, ...] — the IMU chunk covering (t_{m-1}, t_m], padded to R
    samples with ``imu_valid``. meas_p: [M, 3] UWB/GPS position fixes with
    validity. Optional GPS velocity/orientation fixes and the chunk's
    keyframe-nearest accelerometer sample (gravity alignment factor).
    Returns per-measurement optimized newest states.

    ``init_window``/``init_state``/``initialized`` resume a previous run
    from a checkpointed window + current state (lax.scan carry =
    snapshot; see test_batch_fusion_checkpoint_resume).
    """
    M, R = imu_acc.shape[:2]
    dtype = imu_acc.dtype
    cfg_w = config.window
    gw = jnp.asarray([0.0, 0.0, -9.81], dtype)

    if meas_v is None:
        meas_v = jnp.zeros((M, 3), dtype)
    if meas_v_valid is None:
        meas_v_valid = jnp.zeros((M,), bool)
    if meas_q is None:
        meas_q = jnp.zeros((M, 4), dtype).at[:, 0].set(1.0)
    if meas_q_valid is None:
        meas_q_valid = jnp.zeros((M,), bool)
    if mean_acc is None:
        # Default: masked mean of the chunk's valid accelerometer samples
        # (the reference's GravityAlignmentFactor consumes an averaged
        # acceleration, ``uwb_imu_batch_node.cpp:296-334,4510-4536``; a
        # single sample would make the factor noise-dominated, and mean
        # over the mask is also robust to interior gaps in the chunk).
        wv = imu_valid.astype(dtype)[..., None]
        mean_acc = (jnp.sum(imu_acc * wv, axis=1)
                    / jnp.maximum(jnp.sum(wv, axis=1), 1.0))
    acc_valid = jnp.sum(imu_valid.astype(jnp.int32), axis=1) > 0

    win0 = (window.window_init(cfg_w, dtype)
            if init_window is None else init_window)

    def step(carry, inp):
        win, cur, initialized = carry
        (t, p_m, p_ok, v_m, v_ok, q_m, q_ok, a_m, a_ok,
         acc, gyro, dts, vld) = inp

        dt_total = jnp.sum(jnp.where(vld, dts, 0.0))
        n_valid = jnp.sum(vld.astype(jnp.int32))

        # Preintegrate the chunk with the current bias estimate and
        # start-frame gravity; if the buffer has a gap (no valid samples
        # but wall time passed), synthesize a constant-rate chunk from the
        # boundary states (``:3646-3781``).
        R_T = se3.quat_to_rot(se3.quat_conjugate(cur.q))
        pre_real = preintegration.preintegrate(
            acc, gyro, dts, cur.ba, cur.bg,
            gravity_sensor=jnp.matmul(R_T, gw, precision=_HP),
            params=config.preint, valid=vld)
        def syn_pre():
            # Constant-motion fill anchored at the current state (the
            # reference interpolates the two boundary keyframes; in the
            # forward pass only the start boundary exists yet).
            s_acc, s_gyro, s_dts = preintegration.synthesize_imu_gap(
                cur.q, cur.v, cur.q, cur.v, jnp.maximum(dt_total, 0.05),
                n_samples=R, gravity_world=gw, dtype=dtype)
            return preintegration.preintegrate(
                s_acc, s_gyro, s_dts, cur.ba, cur.bg,
                gravity_sensor=jnp.matmul(R_T, gw, precision=_HP),
                params=config.preint)

        pre = jax.lax.cond(n_valid > 0, lambda: pre_real, syn_pre)

        # Propagated state guess for the new keyframe
        guess = _propagate(cur, pre, dt_total, gw)

        # Initialization / divergence reset with blended position
        def blended(state, target):
            diff = jnp.linalg.norm(target - state.p)
            blend = jnp.where(diff > config.large_jump, 0.5,
                              config.init_blend)
            return state.p * (1.0 - blend) + target * blend

        init_q = jnp.where(
            q_ok & config.use_orientation_as_initial, q_m, guess.q)
        init_v = jnp.where(v_ok, v_m, jnp.zeros(3, dtype))
        first_fix = p_ok & (~initialized)
        diverged = p_ok & initialized & (
            jnp.linalg.norm(guess.p - p_m) > config.max_position_error)

        guess = NavState(
            p=jnp.where(first_fix | diverged, blended(guess, p_m), guess.p),
            q=jnp.where(first_fix, init_q, guess.q),
            v=jnp.where(first_fix | diverged, init_v, guess.v),
            ba=jnp.where(first_fix | diverged, jnp.zeros(3, dtype), guess.ba),
            bg=jnp.where(first_fix | diverged, jnp.zeros(3, dtype), guess.bg),
        )
        # On divergence the marginalization prior summarizes a history we
        # no longer trust: drop it (``resetStateToUwb/Gps``).
        win = win._replace(
            prior_valid=win.prior_valid & ~diverged,
        )

        win = window.window_push(
            win, guess, t, p_m, p_ok, pre, dt_total, cfg_w,
            meas_v=v_m, meas_v_valid=v_ok,
            meas_q=q_m, meas_q_valid=q_ok,
            mean_acc=a_m, acc_valid=a_ok)
        win = window.window_optimize(win, cfg_w)

        newest = jnp.maximum(win.count - 1, 0)
        est = jax.tree_util.tree_map(lambda x: x[newest], win.states)
        out = (est.p, est.q, est.v, est.ba, est.bg, diverged)
        return (win, est, initialized | p_ok), out

    cur0 = NavState(p=jnp.zeros(3, dtype),
                    q=jnp.zeros(4, dtype).at[0].set(1.0),
                    v=jnp.zeros(3, dtype), ba=jnp.zeros(3, dtype),
                    bg=jnp.zeros(3, dtype)) if init_state is None \
        else init_state
    (win_f, _, _), outs = jax.lax.scan(
        step, (win0, cur0, jnp.asarray(initialized, bool)),
        (meas_t, meas_p, meas_p_valid, meas_v, meas_v_valid,
         meas_q, meas_q_valid, mean_acc, acc_valid,
         imu_acc, imu_gyro, imu_dt, imu_valid))
    kf_p, kf_q, kf_v, kf_ba, kf_bg, reset = outs
    return BatchFusionOutput(kf_p=kf_p, kf_q=kf_q, kf_v=kf_v, kf_ba=kf_ba,
                             kf_bg=kf_bg, reset=reset, win=win_f)


def high_rate_trajectory(kf_states: NavState, imu_acc, imu_gyro, imu_dt,
                         imu_valid,
                         config: BatchFusionConfig = BatchFusionConfig()):
    """IMU-rate pose output between optimizations.

    Port of ``propagateStateWithImu`` + ``publishImuPose``
    (``:5089-5220,4768-4875``): from each optimized keyframe state,
    integrate the FOLLOWING chunk sample by sample, emitting a pose per
    IMU tick. kf_states leaves are [M, ...]; imu chunks [M, R, ...] where
    chunk m spans (t_m, t_{m+1}]. Returns (p [M, R, 3], q [M, R, 4],
    v [M, R, 3]). vmapped over chunks — each chunk is independent given
    its keyframe, so this is embarrassingly parallel.
    """
    gw = jnp.asarray([0.0, 0.0, -9.81], imu_acc.dtype)

    def one_chunk(state: NavState, acc, gyro, dts, vld):
        def tick(s, inp):
            a, g, dt, ok = inp
            dt = jnp.where(
                ok & (dt > config.preint.min_integration_dt)
                & (dt <= config.preint.max_imu_dt), dt, 0.0)
            w = (g - s.bg) * dt
            dq = se3.quat_boxplus(jnp.zeros(4).at[0].set(1.0).astype(s.q.dtype),
                                  w)
            q_new = se3.quat_multiply(s.q, dq)
            q_new = q_new / jnp.linalg.norm(q_new)
            R = se3.quat_to_rot(s.q)
            a_w = jnp.matmul(R, a - s.ba, precision=_HP) + gw
            p_new = s.p + s.v * dt + 0.5 * a_w * dt * dt
            v_new = s.v + a_w * dt
            s2 = s._replace(p=p_new, q=q_new, v=v_new)
            return s2, (p_new, q_new, v_new)

        _, (ps, qs, vs) = jax.lax.scan(tick, state, (acc, gyro, dts, vld))
        return ps, qs, vs

    return jax.vmap(one_chunk)(kf_states, imu_acc, imu_gyro, imu_dt,
                               imu_valid)
