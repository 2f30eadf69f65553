"""Factor library for the sliding-window smoother.

Capability port of the Ceres factor collection in
``uwb_imu_batch_node.cpp:27-533, 1070-1336``: ImuFactor (15-dim residual with
bias-corrected preintegrated deltas and sqrt-information weighting),
UWB/GPS position and velocity factors, and the soft constraint family
(bias magnitude ``:106-145``, adaptive velocity magnitude ``:148-181``,
roll/pitch prior ``:220-250``, orientation smoothness ``:252-294``, gravity
alignment ``:296-334``).

Design: Ceres autodiff Jets are replaced by JAX autodiff — every factor is a
pure residual function of one or two states; the window optimizer takes
Jacobians of the stacked residual vector with ``jax.jacfwd``.

State layout (matches the reference's [pose(7) | speed(3) | bias(6)] blocks):
a NamedTuple of p [3], q [4] (wxyz), v [3], ba [3], bg [3]; the error/tangent
space is 15-dim [dp, dtheta, dv, dba, dbg] with right-multiplied attitude
error (``PoseParameterization::Plus``, ``:32-68``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from toyslam_tpu.core import se3
from toyslam_tpu.estimators.preintegration import Preintegrated

_HP = jax.lax.Precision.HIGHEST

GRAVITY_W = jnp.array([0.0, 0.0, -9.81])  # world gravity acceleration


class NavState(NamedTuple):
    p: jax.Array  # [..., 3]
    q: jax.Array  # [..., 4] wxyz, world <- body
    v: jax.Array  # [..., 3]
    ba: jax.Array  # [..., 3]
    bg: jax.Array  # [..., 3]


def state_boxplus(s: NavState, delta) -> NavState:
    """s ⊞ delta with delta = [dp, dtheta, dv, dba, dbg] (15)."""
    return NavState(
        p=s.p + delta[..., 0:3],
        q=se3.quat_boxplus(s.q, delta[..., 3:6]),
        v=s.v + delta[..., 6:9],
        ba=s.ba + delta[..., 9:12],
        bg=s.bg + delta[..., 12:15],
    )


def quat_error(q_a, q_b):
    """2 * vec(q_a^-1 q_b): small-angle attitude residual."""
    dq = se3.quat_multiply(se3.quat_conjugate(q_a), q_b)
    # Keep w positive for the short geodesic
    sign = jnp.sign(jnp.where(dq[..., 0] == 0, 1.0, dq[..., 0]))
    return 2.0 * dq[..., 1:4] * sign[..., None]


def imu_residual(s_i: NavState, s_j: NavState, preint: Preintegrated,
                 dt, lin_ba, lin_bg):
    """Preintegration factor residual (ImuFactor, ``:1101-1304``), 15-dim.

    ``lin_ba/lin_bg`` are the biases the chunk was integrated with; the
    deltas are first-order corrected to the current estimate via the bias
    Jacobian (``correct_for_bias_change`` semantics).
    """
    db = jnp.concatenate([s_i.ba - lin_ba, s_i.bg - lin_bg])
    corr = jnp.matmul(preint.jacobian_bias, db, precision=_HP)
    dp_corr = preint.delta_p + corr[0:3]
    dv_corr = preint.delta_v + corr[3:6]
    dq_corr = se3.quat_boxplus(preint.delta_q, corr[6:9])

    R_i_T = se3.quat_to_rot(se3.quat_conjugate(s_i.q))

    # NOTE on gravity: this preintegrator compensates gravity inside the
    # chunk using the start-keyframe orientation (reference ``:3905-3915``),
    # so the predicted deltas already exclude gravity.
    r_p = R_i_T @ (s_j.p - s_i.p - s_i.v * dt) - dp_corr
    r_q = quat_error(se3.quat_multiply(s_i.q, dq_corr), s_j.q)
    r_v = R_i_T @ (s_j.v - s_i.v) - dv_corr
    r_ba = s_j.ba - s_i.ba
    r_bg = s_j.bg - s_i.bg
    return jnp.concatenate([r_p, r_q, r_v, r_ba, r_bg])


def imu_sqrt_info(preint: Preintegrated, bias_walk_std=(0.01, 0.001)):
    """Block sqrt-information: whitening factor of the 9x9 preintegration
    covariance (``:1240-1270`` region) + diagonal bias-walk weights.

    cov = L L^T  =>  ||L^-1 r||^2 = r^T cov^-1 r, so the whitener is the
    triangular inverse of the covariance Cholesky factor — NO explicit
    matrix inverse (inverting the near-singular short-chunk covariance in
    f32 overflowed and NaNed the window solve; triangular solves stay
    stable). The jitter floor is scale-aware so short chunks (tiny
    covariances) are regularized proportionally.
    """
    dtype = preint.covariance.dtype
    eye9 = jnp.eye(9, dtype=dtype)
    scale = jnp.maximum(jnp.trace(preint.covariance) / 9.0, 1e-14)
    cov = (0.5 * (preint.covariance + preint.covariance.T)
           + (1e-6 * scale + 1e-14) * eye9)
    L = jnp.linalg.cholesky(cov)
    L = jnp.where(jnp.isfinite(L), L, eye9)
    U = jax.scipy.linalg.solve_triangular(L, eye9, lower=True)
    ba_w = 1.0 / (bias_walk_std[0] * jnp.sqrt(jnp.maximum(preint.sum_dt, 1e-3)))
    bg_w = 1.0 / (bias_walk_std[1] * jnp.sqrt(jnp.maximum(preint.sum_dt, 1e-3)))
    return U, ba_w, bg_w  # whitener (L^-1) 9x9 + scalar bias weights


def position_residual(s: NavState, meas_p, weight):
    """UWB/GPS position factor (UwbPositionFactor ``:1070-1099``,
    GpsPositionFactor ``:473-505``)."""
    return (s.p - meas_p) * weight


def velocity_residual(s: NavState, meas_v, weight):
    """GPS velocity factor (``:507-533``)."""
    return (s.v - meas_v) * weight


def bias_magnitude_residual(s: NavState, acc_w=1.0, gyro_w=10.0):
    """Soft zero-bias pull (BiasMagnitudeConstraint, ``:106-145``)."""
    return jnp.concatenate([s.ba * acc_w, s.bg * gyro_w])


def _safe_norm(v, eps=1e-12):
    """norm with a well-defined (zero) gradient at v = 0 for jacfwd."""
    return jnp.sqrt(jnp.sum(v * v) + eps)


def velocity_magnitude_residual(s: NavState, max_velocity=5.0, weight=1.0):
    """Penalize speed beyond a cap (adaptive VelocityMagnitudeConstraint,
    ``:148-181``): zero inside the cap, linear beyond."""
    excess = jnp.maximum(_safe_norm(s.v) - max_velocity, 0.0)
    return jnp.atleast_1d(excess * weight)


def horizontal_velocity_incentive_residual(s: NavState, min_speed=0.1,
                                           weight=0.1):
    """Encourage nonzero horizontal motion (``:183-218``)."""
    h_speed = _safe_norm(s.v[:2])
    deficit = jnp.maximum(min_speed - h_speed, 0.0)
    return jnp.atleast_1d(deficit * weight)


def roll_pitch_prior_residual(s: NavState, weight=1.0):
    """Keep roll/pitch near zero (RollPitchPriorFactor, ``:220-250``):
    penalize the tilt of the body z-axis from world up."""
    R = se3.quat_to_rot(s.q)
    body_z_in_world = R[:, 2]
    return (body_z_in_world[:2]) * weight


def orientation_smoothness_residual(s_i: NavState, s_j: NavState, weight=1.0):
    """Small relative rotation between neighbors (``:252-294``)."""
    return quat_error(s_i.q, s_j.q) * weight


def gravity_alignment_residual(s: NavState, mean_acc_body, weight=1.0):
    """Accelerometer direction should match -gravity in body frame when
    quasi-static (GravityAlignmentFactor, ``:296-334``)."""
    R_T = se3.quat_to_rot(se3.quat_conjugate(s.q))
    g_body = R_T @ (-GRAVITY_W)
    a = mean_acc_body - s.ba
    a_dir = a / _safe_norm(a, 1e-12)
    g_dir = g_body / _safe_norm(g_body, 1e-12)
    return (a_dir - g_dir) * weight


def gps_orientation_residual(s: NavState, meas_q, weight=1.0):
    """Full GPS orientation factor (GpsOrientationFactor, ``:421-470``):
    3-dim attitude error against the measured quaternion, weighted
    1/noise_std. The reference computes angle * axis via acos; this uses
    the equivalent-to-first-order (and smooth at zero) small-angle form
    2 * vec(q^-1 q_meas)."""
    return quat_error(s.q, meas_q) * weight


def yaw_only_orientation_residual(s: NavState, meas_yaw, weight=1.0):
    """GPS heading factor (YawOnlyOrientationFactor, ``:336-470``)."""
    R = se3.quat_to_rot(s.q)
    yaw = jnp.arctan2(R[1, 0], R[0, 0])
    d = jnp.mod(yaw - meas_yaw + jnp.pi, 2 * jnp.pi) - jnp.pi
    return jnp.atleast_1d(d * weight)
