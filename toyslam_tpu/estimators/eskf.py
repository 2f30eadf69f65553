"""Error-state Kalman filter for loosely-coupled IMU + position fusion.

Capability port of ``lidar_subscriber/src/uwb_imu_EKF_node.cpp``: nominal
state [p(3), v(3), q(4), b_a(3), b_g(3)] with a 15-dim error state; IMU
predict (``:87-156``), position update with quaternion boxplus correction
(``:187-225``), and the same simplified F/Q structure and default noise
parameters (``:28-33``).

TPU design: the state is a NamedTuple of arrays, every step is a pure
function — vmap over filters, ``lax.scan`` over time. A whole IMU+UWB log
fuses in one compiled ``eskf_run`` call.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from toyslam_tpu.core import se3

_HP = jax.lax.Precision.HIGHEST

GRAVITY = 9.81  # matches uwb_imu_EKF_node.cpp:111


class ESKFParams(NamedTuple):
    """Noise parameters; defaults from ``uwb_imu_EKF_node.cpp:28-33``."""

    acc_noise: float = 0.01
    gyro_noise: float = 0.005
    acc_bias_noise: float = 0.0001
    gyro_bias_noise: float = 0.0001
    meas_noise: float = 0.001
    init_cov: float = 0.1


class ESKFState(NamedTuple):
    p: jax.Array  # [3] position
    v: jax.Array  # [3] velocity
    q: jax.Array  # [4] orientation (Hamilton wxyz, world <- body)
    ba: jax.Array  # [3] accelerometer bias
    bg: jax.Array  # [3] gyroscope bias
    P: jax.Array  # [15, 15] error-state covariance


def init_state(dtype=jnp.float32, params: ESKFParams = ESKFParams()) -> ESKFState:
    return ESKFState(
        p=jnp.zeros(3, dtype),
        v=jnp.zeros(3, dtype),
        q=se3.quat_identity(dtype),
        ba=jnp.zeros(3, dtype),
        bg=jnp.zeros(3, dtype),
        P=jnp.eye(15, dtype=dtype) * params.init_cov,
    )


def predict(state: ESKFState, acc, gyro, dt,
            params: ESKFParams = ESKFParams()) -> ESKFState:
    """IMU propagation (reference ``predict``, ``uwb_imu_EKF_node.cpp:87-156``).

    dt <= 0 is a no-op (the reference early-returns on non-positive dt).
    """
    dtype = state.p.dtype
    dt = jnp.asarray(dt, dtype)

    acc_u = acc - state.ba
    gyro_u = gyro - state.bg

    omega = gyro_u * dt
    theta = jnp.linalg.norm(omega)
    small = theta <= 1e-6
    axis = omega / jnp.where(small, 1.0, theta)
    dq = jnp.where(
        small,
        se3.quat_identity(dtype),
        se3.quat_from_axis_angle(axis, theta),
    )
    q_new = se3.quat_normalize(se3.quat_multiply(state.q, dq))

    R = se3.quat_to_rot(state.q)
    a_world = (R @ acc_u) - jnp.array([0.0, 0.0, GRAVITY], dtype)
    v_new = state.v + a_world * dt
    p_new = state.p + v_new * dt + 0.5 * a_world * dt * dt

    # Error-state transition F. Structure follows ``computeF`` (``:138-156``)
    # with one correction: the velocity/attitude coupling must be
    # -R [acc_body_unbiased]x dt for the local (right-multiplied) attitude
    # error this filter uses; the reference's ``-R skew(a_world) dt``
    # (``:146``) mixes frames and includes gravity, which destabilizes bias
    # estimation under realistic noise (cf. the imu_gps_localization bug
    # note the reference itself cites at ``:147``).
    F = jnp.eye(15, dtype=dtype)
    F = F.at[0:3, 3:6].set(jnp.eye(3, dtype=dtype) * dt)
    F = F.at[3:6, 6:9].set(-R @ se3.skew(acc_u) * dt)
    F = F.at[3:6, 9:12].set(-R * dt)
    Rot_omega = se3.so3_exp(omega)
    F = F.at[6:9, 6:9].set(Rot_omega.T)
    F = F.at[6:9, 12:15].set(-jnp.eye(3, dtype=dtype) * dt)

    # Process noise (``computeQ``, ``:158-172``)
    Q = jnp.zeros((15, 15), dtype)
    Q = Q.at[0:3, 0:3].set(jnp.eye(3, dtype=dtype) * params.acc_noise**2 * dt**4)
    Q = Q.at[3:6, 3:6].set(jnp.eye(3, dtype=dtype) * params.acc_noise**2 * dt**2)
    Q = Q.at[6:9, 6:9].set(jnp.eye(3, dtype=dtype) * params.gyro_noise**2 * dt**2)
    Q = Q.at[9:12, 9:12].set(jnp.eye(3, dtype=dtype) * params.acc_bias_noise * dt)
    Q = Q.at[12:15, 12:15].set(jnp.eye(3, dtype=dtype) * params.gyro_bias_noise * dt)

    P_new = jnp.matmul(jnp.matmul(F, state.P, precision=_HP),
                       F.T, precision=_HP) + Q

    valid = dt > 0
    return ESKFState(
        p=jnp.where(valid, p_new, state.p),
        v=jnp.where(valid, v_new, state.v),
        q=jnp.where(valid, q_new, state.q),
        ba=state.ba,
        bg=state.bg,
        P=jnp.where(valid, P_new, state.P),
    )


def update_position(state: ESKFState, z, params: ESKFParams = ESKFParams(),
                    valid=True) -> ESKFState:
    """Position measurement update (reference ``update``, ``:187-225``).

    H = [I 0 ...]; Kalman gain via closed-form 3x3 inverse of S.
    """
    dtype = state.p.dtype
    R_meas = jnp.eye(3, dtype=dtype) * params.meas_noise

    # S = H P H^T + R = P[0:3, 0:3] + R
    S = state.P[0:3, 0:3] + R_meas
    S_inv = jnp.linalg.inv(S)
    # K = P H^T S^-1 = P[:, 0:3] @ S_inv
    K = jnp.matmul(state.P[:, 0:3], S_inv, precision=_HP)  # [15, 3]

    error = z - state.p
    dx = jnp.matmul(K, error, precision=_HP)  # [15]

    p_new = state.p + dx[0:3]
    v_new = state.v + dx[3:6]
    q_new = se3.quat_boxplus(state.q, dx[6:9])
    ba_new = state.ba + dx[9:12]
    bg_new = state.bg + dx[12:15]
    P_new = jnp.matmul(
        jnp.eye(15, dtype=dtype) - jnp.pad(K, ((0, 0), (0, 12))),
        state.P, precision=_HP,
    )

    valid = jnp.asarray(valid)
    return ESKFState(
        p=jnp.where(valid, p_new, state.p),
        v=jnp.where(valid, v_new, state.v),
        q=jnp.where(valid, q_new, state.q),
        ba=jnp.where(valid, ba_new, state.ba),
        bg=jnp.where(valid, bg_new, state.bg),
        P=jnp.where(valid, P_new, state.P),
    )


class ESKFLog(NamedTuple):
    """Time-synchronous input stream for a fused run.

    Every tick carries an IMU sample; position measurements are optional per
    tick (``meas_valid`` mask) — the lax.scan equivalent of the reference's
    asynchronous imu/uwb callbacks.
    """

    dt: jax.Array  # [T]
    acc: jax.Array  # [T, 3]
    gyro: jax.Array  # [T, 3]
    meas: jax.Array  # [T, 3]
    meas_valid: jax.Array  # [T] bool


def eskf_run(log: ESKFLog, state: ESKFState | None = None,
             params: ESKFParams = ESKFParams()):
    """Fuse a whole log in one lax.scan; returns (final_state, trajectory).

    trajectory: dict of stacked per-tick [T, ...] arrays (p, v, q).
    """
    if state is None:
        state = init_state(log.acc.dtype, params)

    def step(s, inp):
        dt, acc, gyro, z, zv = inp
        s = predict(s, acc, gyro, dt, params)
        s = update_position(s, z, params, valid=zv)
        return s, (s.p, s.v, s.q)

    final, (ps, vs, qs) = jax.lax.scan(
        step, state, (log.dt, log.acc, log.gyro, log.meas, log.meas_valid)
    )
    return final, {"p": ps, "v": vs, "q": qs}
