"""IMU dead-reckoning with stationary calibration and ZUPT-style damping.

Capability port of ``lidar_subscriber/src/test.cpp`` (IMU integration node):
stationary gravity calibration incl. initial orientation from the gravity
direction (``:201-254``), first-order quaternion gyro integration
(``:256-273``), gravity-removed accelerometer double integration with
low-pass velocity filtering and zero-velocity damping (``:274-314``).

Sign note: the reference computes ``accel_world - (0,0,-g)`` (``:282-284``),
which ADDS gravity to a specific-force measurement; here the physically
correct ``accel_world - (0,0,+g)`` is used (a static IMU must integrate to
zero velocity), matching the conventions of the rest of this framework.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from toyslam_tpu.core import se3

GRAVITY = 9.81


class DeadReckonParams(NamedTuple):
    gravity_magnitude: float = GRAVITY
    velocity_filter_alpha: float = 0.1  # (:289-291)
    zupt_accel_threshold: float = 0.05  # (:295)
    zupt_count_threshold: int = 50  # ~0.5 s at 100 Hz (:299)
    zupt_decay: float = 0.8  # (:301)
    zupt_stop_speed: float = 0.01  # (:302)


def calibrate_stationary(acc_samples, gyro_samples,
                         params: DeadReckonParams = DeadReckonParams()):
    """Stationary calibration (``performInitialCalibration``, ``:201-254``).

    Returns (gyro_bias [3], accel_bias [3], q0 [4] world<-body).
    """
    gyro_bias = jnp.mean(gyro_samples, axis=0)
    gravity_vec = jnp.mean(acc_samples, axis=0)
    g_mag = jnp.linalg.norm(gravity_vec)
    g_dir = gravity_vec / jnp.maximum(g_mag, 1e-9)
    accel_bias = gravity_vec - g_dir * params.gravity_magnitude

    # Initial orientation: rotate measured gravity direction onto world +z
    # (a static accelerometer measures +g along body-up). The reference
    # aligns against -z with its sign convention (:227-237); ours aligns
    # body-up to world-up.
    z_axis = jnp.array([0.0, 0.0, 1.0], acc_samples.dtype)
    axis = jnp.cross(g_dir, z_axis)
    axis_n = jnp.linalg.norm(axis)
    angle = jnp.arccos(jnp.clip(jnp.dot(g_dir, z_axis), -1.0, 1.0))
    small = axis_n < 1e-6
    q0 = jnp.where(
        small,
        se3.quat_identity(acc_samples.dtype),
        se3.quat_from_axis_angle(axis / jnp.maximum(axis_n, 1e-9), angle),
    )
    # q0 rotates the body gravity direction onto world up — that is exactly
    # the world<-body attitude (up vectors coincide; yaw unobservable).
    return gyro_bias, accel_bias, q0


class DeadReckonState(NamedTuple):
    p: jax.Array
    v: jax.Array
    q: jax.Array
    zupt_count: jax.Array


def dead_reckon(acc, gyro, dt, gyro_bias, accel_bias, q0,
                params: DeadReckonParams = DeadReckonParams()):
    """Integrate an IMU stream; returns stacked (p, v, q) over time."""
    dtype = acc.dtype
    g_up = jnp.array([0.0, 0.0, params.gravity_magnitude], dtype)

    def step(s: DeadReckonState, inp):
        a, w, h = inp
        w_u = w - gyro_bias
        a_u = a - accel_bias

        # Orientation (first-order quaternion integration, :256-273)
        angle = jnp.linalg.norm(w_u) * h
        small = angle < 1e-10
        axis = w_u / jnp.maximum(jnp.linalg.norm(w_u), 1e-12)
        dq = jnp.where(small, se3.quat_identity(dtype),
                       se3.quat_from_axis_angle(axis, angle))
        q = se3.quat_normalize(se3.quat_multiply(s.q, dq))

        # Acceleration integration with gravity removal (:274-314)
        a_world = se3.quat_rotate(q, a_u) - g_up
        v_prev = s.v
        v = s.v + a_world * h
        alpha = params.velocity_filter_alpha
        v = v * (1.0 - alpha) + v_prev * alpha

        # ZUPT
        quasi_static = jnp.linalg.norm(a_world) < params.zupt_accel_threshold
        cnt = jnp.where(quasi_static, s.zupt_count + 1, 0)
        damped = jnp.where(cnt > params.zupt_count_threshold,
                           v * params.zupt_decay, v)
        stopped = jnp.linalg.norm(damped) < params.zupt_stop_speed
        v = jnp.where((cnt > params.zupt_count_threshold) & stopped,
                      jnp.zeros_like(v), damped)

        p = s.p + v * h
        new = DeadReckonState(p=p, v=v, q=q, zupt_count=cnt)
        return new, (p, v, q)

    s0 = DeadReckonState(
        p=jnp.zeros(3, dtype), v=jnp.zeros(3, dtype), q=q0.astype(dtype),
        zupt_count=jnp.zeros((), jnp.int32),
    )
    _, (ps, vs, qs) = jax.lax.scan(step, s0, (acc, gyro, dt))
    return ps, vs, qs
