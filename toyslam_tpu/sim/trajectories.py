"""Ground-truth trajectory generators.

Capability port of the reference's trajectory code: circular motion with
tangent heading (``uwb_imu_sim_node.cpp:107-199``), circle/helix/line modes
(``uwb_node.cpp:158-189``), figure-8 (``user_teleop.cpp:33-76``,
``RangingRC.cpp:996-1131``). All return dense time-sampled arrays suitable
for feeding simulators and computing errors against estimates.
"""

from __future__ import annotations

import jax.numpy as jnp

from toyslam_tpu.core import se3


def circle(t, radius=3.0, omega=0.1, z=1.0):
    """Circular motion with tangent yaw (``uwb_imu_sim_node.cpp:116-137,203``).

    Returns dict with position, velocity, acceleration [T, 3], yaw [T],
    quaternion [T, 4].
    """
    theta = omega * t
    pos = jnp.stack(
        [radius * jnp.cos(theta), radius * jnp.sin(theta),
         jnp.full_like(theta, z)], -1
    )
    vel = jnp.stack(
        [-radius * omega * jnp.sin(theta), radius * omega * jnp.cos(theta),
         jnp.zeros_like(theta)], -1
    )
    acc = jnp.stack(
        [-radius * omega**2 * jnp.cos(theta),
         -radius * omega**2 * jnp.sin(theta), jnp.zeros_like(theta)], -1
    )
    yaw = theta + jnp.pi / 2  # tangent to circle
    zero = jnp.zeros_like(yaw)
    quat = se3.quat_from_axis_angle(
        jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], t.dtype), yaw.shape + (3,)),
        yaw,
    )
    return {"pos": pos, "vel": vel, "acc": acc, "yaw": yaw, "quat": quat,
            "gyro": jnp.stack([zero, zero, jnp.full_like(yaw, omega)], -1)}


def helix(t, radius=3.0, omega=0.1, z0=1.0, climb_rate=0.05):
    out = circle(t, radius, omega, 0.0)
    z = z0 + climb_rate * t
    out["pos"] = out["pos"].at[..., 2].set(z)
    out["vel"] = out["vel"].at[..., 2].set(climb_rate)
    return out


def figure8(t, scale=10.0, omega=0.1, z=1.0):
    """Lemniscate (figure-8) path (``user_teleop.cpp:33-76``) with the full
    IMU-compatible field set (analytic acceleration, tangent-yaw attitude
    and the matching body yaw rate), so the IMU simulator can drive it like
    the reference's teleop + sim node pair."""
    a = omega * t
    pos = jnp.stack(
        [scale * jnp.sin(a), scale * jnp.sin(a) * jnp.cos(a),
         jnp.full_like(a, z)], -1
    )
    # y = (scale/2) sin(2a): use the double-angle form for derivatives
    vel = jnp.stack(
        [scale * omega * jnp.cos(a),
         scale * omega * jnp.cos(2.0 * a),
         jnp.zeros_like(a)], -1
    )
    acc = jnp.stack(
        [-scale * omega**2 * jnp.sin(a),
         -2.0 * scale * omega**2 * jnp.sin(2.0 * a),
         jnp.zeros_like(a)], -1
    )
    yaw = jnp.arctan2(vel[..., 1], vel[..., 0])
    # yaw_dot = (vx ay - vy ax) / (vx^2 + vy^2)
    sp2 = vel[..., 0] ** 2 + vel[..., 1] ** 2
    yaw_rate = (vel[..., 0] * acc[..., 1] - vel[..., 1] * acc[..., 0]) / (
        jnp.maximum(sp2, 1e-12))
    zero = jnp.zeros_like(yaw)
    quat = se3.quat_from_axis_angle(
        jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], t.dtype),
                         yaw.shape + (3,)),
        yaw,
    )
    return {"pos": pos, "vel": vel, "acc": acc, "yaw": yaw, "quat": quat,
            "gyro": jnp.stack([zero, zero, yaw_rate], -1)}


def line(t, speed=0.5, direction=(1.0, 0.0, 0.0), z=1.0):
    d = jnp.asarray(direction, t.dtype)
    d = d / jnp.linalg.norm(d)
    pos = t[..., None] * speed * d
    pos = pos.at[..., 2].add(z)
    vel = jnp.broadcast_to(speed * d, pos.shape)
    return {"pos": pos, "vel": vel}
