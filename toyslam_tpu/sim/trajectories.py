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


def circuit(t, length=40.0, width=14.0, speed=2.0, z=1.0):
    """Closed rounded-rectangle street circuit at constant speed
    (``generateCircuitTrajectory``/``updateCircuitMotion``,
    ``RangingRC.cpp:1014-1131``): straight segments of the road loop joined
    by quarter-circle corners of radius width/2, traversed counterclockwise
    by arc length. Returns the same field set as ``circle``.
    """
    dtype = t.dtype
    r = width / 2.0
    Lx = jnp.maximum(length - width, 1e-3)  # straight-segment length
    per = 2.0 * Lx + 2.0 * jnp.pi * r
    s = jnp.mod(speed * t, per)

    # Segment boundaries along the loop: bottom straight, right half-turn,
    # top straight, left half-turn (a stadium/discorectangle — the
    # reference's rounded rectangle with corner radius = half width).
    s1 = Lx            # end of bottom straight
    s2 = s1 + jnp.pi * r  # end of right 180-deg turn
    s3 = s2 + Lx       # end of top straight

    def seg_bottom(s):
        return (jnp.stack([s - Lx / 2.0, jnp.full_like(s, -r)], -1),
                jnp.zeros_like(s))

    def seg_right(s):
        a = (s - s1) / r - jnp.pi / 2.0
        return (jnp.stack([Lx / 2.0 + r * jnp.cos(a), r * jnp.sin(a)], -1),
                a + jnp.pi / 2.0)

    def seg_top(s):
        return (jnp.stack([Lx / 2.0 - (s - s2), jnp.full_like(s, r)], -1),
                jnp.full_like(s, jnp.pi))

    def seg_left(s):
        a = (s - s3) / r + jnp.pi / 2.0
        return (jnp.stack([-Lx / 2.0 + r * jnp.cos(a), r * jnp.sin(a)], -1),
                a + jnp.pi / 2.0)

    xy_b, yaw_b = seg_bottom(s)
    xy_r, yaw_r = seg_right(s)
    xy_t, yaw_t = seg_top(s)
    xy_l, yaw_l = seg_left(s)
    in_b = (s < s1)[..., None]
    in_r = ((s >= s1) & (s < s2))[..., None]
    in_t = ((s >= s2) & (s < s3))[..., None]
    xy = jnp.where(in_b, xy_b,
                   jnp.where(in_r, xy_r, jnp.where(in_t, xy_t, xy_l)))
    yaw = jnp.where(in_b[..., 0], yaw_b,
                    jnp.where(in_r[..., 0], yaw_r,
                              jnp.where(in_t[..., 0], yaw_t, yaw_l)))
    pos = jnp.concatenate([xy, jnp.full(xy.shape[:-1] + (1,), z, dtype)], -1)
    vel = jnp.stack([speed * jnp.cos(yaw), speed * jnp.sin(yaw),
                     jnp.zeros_like(yaw)], -1)
    # Centripetal acceleration on the turns (d/dt of vel: a = v psi_dot
    # (-sin psi, cos psi)), zero on straights
    on_turn = ~(in_b[..., 0] | in_t[..., 0])
    yaw_rate = jnp.where(on_turn, speed / r, 0.0)
    a_mag = speed * yaw_rate
    acc = jnp.stack([-a_mag * jnp.sin(yaw), a_mag * jnp.cos(yaw),
                     jnp.zeros_like(yaw)], -1)
    zero = jnp.zeros_like(yaw)
    quat = se3.quat_from_axis_angle(
        jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], dtype),
                         yaw.shape + (3,)), yaw)
    return {"pos": pos, "vel": vel, "acc": acc, "yaw": yaw, "quat": quat,
            "gyro": jnp.stack([zero, zero, yaw_rate], -1)}


def line(t, speed=0.5, direction=(1.0, 0.0, 0.0), z=1.0):
    d = jnp.asarray(direction, t.dtype)
    d = d / jnp.linalg.norm(d)
    pos = t[..., None] * speed * d
    pos = pos.at[..., 2].add(z)
    vel = jnp.broadcast_to(speed * d, pos.shape)
    return {"pos": pos, "vel": vel}
