"""SE(3), SO(3), Euler-chart and quaternion primitives.

Math layer L0 of the framework. Conventions follow the reference stack so that
estimates are directly comparable:

- NDT's 6-vector pose chart is ``p = [tx ty tz roll pitch yaw]`` with rotation
  ``R = Rx(roll) @ Ry(pitch) @ Rz(yaw)`` (reference: ``convertTransform``,
  ``ndt_omp/include/pclomp/ndt_omp.h:215-234`` and the AngleAxis product in
  ``ndt_omp_impl.hpp:146-149``).
- ``matrix_to_euler_xyz`` reproduces Eigen's ``eulerAngles(0, 1, 2)`` branch
  behaviour (first angle in ``[0, pi]``) because the reference seeds the NDT
  state from it (``ndt_omp_impl.hpp:108-111``).
- Quaternions are Hamilton ``[w x y z]``; boxplus matches
  ``PoseParameterization::Plus`` (``uwb_imu_batch_node.cpp:32-68``).

Everything is dtype-polymorphic, shape-static and jit/vmap friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# All small matmuls in the geometry layer must run at full f32 precision:
# TPU MXU default would truncate inputs to bf16 (~1e-3 error), which is
# fatal for registration. HIGHEST costs 3 bf16 passes -- negligible here.
HIGHEST = jax.lax.Precision.HIGHEST


def mm(a, b):
    """Full-precision matmul for geometry math."""
    return jnp.matmul(a, b, precision=HIGHEST)

# --------------------------------------------------------------------------
# SO(3)
# --------------------------------------------------------------------------


def rot_x(a):
    c, s = jnp.cos(a), jnp.sin(a)
    z, o = jnp.zeros_like(a), jnp.ones_like(a)
    return jnp.stack(
        [jnp.stack([o, z, z], -1), jnp.stack([z, c, -s], -1), jnp.stack([z, s, c], -1)],
        -2,
    )


def rot_y(a):
    c, s = jnp.cos(a), jnp.sin(a)
    z, o = jnp.zeros_like(a), jnp.ones_like(a)
    return jnp.stack(
        [jnp.stack([c, z, s], -1), jnp.stack([z, o, z], -1), jnp.stack([-s, z, c], -1)],
        -2,
    )


def rot_z(a):
    c, s = jnp.cos(a), jnp.sin(a)
    z, o = jnp.zeros_like(a), jnp.ones_like(a)
    return jnp.stack(
        [jnp.stack([c, -s, z], -1), jnp.stack([s, c, z], -1), jnp.stack([z, z, o], -1)],
        -2,
    )


def euler_xyz_to_rot(rpy):
    """R = Rx(roll) @ Ry(pitch) @ Rz(yaw); rpy: [..., 3].

    Written in closed form (elementwise) rather than as matrix products: on
    TPU a 3x3 matmul chain would route through the MXU at bf16 input
    precision and lose ~1e-3 accuracy, which is fatal for registration.
    """
    cx, sx = jnp.cos(rpy[..., 0]), jnp.sin(rpy[..., 0])
    cy, sy = jnp.cos(rpy[..., 1]), jnp.sin(rpy[..., 1])
    cz, sz = jnp.cos(rpy[..., 2]), jnp.sin(rpy[..., 2])
    r00 = cy * cz
    r01 = -cy * sz
    r02 = sy
    r10 = cx * sz + sx * sy * cz
    r11 = cx * cz - sx * sy * sz
    r12 = -sx * cy
    r20 = sx * sz - cx * sy * cz
    r21 = sx * cz + cx * sy * sz
    r22 = cx * cy
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], -1),
            jnp.stack([r10, r11, r12], -1),
            jnp.stack([r20, r21, r22], -1),
        ],
        -2,
    )


def rot_to_euler_xyz(R):
    """Inverse of :func:`euler_xyz_to_rot` using Eigen's eulerAngles(0,1,2) branch.

    Returns angles with roll in [0, pi], matching Eigen so NDT initial-guess
    decomposition agrees with the reference bit-for-bit in exact arithmetic.
    """
    r0 = jnp.arctan2(R[..., 1, 2], R[..., 2, 2])
    c2 = jnp.sqrt(R[..., 0, 0] ** 2 + R[..., 0, 1] ** 2)
    flip = r0 > 0  # "!odd && res[0] > 0" branch of Eigen
    r0_f = jnp.where(r0 > 0, r0 - jnp.pi, r0 + jnp.pi)
    r1_f = jnp.arctan2(-R[..., 0, 2], -c2)
    r1 = jnp.arctan2(-R[..., 0, 2], c2)
    a0 = jnp.where(flip, r0_f, r0)
    a1 = jnp.where(flip, r1_f, r1)
    s1, c1 = jnp.sin(a0), jnp.cos(a0)
    a2 = jnp.arctan2(
        s1 * R[..., 2, 0] - c1 * R[..., 1, 0],
        c1 * R[..., 1, 1] - s1 * R[..., 2, 1],
    )
    return -jnp.stack([a0, a1, a2], axis=-1)


def skew(v):
    """Skew-symmetric matrix [v]x; v: [..., 3] -> [..., 3, 3]."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zz = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zz, -z, y], -1),
            jnp.stack([z, zz, -x], -1),
            jnp.stack([-y, x, zz], -1),
        ],
        -2,
    )


def so3_exp(w):
    """Rodrigues exponential map; w: [..., 3] -> [..., 3, 3]."""
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)
    theta = theta[..., None]
    small = theta < 1e-7
    K = skew(w)
    K2 = mm(K, K)
    safe = jnp.where(small, jnp.ones_like(theta), theta)
    A = jnp.where(small, 1.0 - theta**2 / 6.0, jnp.sin(safe) / safe)
    B = jnp.where(small, 0.5 - theta**2 / 24.0, (1.0 - jnp.cos(safe)) / safe**2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + A * K + B * K2


def so3_log(R):
    """Log map; R: [..., 3, 3] -> [..., 3]."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        -1,
    )
    sin_t = jnp.sin(theta)
    small = jnp.abs(sin_t) < 1e-7
    scale = jnp.where(
        small, 0.5 + theta**2 / 12.0, theta / jnp.where(small, 1.0, 2.0 * sin_t)
    )
    return w * scale[..., None]


# --------------------------------------------------------------------------
# SE(3) as 4x4 homogeneous matrices
# --------------------------------------------------------------------------


def make_transform(R, t):
    """Assemble [..., 4, 4] from [..., 3, 3] rotation and [..., 3] translation."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.zeros(batch + (1, 4), dtype=R.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def pose6_to_matrix(p):
    """NDT chart: p=[t(3), roll, pitch, yaw] -> 4x4 (T = Trans * Rx * Ry * Rz)."""
    return make_transform(euler_xyz_to_rot(p[..., 3:6]), p[..., 0:3])


def matrix_to_pose6(T):
    """Inverse of :func:`pose6_to_matrix` (Eigen eulerAngles(0,1,2) branch)."""
    return jnp.concatenate([T[..., :3, 3], rot_to_euler_xyz(T[..., :3, :3])], axis=-1)


def transform_inverse(T):
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_transform(Rt, -mm(Rt, t[..., None])[..., 0])


def transform_points(T, pts):
    """Apply [..., 4, 4] to points [..., N, 3] (or [N, 4] homogeneous-padded)."""
    xyz = pts[..., :3]
    out = mm(xyz, jnp.swapaxes(T[..., :3, :3], -1, -2)) + T[..., None, :3, 3]
    if pts.shape[-1] == 4:
        out = jnp.concatenate([out, pts[..., 3:4]], axis=-1)
    return out


# --------------------------------------------------------------------------
# Quaternions: Hamilton convention, [w, x, y, z]
# --------------------------------------------------------------------------


def quat_identity(dtype=jnp.float32):
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_multiply(q, r):
    w1, x1, y1, z1 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    w2, x2, y2, z2 = r[..., 0], r[..., 1], r[..., 2], r[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        -1,
    )


def quat_conjugate(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_rot(q):
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = w * w + x * x + y * y + z * z
    s = 2.0 / n
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return jnp.stack(
        [
            jnp.stack([1.0 - (yy + zz), xy - wz, xz + wy], -1),
            jnp.stack([xy + wz, 1.0 - (xx + zz), yz - wx], -1),
            jnp.stack([xz - wy, yz + wx, 1.0 - (xx + yy)], -1),
        ],
        -2,
    )


def rot_to_quat(R):
    """Shepperd's method, branch-free (all four candidates, pick by max trace)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    qw = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22,
                    1.0 - m00 - m11 + m22], -1)
    qw = jnp.sqrt(jnp.maximum(qw, 1e-30)) * 0.5
    w0, x1, y2, z3 = qw[..., 0], qw[..., 1], qw[..., 2], qw[..., 3]
    cand = jnp.stack(
        [
            jnp.stack([w0, (m21 - m12) / (4 * w0), (m02 - m20) / (4 * w0),
                       (m10 - m01) / (4 * w0)], -1),
            jnp.stack([(m21 - m12) / (4 * x1), x1, (m01 + m10) / (4 * x1),
                       (m02 + m20) / (4 * x1)], -1),
            jnp.stack([(m02 - m20) / (4 * y2), (m01 + m10) / (4 * y2), y2,
                       (m12 + m21) / (4 * y2)], -1),
            jnp.stack([(m10 - m01) / (4 * z3), (m02 + m20) / (4 * z3),
                       (m12 + m21) / (4 * z3), z3], -1),
        ],
        -2,
    )
    idx = jnp.argmax(qw, axis=-1)
    q = jnp.take_along_axis(cand, idx[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    return quat_normalize(q)


def quat_boxplus(q, dtheta):
    """q ⊞ dtheta with the small-angle right-multiplied delta quaternion.

    Matches ``deltaQ``/``PoseParameterization::Plus`` in the reference
    (``uwb_imu_batch_node.cpp:32-68,1319-1335``): dq = [1, dtheta/2], q' = q*dq.
    """
    half = 0.5 * dtheta
    dq = jnp.concatenate([jnp.ones_like(half[..., :1]), half], axis=-1)
    return quat_normalize(quat_multiply(q, dq))


def quat_rotate(q, v):
    """Rotate vectors [..., 3] by quaternions [..., 4]."""
    return mm(quat_to_rot(q), v[..., None])[..., 0]


def quat_from_axis_angle(axis, angle):
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    half = 0.5 * angle
    return jnp.concatenate(
        [jnp.cos(half)[..., None], jnp.sin(half)[..., None] * axis], axis=-1
    )


def quat_slerp(q0, q1, t):
    d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(d < 0, -q1, q1)
    d = jnp.abs(d)
    theta = jnp.arccos(jnp.clip(d, -1.0, 1.0))
    sin_t = jnp.sin(theta)
    small = sin_t < 1e-6
    w0 = jnp.where(small, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(small, 1.0, sin_t))
    w1 = jnp.where(small, t, jnp.sin(t * theta) / jnp.where(small, 1.0, sin_t))
    return quat_normalize(w0 * q0 + w1 * q1)


# 2D helpers (parity with ICP/utils/angle.py: rot_mat_2d, angle_mod)


def rot_mat_2d(angle):
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.stack([jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2)


def angle_mod(x, zero_2_2pi=False, degree=False):
    if degree:
        x = jnp.deg2rad(x)
    if zero_2_2pi:
        # Two float edges break the [0, 2pi) contract (found by
        # hypothesis + review, tests/test_properties.py): mod passes
        # denormal negative x through unchanged (x/2pi rounds to -0, and
        # comparisons flush denormals so a where(y < 0) can't see it —
        # maximum canonicalizes), and mod(-eps, 2pi) = 2pi - eps rounds
        # to exactly 2pi for tiny eps (wrap back to 0).
        y = jnp.maximum(jnp.mod(x, 2.0 * jnp.pi), 0.0)
        y = jnp.where(y >= 2.0 * jnp.pi, 0.0, y)
    else:
        y = jnp.mod(x + jnp.pi, 2.0 * jnp.pi) - jnp.pi
    if degree:
        y = jnp.rad2deg(y)
    return y


def svd_solve(A, b, rcond_factor=None):
    """Least-squares solve via SVD with Eigen::JacobiSVD-style thresholding.

    Reference Newton step solves ``H dp = -g`` with JacobiSVD
    (``ndt_omp_impl.hpp:127-129``); Eigen treats singular values below
    ``eps * max_sv * max(rows, cols)``-ish as zero. We use jnp.linalg with a
    comparable default rcond.
    """
    u, s, vt = jnp.linalg.svd(A, full_matrices=False)
    if rcond_factor is None:
        rcond_factor = jnp.finfo(A.dtype).eps * A.shape[-1]
    cutoff = rcond_factor * jnp.max(s, axis=-1, keepdims=True)
    s_inv = jnp.where(s > cutoff, 1.0 / jnp.where(s > cutoff, s, 1.0), 0.0)
    return jnp.einsum(
        "...ji,...j->...i", vt,
        s_inv * jnp.einsum("...ij,...i->...j", u, b, precision=HIGHEST),
        precision=HIGHEST,
    )
