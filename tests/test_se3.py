import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from toyslam_tpu.core import se3


def test_euler_xyz_roundtrip(rng):
    rpy = rng.uniform(-np.pi, np.pi, size=(64, 3)).astype(np.float64)
    R = se3.euler_xyz_to_rot(jnp.asarray(rpy))
    # Rotation matrices must match scipy's extrinsic-xyz... R = Rx@Ry@Rz is
    # intrinsic XYZ applied right-to-left; scipy "XYZ" intrinsic matches.
    R_scipy = Rotation.from_euler("XYZ", rpy).as_matrix()
    np.testing.assert_allclose(np.asarray(R), R_scipy, atol=1e-6)

    # Round-trip through the Eigen-convention extraction must reproduce R.
    rpy_back = se3.rot_to_euler_xyz(R)
    R2 = se3.euler_xyz_to_rot(rpy_back)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)
    # Eigen branch: first angle in [0, pi]
    assert np.all(np.asarray(rpy_back)[:, 0] >= -1e-7)
    assert np.all(np.asarray(rpy_back)[:, 0] <= np.pi + 1e-7)


def test_pose6_matrix_roundtrip(rng):
    p = rng.uniform(-1, 1, size=(16, 6))
    p[:, 3] = np.abs(p[:, 3])  # keep roll in [0, pi] so chart is unique
    T = se3.pose6_to_matrix(jnp.asarray(p))
    p_back = se3.matrix_to_pose6(T)
    np.testing.assert_allclose(np.asarray(p_back), p, atol=1e-6)


def test_transform_inverse_and_apply(rng):
    p = rng.uniform(-1, 1, size=(6,))
    T = se3.pose6_to_matrix(jnp.asarray(p))
    Ti = se3.transform_inverse(T)
    np.testing.assert_allclose(np.asarray(T @ Ti), np.eye(4), atol=1e-6)

    pts = rng.uniform(-5, 5, size=(100, 3))
    out = se3.transform_points(T, jnp.asarray(pts))
    expected = pts @ np.asarray(T)[:3, :3].T + np.asarray(T)[:3, 3]
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_quaternion_ops(rng):
    q = rng.normal(size=(32, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    R = se3.quat_to_rot(jnp.asarray(q))
    R_scipy = Rotation.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    np.testing.assert_allclose(np.asarray(R), R_scipy, atol=1e-6)

    q_back = np.asarray(se3.rot_to_quat(jnp.asarray(R_scipy)))
    sign = np.sign(np.sum(q_back * q, axis=1, keepdims=True))
    np.testing.assert_allclose(q_back * sign, q, atol=1e-6)

    # multiply consistency: R(q1 q2) == R(q1) R(q2)
    q2 = rng.normal(size=(32, 4))
    q2 /= np.linalg.norm(q2, axis=1, keepdims=True)
    q12 = se3.quat_multiply(jnp.asarray(q), jnp.asarray(q2))
    np.testing.assert_allclose(
        np.asarray(se3.quat_to_rot(q12)),
        np.asarray(R) @ np.asarray(se3.quat_to_rot(jnp.asarray(q2))),
        atol=1e-5,
    )


def test_so3_exp_log(rng):
    w = rng.normal(size=(32, 3))
    # keep |w| < pi so log returns the same (principal) rotation vector
    w = w / np.linalg.norm(w, axis=1, keepdims=True) * rng.uniform(1e-4, 2.8, (32, 1))
    R = se3.so3_exp(jnp.asarray(w))
    np.testing.assert_allclose(
        np.asarray(R), Rotation.from_rotvec(w).as_matrix(), atol=1e-6
    )
    w_back = se3.so3_log(R)
    np.testing.assert_allclose(np.asarray(w_back), w, atol=1e-5)


def test_quat_boxplus_small_angle(rng):
    q = se3.quat_identity(jnp.float64)
    dtheta = jnp.asarray([1e-3, -2e-3, 0.5e-3], jnp.float64)
    q2 = se3.quat_boxplus(q, dtheta)
    R2 = se3.quat_to_rot(q2)
    np.testing.assert_allclose(
        np.asarray(R2), Rotation.from_rotvec(np.array(dtheta)).as_matrix(), atol=1e-6
    )


def test_svd_solve(rng):
    A = rng.normal(size=(6, 6))
    A = A @ A.T + np.eye(6)
    b = rng.normal(size=(6,))
    x = se3.svd_solve(jnp.asarray(A), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b), rtol=1e-4)
