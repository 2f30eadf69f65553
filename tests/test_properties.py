"""Property-based tests (hypothesis) for the L0 math layer.

The golden/differential suites pin specific values; these pin the
*algebraic laws* the estimators lean on — round-trips, group axioms,
frame orthonormality — over randomized inputs, including the awkward
corners (near-zero angles, gimbal lock, poles) hypothesis likes to find.
All in f64 on CPU, matching the oracle configuration.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

import jax.numpy as jnp

from toyslam_tpu.core import geodesy, se3

_ANG = st.floats(-np.pi, np.pi, allow_nan=False, width=64)
_SMALL = st.floats(-1e-4, 1e-4, allow_nan=False, width=64)
_V = st.floats(-50.0, 50.0, allow_nan=False, width=64)

settings.register_profile("fast", max_examples=50, deadline=None)
settings.load_profile("fast")


def _f64(*xs):
    return [jnp.asarray(x, jnp.float64) for x in xs]


@given(st.tuples(_ANG, _ANG, _ANG))
def test_so3_exp_log_roundtrip(w):
    (w,) = _f64(w)
    R = se3.so3_exp(w)
    # R is a rotation: orthonormal, det +1.
    np.testing.assert_allclose(np.asarray(R @ R.T), np.eye(3), atol=1e-12)
    assert abs(float(jnp.linalg.det(R)) - 1.0) < 1e-12
    # log o exp = identity on the |w| < pi ball.
    if float(jnp.linalg.norm(w)) < np.pi - 1e-3:
        np.testing.assert_allclose(np.asarray(se3.so3_log(R)),
                                   np.asarray(w), atol=1e-9)


@given(st.tuples(_SMALL, _SMALL, _SMALL))
def test_so3_exp_small_angle_branch(w):
    """The Taylor branch must agree with the generic formula's limit."""
    (w,) = _f64(w)
    R = se3.so3_exp(w)
    np.testing.assert_allclose(
        np.asarray(R), np.eye(3) + np.asarray(se3.skew(w)), atol=1e-8)


@given(st.tuples(_ANG, _ANG, _ANG),
       st.tuples(st.floats(0.1, 0.9), _ANG, _ANG))
def test_euler_chart_roundtrip(rpy, rpy2):
    """rot_to_euler_xyz o euler_xyz_to_rot = id away from the pitch
    singularity (the chart matches Eigen's eulerAngles(0,1,2) branch, so
    only the recovered ROTATION need match at gimbal lock)."""
    (rpy,) = _f64(rpy)
    R = se3.euler_xyz_to_rot(rpy)
    rpy_back = se3.rot_to_euler_xyz(R)
    R_back = se3.euler_xyz_to_rot(rpy_back)
    np.testing.assert_allclose(np.asarray(R_back), np.asarray(R), atol=1e-9)


@given(st.tuples(_ANG, _ANG, _ANG), st.tuples(_V, _V, _V),
       st.lists(st.tuples(_V, _V, _V), min_size=1, max_size=4))
def test_transform_inverse_is_inverse(w, t, pts):
    w, t, pts = _f64(w, t, pts)
    T = se3.make_transform(se3.so3_exp(w), t)
    Ti = se3.transform_inverse(T)
    np.testing.assert_allclose(np.asarray(T @ Ti), np.eye(4), atol=1e-10)
    back = se3.transform_points(Ti, se3.transform_points(T, pts))
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-9)


@given(st.tuples(_ANG, _ANG, _ANG), st.tuples(_ANG, _ANG, _ANG),
       st.tuples(_V, _V, _V))
def test_quat_group_action(w1, w2, v):
    """quat_multiply represents composition: (q1*q2) acts as R1 R2."""
    w1, w2, v = _f64(w1, w2, v)
    q1 = se3.rot_to_quat(se3.so3_exp(w1))
    q2 = se3.rot_to_quat(se3.so3_exp(w2))
    lhs = se3.quat_rotate(se3.quat_multiply(q1, q2), v)
    rhs = se3.quat_rotate(q1, se3.quat_rotate(q2, v))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-9)
    # conjugate is the inverse action
    back = se3.quat_rotate(se3.quat_conjugate(q1), se3.quat_rotate(q1, v))
    np.testing.assert_allclose(np.asarray(back), np.asarray(v), atol=1e-9)


@given(st.tuples(_ANG, _ANG, _ANG))
def test_quat_rot_roundtrip(w):
    (w,) = _f64(w)
    R = se3.so3_exp(w)
    q = se3.rot_to_quat(R)
    assert abs(float(jnp.linalg.norm(q)) - 1.0) < 1e-12
    np.testing.assert_allclose(np.asarray(se3.quat_to_rot(q)),
                               np.asarray(R), atol=1e-12)


@given(st.floats(-4 * np.pi, 4 * np.pi, allow_nan=False, width=64))
def test_angle_mod_idempotent_and_ranged(x):
    (x,) = _f64(x)
    m = se3.angle_mod(x)
    assert -np.pi <= float(m) <= np.pi
    np.testing.assert_allclose(float(se3.angle_mod(m)), float(m), atol=1e-12)
    # congruence mod 2pi
    np.testing.assert_allclose(np.sin(float(m)), np.sin(float(x)), atol=1e-9)
    m2 = se3.angle_mod(x, zero_2_2pi=True)
    assert 0.0 <= float(m2) < 2 * np.pi  # half-open: mod(-eps) rounds to 2pi


@given(st.floats(-85.0, 85.0), st.floats(-179.9, 179.9),
       st.floats(-100.0, 8000.0))
def test_lla_ecef_roundtrip(lat_deg, lon_deg, alt):
    lat, lon, alt = _f64(np.deg2rad(lat_deg), np.deg2rad(lon_deg), alt)
    ecef = geodesy.lla_to_ecef(lat, lon, alt)
    lla = geodesy.ecef_to_lla(ecef)
    np.testing.assert_allclose(float(lla[0]), float(lat), atol=1e-9)
    np.testing.assert_allclose(float(lla[1]), float(lon), atol=1e-9)
    np.testing.assert_allclose(float(lla[2]), float(alt), atol=1e-3)


@given(st.floats(-85.0, 85.0), st.floats(-179.9, 179.9),
       st.tuples(_V, _V, _V))
def test_enu_frame_orthonormal_roundtrip(lat_deg, lon_deg, enu):
    lat, lon, enu = _f64(np.deg2rad(lat_deg), np.deg2rad(lon_deg), enu)
    R = geodesy.ecef_to_enu_rotation(lat, lon)
    np.testing.assert_allclose(np.asarray(R @ R.T), np.eye(3), atol=1e-12)
    ref = geodesy.lla_to_ecef(lat, lon, jnp.float64(30.0))
    p = geodesy.enu_to_ecef(enu, ref)
    back = geodesy.ecef_to_enu(p, ref)
    np.testing.assert_allclose(np.asarray(back), np.asarray(enu), atol=1e-6)


@given(st.integers(0, 3000), st.floats(0.0, 604799.0))
def test_gps_unix_time_roundtrip(week, tow):
    t = geodesy.gps_to_unix_time(jnp.float64(week), jnp.float64(tow))
    w2, tow2 = geodesy.unix_to_gps_time(t)
    assert int(w2) == week
    np.testing.assert_allclose(float(tow2), tow, atol=1e-5)
