"""IMU preintegration (midpoint rule) with covariance and bias Jacobians.

Capability port of the reference's keyframe preintegrator
(``uwb_imu_batch_node.cpp:3814-3974``): midpoint integration of delta
position/velocity/orientation between keyframes, 9x9 covariance propagation
through F/G, 9x6 bias Jacobian accumulation, optional gravity compensation in
the sensor frame (the reference removes gravity inside preintegration using
the start-keyframe orientation, ``:3905-3915``), and the per-sample dt
validity gates (``:3820-3824``).

TPU design: one ``lax.scan`` over a fixed-capacity padded IMU chunk; invalid
(padded or out-of-range-dt) samples are masked no-ops, so arbitrary keyframe
intervals compile to one static program. The state is the reference's
"chunked sequence" compression: hundreds of samples become one 9-dim
pseudo-measurement.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from toyslam_tpu.core import se3

_HP = jax.lax.Precision.HIGHEST


class PreintegrationParams(NamedTuple):
    """Noise defaults mirror the batch node params (``:1343-1439`` region)."""

    acc_noise: float = 0.05
    gyro_noise: float = 0.01
    acc_bias_noise: float = 0.001
    gyro_bias_noise: float = 0.0001
    min_integration_dt: float = 1e-6  # skip gate (``:3820``)
    max_imu_dt: float = 0.5  # skip gate (``:3820``)


class Preintegrated(NamedTuple):
    delta_p: jax.Array  # [3]
    delta_v: jax.Array  # [3]
    delta_q: jax.Array  # [4] (Hamilton wxyz)
    covariance: jax.Array  # [9, 9] over (p, v, theta)
    jacobian_bias: jax.Array  # [9, 6] d(p,v,theta)/d(ba,bg)
    sum_dt: jax.Array  # scalar


def _identity_state(dtype):
    return Preintegrated(
        delta_p=jnp.zeros(3, dtype),
        delta_v=jnp.zeros(3, dtype),
        delta_q=se3.quat_identity(dtype),
        covariance=jnp.zeros((9, 9), dtype),
        jacobian_bias=jnp.zeros((9, 6), dtype),
        sum_dt=jnp.zeros((), dtype),
    )


def preintegrate(acc, gyro, dt, acc_bias, gyro_bias,
                 gravity_sensor=None,
                 params: PreintegrationParams = PreintegrationParams(),
                 valid=None) -> Preintegrated:
    """Integrate a padded IMU chunk into one relative-motion factor.

    acc/gyro: [T, 3] consecutive samples; dt: [T] step to the *next* sample
    (the reference interpolates between sample i and i+1 — pass acc[i],
    acc[i+1] pairs by shifting; here we use consecutive-pair midpoints).
    gravity_sensor: [3] gravity expressed in the start frame (the reference's
    ``current_orientation.inverse() * gravity_world``), or None to skip
    gravity compensation (classical preintegration).
    """
    dtype = acc.dtype
    T = acc.shape[0]
    if valid is None:
        valid = jnp.ones((T,), bool)

    acc1 = acc - acc_bias
    gyro1 = gyro - gyro_bias
    # Next-sample values for midpoint interpolation (clamp at the end).
    # A neighbor inside a masked-out hole (interior gap) must not leak
    # padded garbage into the midpoint of the last valid sample before the
    # hole — fall back to zero-order hold there (advisor r2 gap class).
    valid_next = jnp.concatenate([valid[1:], valid[-1:]], 0)[:, None]
    acc2 = jnp.where(valid_next,
                     jnp.concatenate([acc1[1:], acc1[-1:]], 0), acc1)
    gyro2 = jnp.where(valid_next,
                      jnp.concatenate([gyro1[1:], gyro1[-1:]], 0), gyro1)

    if gravity_sensor is None:
        gravity_sensor = jnp.zeros(3, dtype)

    noise_cov = jnp.zeros((6, 6), dtype)
    noise_cov = noise_cov.at[0:3, 0:3].set(jnp.eye(3, dtype=dtype) * params.acc_noise**2)
    noise_cov = noise_cov.at[3:6, 3:6].set(jnp.eye(3, dtype=dtype) * params.gyro_noise**2)
    bias_cov = jnp.zeros((6, 6), dtype)
    bias_cov = bias_cov.at[0:3, 0:3].set(jnp.eye(3, dtype=dtype) * params.acc_bias_noise**2)
    bias_cov = bias_cov.at[3:6, 3:6].set(jnp.eye(3, dtype=dtype) * params.gyro_bias_noise**2)

    def step(state: Preintegrated, inp):
        a1, a2, g1, g2, sdt, ok = inp
        ok = ok & (sdt > params.min_integration_dt) & (sdt <= params.max_imu_dt)
        sdt = jnp.where(ok, sdt, 0.0)

        # delta rotation over the step (trapezoidal gyro)
        w = 0.5 * (g1 + g2) * sdt
        theta = jnp.linalg.norm(w)
        small = theta <= 1e-8
        dq = jnp.where(
            small,
            se3.quat_identity(dtype),
            se3.quat_from_axis_angle(w / jnp.where(small, 1.0, theta), theta),
        )
        q_old = state.delta_q
        q_new = se3.quat_normalize(se3.quat_multiply(q_old, dq))
        q_half = se3.quat_slerp(q_old, q_new, jnp.asarray(0.5, dtype))
        R_half = se3.quat_to_rot(q_half)

        a1g = a1 + gravity_sensor
        a2g = a2 + gravity_sensor
        a_int = 0.5 * (R_half @ a1g + R_half @ a2g)
        v_new = state.delta_v + a_int * sdt
        v_mid = v_new - 0.5 * a_int * sdt
        p_new = state.delta_p + v_mid * sdt

        # F/G covariance propagation over error state (dp, dv, dtheta) with
        # a local (right-multiplied) attitude error. NOTE: this deliberately
        # CORRECTS the reference's propagation (``:3930-3959``), whose
        # F(v,theta) block is ``+R dt`` instead of ``-R [a]x dt`` and whose
        # gyro-bias Jacobian omits the accumulated attitude coupling — both
        # verified wrong against autodiff of the integration itself (see
        # tests/test_estimators.py::test_preintegration_bias_jacobian).
        eye3 = jnp.eye(3, dtype=dtype)
        a_mid = 0.5 * (a1g + a2g)
        S = se3.skew(a_mid)
        F = jnp.eye(9, dtype=dtype)
        F = F.at[0:3, 3:6].set(eye3 * sdt)
        F = F.at[0:3, 6:9].set(-0.5 * R_half @ S * sdt * sdt)
        F = F.at[3:6, 6:9].set(-R_half @ S * sdt)
        F = F.at[6:9, 6:9].set(se3.so3_exp(-w))
        G = jnp.zeros((9, 6), dtype)
        G = G.at[3:6, 0:3].set(R_half)
        G = G.at[6:9, 3:6].set(eye3)

        # Bias Jacobians: J' = F J + dF_db (within-step terms)
        dF_db = jnp.zeros((9, 6), dtype)
        dF_db = dF_db.at[0:3, 0:3].set(-0.5 * R_half * sdt * sdt)
        dF_db = dF_db.at[3:6, 0:3].set(-R_half * sdt)
        dF_db = dF_db.at[6:9, 3:6].set(-sdt * eye3)
        # within-step attitude change from dbg acts at the half rotation
        dF_db = dF_db.at[3:6, 3:6].set(0.5 * R_half @ S * sdt * sdt)
        dF_db = dF_db.at[0:3, 3:6].set(0.25 * R_half @ S * sdt**3)

        J_new = jnp.matmul(F, state.jacobian_bias, precision=_HP) + dF_db
        cov_new = (
            jnp.matmul(jnp.matmul(F, state.covariance, precision=_HP), F.T,
                       precision=_HP)
            + jnp.matmul(jnp.matmul(G, noise_cov, precision=_HP), G.T,
                         precision=_HP)
            + jnp.matmul(jnp.matmul(J_new, bias_cov * sdt, precision=_HP),
                         J_new.T, precision=_HP)
        )

        new_state = Preintegrated(
            delta_p=jnp.where(ok, p_new, state.delta_p),
            delta_v=jnp.where(ok, v_new, state.delta_v),
            delta_q=jnp.where(ok, q_new, state.delta_q),
            covariance=jnp.where(ok, cov_new, state.covariance),
            jacobian_bias=jnp.where(ok, J_new, state.jacobian_bias),
            sum_dt=state.sum_dt + sdt,
        )
        return new_state, None

    state0 = _identity_state(dtype)
    final, _ = jax.lax.scan(step, state0, (acc1, acc2, gyro1, gyro2, dt, valid))
    # Covariance diagonal floor (``:3986-3989``)
    cov = final.covariance
    diag = jnp.maximum(jnp.diagonal(cov), 1e-8)
    cov = cov.at[jnp.arange(9), jnp.arange(9)].set(diag)
    return final._replace(covariance=cov)


def correct_for_bias_change(preint: Preintegrated, dba, dbg) -> Preintegrated:
    """First-order correction of the deltas for a changed bias estimate
    (used by the ImuFactor, ``uwb_imu_batch_node.cpp:1130-1160`` region)."""
    db = jnp.concatenate([dba, dbg])
    corr = jnp.matmul(preint.jacobian_bias, db, precision=_HP)
    dq_theta = corr[6:9]
    dq = se3.quat_boxplus(preint.delta_q, dq_theta)
    return preint._replace(
        delta_p=preint.delta_p + corr[0:3],
        delta_v=preint.delta_v + corr[3:6],
        delta_q=dq,
    )


def synthesize_imu_gap(start_state_q, start_v, end_state_q, end_v, dt_total,
                       n_samples: int, gravity_world=None, dtype=jnp.float32):
    """Synthetic IMU samples for a buffer gap.

    Port of the batch node's synthetic-IMU fallback
    (``uwb_imu_batch_node.cpp:3646-3781``): when the IMU buffer doesn't cover
    a keyframe interval, fabricate constant-rate samples consistent with the
    boundary states — gyro from the relative rotation, accel from the
    velocity change plus the gravity reaction in the body frame.

    Returns (acc [n, 3], gyro [n, 3], dts [n]).
    """
    if gravity_world is None:
        gravity_world = jnp.asarray([0.0, 0.0, -9.81], dtype)
    dq = se3.quat_multiply(se3.quat_conjugate(start_state_q), end_state_q)
    sign = jnp.where(dq[0] < 0, -1.0, 1.0)
    dq = dq * sign
    angle = 2.0 * jnp.arccos(jnp.clip(dq[0], -1.0, 1.0))
    axis_n = jnp.linalg.norm(dq[1:4])
    axis = dq[1:4] / jnp.maximum(axis_n, 1e-9)
    omega = jnp.where(axis_n > 1e-9, axis * angle / dt_total,
                      jnp.zeros(3, dtype))

    a_world = (end_v - start_v) / dt_total - gravity_world
    R_T = se3.quat_to_rot(se3.quat_conjugate(start_state_q))
    a_body = R_T @ a_world

    acc = jnp.tile(a_body[None, :], (n_samples, 1))
    gyro = jnp.tile(omega[None, :], (n_samples, 1))
    dts = jnp.full((n_samples,), dt_total / n_samples, dtype)
    return acc, gyro, dts


def bias_change_exceeds(preint: Preintegrated, old_ba, old_bg, new_ba, new_bg,
                        threshold: float = 0.05):
    """Cache-invalidation test for preintegrated chunks
    (``uwb_imu_batch_node.cpp:3563-3582``): re-integrate when the linearized
    bias moved more than the threshold; otherwise the first-order
    ``correct_for_bias_change`` suffices."""
    d = jnp.maximum(jnp.max(jnp.abs(new_ba - old_ba)),
                    jnp.max(jnp.abs(new_bg - old_bg)))
    return d > threshold
