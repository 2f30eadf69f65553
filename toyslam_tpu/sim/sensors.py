"""IMU and UWB sensor simulators with bias + noise (JAX PRNG).

Capability port of ``uwb_imu_sim_node.cpp`` (200 Hz IMU with exact
circular-motion specific force in body frame + bias + Gaussian noise,
``:107-199``; 20 Hz UWB ranges to beacons, ``:239-259``) and the UWB range
simulator of ``uwb_node.cpp:158-200``. Deterministic given a PRNG key —
these are the framework's "fake backends" for closed-loop estimator tests.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from toyslam_tpu.core import se3

GRAVITY = 9.81

# Default beacons (uwb_imu_sim_node.cpp:33-41)
DEFAULT_BEACONS = jnp.array([
    [-5.0, -5.0, 2.0],
    [5.0, -5.0, 2.0],
    [5.0, 5.0, 2.0],
    [-5.0, 5.0, 2.0],
    [0.0, 0.0, 3.0],
])


class ImuSimParams(NamedTuple):
    """Defaults from ``uwb_imu_sim_node.cpp:44-60``."""

    accel_noise_std: float = 0.03
    gyro_noise_std: float = 0.002
    accel_bias: tuple = (0.05, -0.07, 0.1)
    gyro_bias: tuple = (0.002, -0.003, 0.001)


def simulate_imu(key, traj, params: ImuSimParams = ImuSimParams()):
    """Generate body-frame IMU samples from a trajectory dict.

    traj must carry 'acc' (world linear acceleration), 'quat' (world<-body)
    and 'gyro' (body rates), all [T, ...]. Mirrors the reference: specific
    force = R^T (a_world + g) + bias + noise (``:139-155``).
    """
    dtype = traj["acc"].dtype
    T = traj["acc"].shape[0]
    k_a, k_g = jax.random.split(key)

    g = jnp.array([0.0, 0.0, GRAVITY], dtype)
    acc_world = traj["acc"] + g
    R = se3.quat_to_rot(traj["quat"])  # [T, 3, 3] world<-body
    acc_body = jnp.einsum("tij,ti->tj", R, acc_world,
                          precision=jax.lax.Precision.HIGHEST)  # R^T a

    acc = (acc_body + jnp.asarray(params.accel_bias, dtype)
           + params.accel_noise_std * jax.random.normal(k_a, (T, 3), dtype))
    gyro = (traj["gyro"] + jnp.asarray(params.gyro_bias, dtype)
            + params.gyro_noise_std * jax.random.normal(k_g, (T, 3), dtype))
    return acc, gyro


def simulate_uwb_ranges(key, positions, beacons=DEFAULT_BEACONS,
                        noise_std: float = 0.05):
    """Noisy ranges to each beacon (``uwb_imu_sim_node.cpp:239-259``).

    positions [T, 3] -> ranges [T, B].
    """
    d = jnp.linalg.norm(positions[:, None, :] - beacons[None, :, :], axis=-1)
    return d + noise_std * jax.random.normal(key, d.shape, positions.dtype)
