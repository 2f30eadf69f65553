"""GNSS single point positioning (pseudorange WLS) + Doppler velocity.

Capability port of the ``gnssSpp.cpp`` pipeline: elevation-weighted
pseudorange WLS over receiver [x, y, z, clock_bias] with Sagnac + satellite
clock + TGD + iono/tropo terms (``GpsPseudorangeResidual``, ``:550-597``;
``solveGpsOnlyWLS``, ``:1335-1428``), elevation/CN0 measurement weighting
(``:1481-1509``), DOP computation (``:1510-1577``), and the closed-form
Doppler velocity WLS with Sagnac rate (``:1622-1708``) plus velocity
validation (``:44-46, 1711+``).

TPU design: satellites are padded structure-of-array tensors with a validity
mask; the iterated WLS is a fixed-iteration Gauss-Newton (the residual is
nearly linear in the receiver state, matching Ceres DENSE_QR behaviour);
everything vmaps over epochs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from toyslam_tpu.core.geodesy import (
    EARTH_ROTATION_RATE,
    SPEED_OF_LIGHT,
    ecef_to_enu_rotation,
    ecef_to_lla,
)

_HP = jax.lax.Precision.HIGHEST

DEFAULT_PSEUDORANGE_NOISE = 5.0  # m (gnssSpp.cpp:33)
MAX_VELOCITY = 200.0  # m/s (:44)
MAX_VEL_CHANGE = 20.0  # m/s (:45)


class SatelliteObs(NamedTuple):
    """Per-epoch satellite data, padded [S] with ``valid`` mask."""

    pos: jnp.ndarray  # [S, 3] ECEF at transmit time
    pseudorange: jnp.ndarray  # [S] corrected for nothing (raw)
    clock_bias: jnp.ndarray  # [S] satellite clock (s)
    iono_delay: jnp.ndarray  # [S] m
    trop_delay: jnp.ndarray  # [S] m
    tgd: jnp.ndarray  # [S] s
    weight: jnp.ndarray  # [S] measurement weight
    valid: jnp.ndarray  # [S] bool


def elevation_azimuth(sat_pos, receiver_ecef):
    """Elevation/azimuth of satellites from the receiver (``:1431-1480``)."""
    lla = ecef_to_lla(receiver_ecef)
    R = ecef_to_enu_rotation(lla[..., 0], lla[..., 1])
    los = sat_pos - receiver_ecef
    enu = jnp.einsum("ij,...j->...i", R, los, precision=_HP)
    rng = jnp.linalg.norm(enu, axis=-1)
    elevation = jnp.arcsin(jnp.clip(enu[..., 2] / jnp.maximum(rng, 1e-9), -1, 1))
    azimuth = jnp.arctan2(enu[..., 0], enu[..., 1])
    return elevation, azimuth


def elevation_weight(elevation, cn0=None, min_cn0: float = 20.0, ura=None):
    """sin^2(el) x CN0 x URA weighting (``calculateMeasurementWeight``,
    ``:1481-1509``)."""
    sin_el = jnp.sin(jnp.abs(elevation))
    w = jnp.maximum(0.1, sin_el * sin_el)
    if cn0 is not None:
        cn0_w = jnp.where(
            cn0 > 0,
            jnp.clip((cn0 - min_cn0) / 30.0, 0.2, 1.0),
            1.0,
        )
        w = w * cn0_w
    if ura is not None:
        w = w * jnp.where(ura > 0, 1.0 / ura, 1.0)
    return w


def predicted_pseudorange(state, obs: SatelliteObs):
    """Expected pseudorange per ``GpsPseudorangeResidual`` (``:559-585``)."""
    rx, ry, rz, cb = state[0], state[1], state[2], state[3]
    d = obs.pos - state[:3]
    geo = jnp.linalg.norm(d, axis=-1)
    sagnac = -EARTH_ROTATION_RATE * (rx * obs.pos[:, 1] - ry * obs.pos[:, 0]) / SPEED_OF_LIGHT
    return (geo + cb + sagnac + obs.iono_delay + obs.trop_delay
            - obs.tgd * SPEED_OF_LIGHT - obs.clock_bias * SPEED_OF_LIGHT)


class SppSolution(NamedTuple):
    state: jnp.ndarray  # [4] x, y, z, clock_bias
    covariance: jnp.ndarray  # [4, 4]
    gdop: jnp.ndarray
    pdop: jnp.ndarray
    hdop: jnp.ndarray
    vdop: jnp.ndarray
    tdop: jnp.ndarray
    num_sats: jnp.ndarray
    valid: jnp.ndarray


def solve_spp(obs: SatelliteObs, initial_state=None, iterations: int = 15):
    """Iterated WLS position solve (Ceres DENSE_QR <= 15 iters, ``:1398``)."""
    dtype = obs.pos.dtype
    if initial_state is None:
        initial_state = jnp.zeros(4, dtype)

    w = obs.weight * obs.valid.astype(dtype)
    psr_std = DEFAULT_PSEUDORANGE_NOISE / jnp.sqrt(jnp.maximum(w, 1e-6))

    def gn_step(_, state):
        pred = predicted_pseudorange(state, obs)
        r = (obs.pseudorange - pred) / psr_std
        d = obs.pos - state[:3]
        rng = jnp.maximum(jnp.linalg.norm(d, axis=-1), 1e-9)
        # d(pred)/d(receiver xyz) = -los_unit (+ tiny Sagnac terms, ignored by
        # Ceres' autodiff too? no — Ceres includes them; they are ~1e-9 and
        # below f32 resolution, so GN converges identically)
        J = jnp.concatenate([d / rng[:, None], -jnp.ones_like(rng)[:, None]], 1)
        # residual = (meas - pred)/std; d(residual)/dstate = -d(pred)/d = J/std
        Jw = J / psr_std[:, None] * obs.valid[:, None].astype(dtype)
        H = jnp.matmul(Jw.T, Jw, precision=_HP) + 1e-9 * jnp.eye(4, dtype=dtype)
        g = jnp.matmul(Jw.T, r * obs.valid.astype(dtype), precision=_HP)
        delta = -jnp.linalg.solve(H, g)
        return state + delta

    state = jax.lax.fori_loop(0, iterations, gn_step, initial_state.astype(dtype))

    # DOP + covariance at the solution (``calculateGpsDOP``, ``:1510-1577``)
    d = obs.pos - state[:3]
    rng = jnp.maximum(jnp.linalg.norm(d, axis=-1), 1e-9)
    G = jnp.concatenate([-d / rng[:, None], jnp.ones_like(rng)[:, None]], 1)
    Gw = G * (w[:, None])
    N = jnp.matmul(G.T, Gw, precision=_HP)
    cov = jnp.linalg.inv(N + 1e-12 * jnp.eye(4, dtype=dtype))
    diag = jnp.diagonal(cov)
    n_sats = jnp.sum(obs.valid.astype(jnp.int32))
    return SppSolution(
        state=state,
        covariance=cov,
        gdop=jnp.sqrt(jnp.sum(diag)),
        pdop=jnp.sqrt(diag[0] + diag[1] + diag[2]),
        hdop=jnp.sqrt(diag[0] + diag[1]),
        vdop=jnp.sqrt(diag[2]),
        tdop=jnp.sqrt(diag[3]),
        num_sats=n_sats,
        valid=n_sats >= 4,
    )


class DopplerObs(NamedTuple):
    """Per-epoch Doppler data, padded [S]."""

    sat_pos: jnp.ndarray  # [S, 3]
    sat_vel: jnp.ndarray  # [S, 3]
    sat_clock_drift: jnp.ndarray  # [S] (s/s)
    range_rate: jnp.ndarray  # [S] doppler * wavelength (m/s)
    weight: jnp.ndarray  # [S]
    valid: jnp.ndarray  # [S] bool


class VelocitySolution(NamedTuple):
    vel_ecef: jnp.ndarray  # [3]
    clock_drift: jnp.ndarray  # scalar (m/s)
    covariance: jnp.ndarray  # [4, 4]
    vel_enu: jnp.ndarray  # [3]
    speed: jnp.ndarray  # horizontal speed
    valid: jnp.ndarray


def solve_velocity(dop: DopplerObs, receiver_ecef) -> VelocitySolution:
    """Closed-form Doppler velocity WLS (``computeVelocitySolution``,
    ``:1622-1708``): G [los, 1], Z = sat_vel.los + sagnac_rate
    - sat_clock_drift*c + range_rate; x = (G^T W G)^-1 G^T W Z."""
    dtype = dop.sat_pos.dtype
    d = dop.sat_pos - receiver_ecef
    rng = jnp.maximum(jnp.linalg.norm(d, axis=-1), 1e-9)
    los = d / rng[:, None]  # receiver -> satellite unit

    sat_vel_proj = jnp.sum(los * dop.sat_vel, axis=-1)
    sagnac = (EARTH_ROTATION_RATE / SPEED_OF_LIGHT
              * (dop.sat_vel[:, 0] * receiver_ecef[1]
                 - dop.sat_vel[:, 1] * receiver_ecef[0]))
    Z = sat_vel_proj + sagnac - dop.sat_clock_drift * SPEED_OF_LIGHT + dop.range_rate

    G = jnp.concatenate([los, jnp.ones_like(rng)[:, None]], 1)
    w = dop.weight * dop.valid.astype(dtype)
    Gw = G * w[:, None]
    N = jnp.matmul(G.T, Gw, precision=_HP) + 1e-9 * jnp.eye(4, dtype=dtype)
    cov = jnp.linalg.inv(N)
    Z_safe = jnp.where(dop.valid, Z, 0.0)
    x = cov @ jnp.matmul(Gw.T, Z_safe, precision=_HP)

    lla = ecef_to_lla(receiver_ecef)
    R = ecef_to_enu_rotation(lla[0], lla[1])
    vel_enu = R @ x[:3]
    speed = jnp.sqrt(vel_enu[0] ** 2 + vel_enu[1] ** 2)
    n = jnp.sum(dop.valid.astype(jnp.int32))
    ok = (n >= 4) & (jnp.linalg.norm(x[:3]) <= MAX_VELOCITY)
    return VelocitySolution(
        vel_ecef=x[:3], clock_drift=x[3], covariance=cov,
        vel_enu=vel_enu, speed=speed, valid=ok,
    )


def validate_velocity(new_vel: VelocitySolution, prev_vel_ecef=None):
    """Sanity gates (``:1711+``): |v| <= 200 m/s, |dv| <= 20 m/s."""
    ok = jnp.linalg.norm(new_vel.vel_ecef) <= MAX_VELOCITY
    if prev_vel_ecef is not None:
        ok = ok & (jnp.linalg.norm(new_vel.vel_ecef - prev_vel_ecef)
                   <= MAX_VEL_CHANGE)
    return ok
