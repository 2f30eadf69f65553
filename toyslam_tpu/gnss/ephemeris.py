"""GPS broadcast-ephemeris satellite position/velocity/clock.

Capability port of ``GpsEphemerisCalculator::computeSatPosVel``
(``gnssSpp.cpp:323-476``; also ``RangingRC.cpp:185-266``): Kepler solution,
second-harmonic perturbations, Earth-rotation-corrected ECEF velocity,
clock bias/drift incl. relativistic correction.

TPU design: ephemerides are structure-of-arrays over satellites; everything
is elementwise and vmappable — a whole constellation evaluates in one fused
pass. Kepler's equation runs a fixed 30 iterations (matching the reference's
cap) instead of data-dependent early exit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from toyslam_tpu.core.geodesy import (
    EARTH_ROTATION_RATE,
    MU_GPS,
    SPEED_OF_LIGHT,
    adjust_time_within_week,
)

MAX_EPH_AGE = 7200.0  # seconds (gnssSpp.cpp:40)


class GpsEphemeris(NamedTuple):
    """Broadcast ephemeris fields, each [S] for S satellites."""

    sat: jnp.ndarray  # PRN
    toe_sec: jnp.ndarray  # time of ephemeris (s of week)
    toc_sec: jnp.ndarray  # time of clock
    sqrta: jnp.ndarray
    e: jnp.ndarray
    m0: jnp.ndarray
    delta_n: jnp.ndarray
    omega: jnp.ndarray  # argument of perigee
    omg: jnp.ndarray  # longitude of ascending node at toe
    omg_dot: jnp.ndarray
    i0: jnp.ndarray
    i_dot: jnp.ndarray
    cus: jnp.ndarray
    cuc: jnp.ndarray
    crs: jnp.ndarray
    crc: jnp.ndarray
    cis: jnp.ndarray
    cic: jnp.ndarray
    af0: jnp.ndarray
    af1: jnp.ndarray
    af2: jnp.ndarray
    tgd: jnp.ndarray
    valid: jnp.ndarray  # bool


def solve_kepler(M, e, iterations: int = 30):
    """Fixed-point E = M + e sin(E) (``gnssSpp.cpp:306-322``)."""
    E = M
    for _ in range(iterations):
        E = M + e * jnp.sin(E)
    return E


def sat_pos_vel_clock(eph: GpsEphemeris, transmit_time,
                      force_use_ephemeris: bool = False):
    """Satellite ECEF position, velocity, clock bias/drift at transmit time.

    Returns dict(pos [S,3], vel [S,3], clock_bias [S], clock_drift [S],
    valid [S]). Mirrors ``computeSatPosVel`` including the ephemeris-age
    validity gate.
    """
    tk = adjust_time_within_week(transmit_time, eph.toe_sec)
    age_ok = jnp.abs(tk) <= MAX_EPH_AGE
    valid = eph.valid & (eph.sqrta > 0)
    if not force_use_ephemeris:
        valid = valid & age_ok

    a = eph.sqrta * eph.sqrta
    n0 = jnp.sqrt(MU_GPS / (a * a * a))
    n = n0 + eph.delta_n
    M = eph.m0 + n * tk
    E = solve_kepler(M, eph.e)
    sin_E, cos_E = jnp.sin(E), jnp.cos(E)

    dt = adjust_time_within_week(transmit_time, eph.toc_sec)
    clock_bias = eph.af0 + eph.af1 * dt + eph.af2 * dt * dt
    clock_drift = eph.af1 + 2.0 * eph.af2 * dt
    # Relativistic corrections (``gnssSpp.cpp:383-390``)
    rel = -2.0 * jnp.sqrt(MU_GPS) * eph.e * eph.sqrta * sin_E / SPEED_OF_LIGHT**2
    clock_bias = clock_bias + rel
    rel_rate = (-2.0 * jnp.sqrt(MU_GPS) * eph.e * eph.sqrta * cos_E
                * (n / (1.0 - eph.e * cos_E)) / SPEED_OF_LIGHT**2)
    clock_drift = clock_drift + rel_rate

    f_E = jnp.sqrt(1.0 - eph.e * eph.e)
    nu = jnp.arctan2(f_E * sin_E, cos_E - eph.e)
    E_dot = n / (1.0 - eph.e * cos_E)
    nu_dot = E_dot * f_E / (1.0 - eph.e * cos_E)

    phi = nu + eph.omega
    phi_dot = nu_dot
    s2p, c2p = jnp.sin(2 * phi), jnp.cos(2 * phi)
    du = eph.cus * s2p + eph.cuc * c2p
    dr = eph.crs * s2p + eph.crc * c2p
    di = eph.cis * s2p + eph.cic * c2p
    du_dot = 2.0 * phi_dot * (eph.cus * c2p - eph.cuc * s2p)
    dr_dot = 2.0 * phi_dot * (eph.crs * c2p - eph.crc * s2p)
    di_dot = 2.0 * phi_dot * (eph.cis * c2p - eph.cic * s2p)

    u = phi + du
    r = a * (1.0 - eph.e * cos_E) + dr
    inc = eph.i0 + di + eph.i_dot * tk
    u_dot = phi_dot + du_dot
    r_dot = a * eph.e * sin_E * E_dot + dr_dot
    inc_dot = eph.i_dot + di_dot

    x_op, y_op = r * jnp.cos(u), r * jnp.sin(u)
    x_op_dot = r_dot * jnp.cos(u) - r * jnp.sin(u) * u_dot
    y_op_dot = r_dot * jnp.sin(u) + r * jnp.cos(u) * u_dot

    Omega = (eph.omg + (eph.omg_dot - EARTH_ROTATION_RATE) * tk
             - EARTH_ROTATION_RATE * eph.toe_sec)
    Omega_dot = eph.omg_dot - EARTH_ROTATION_RATE
    si, ci = jnp.sin(inc), jnp.cos(inc)
    sO, cO = jnp.sin(Omega), jnp.cos(Omega)

    x = x_op * cO - y_op * ci * sO
    y = x_op * sO + y_op * ci * cO
    z = y_op * si

    px_dot = (x_op_dot * cO - y_op_dot * ci * sO + y_op * si * sO * inc_dot
              - (x_op * sO + y_op * ci * cO) * Omega_dot)
    py_dot = (x_op_dot * sO + y_op_dot * ci * cO - y_op * si * cO * inc_dot
              + (x_op * cO - y_op * ci * sO) * Omega_dot)
    pz_dot = y_op_dot * si + y_op * ci * inc_dot

    # NOTE: px_dot/py_dot are already the full ECEF time derivative (Omega_dot
    # includes the -earth_rate term). The reference additionally applies
    # -omega_e x r on top (``gnssSpp.cpp:461-466``), double-counting Earth
    # rotation by ~1.9 km/s; verified against finite differences of the
    # position series (tests/test_gnss.py::test_kepler_and_ephemeris_physical).
    vx, vy, vz = px_dot, py_dot, pz_dot

    return {
        "pos": jnp.stack([x, y, z], -1),
        "vel": jnp.stack([vx, vy, vz], -1),
        "clock_bias": clock_bias,
        "clock_drift": clock_drift,
        "valid": valid,
    }
