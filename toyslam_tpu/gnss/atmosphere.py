"""Ionosphere (Klobuchar) and troposphere delay models.

Capability port of ``KlobucharIonoModel::computeIonoDelay``
(``gnssSpp.cpp:479-547``; also ``RangingRC.cpp:487-542``) and the simplified
2.3/sin(el) troposphere (``gnssSpp.cpp:995``; ``RangingRC.cpp:467-486``).
Everything is elementwise over satellites.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from toyslam_tpu.core.geodesy import SPEED_OF_LIGHT


class IonoParams(NamedTuple):
    alpha: jnp.ndarray  # [4]
    beta: jnp.ndarray  # [4]
    valid: bool = True


def klobuchar_delay(params: IonoParams, time_sec, lat, lon, elevation, azimuth):
    """Klobuchar ionospheric delay in meters (``gnssSpp.cpp:482-546``)."""
    el_abs = jnp.maximum(jnp.abs(elevation), 0.05)
    lat_sc = lat / jnp.pi
    lon_sc = lon / jnp.pi
    el_sc = el_abs / jnp.pi

    psi = 0.0137 / (el_sc + 0.11) - 0.022
    phi_i = jnp.clip(lat_sc + psi * jnp.cos(azimuth), -0.416, 0.416)
    lambda_i = lon_sc + psi * jnp.sin(azimuth) / jnp.cos(phi_i * jnp.pi)
    phi_m = phi_i + 0.064 * jnp.cos((lambda_i - 1.617) * jnp.pi)

    t = jnp.mod(43200.0 * lambda_i + time_sec, 86400.0)
    t = jnp.where(t < 0, t + 86400.0, t)

    f = 1.0 + 16.0 * (0.53 - el_sc) ** 3

    a0, a1, a2, a3 = params.alpha
    amp = jnp.maximum(a0 + a1 * phi_m + a2 * phi_m**2 + a3 * phi_m**3, 0.0)
    all_zero = (a0 == 0) & (a1 == 0) & (a2 == 0) & (a3 == 0)
    amp = jnp.where(all_zero, 5.0e-9, amp)

    b0, b1, b2, b3 = params.beta
    per = jnp.maximum(b0 + b1 * phi_m + b2 * phi_m**2 + b3 * phi_m**3, 72000.0)

    x = 2.0 * jnp.pi * (t - 50400.0) / per
    delay = jnp.where(
        jnp.abs(x) < 1.57,
        f * (5.0e-9 + amp * (1.0 - x * x / 2.0 + x**4 / 24.0)),
        f * 5.0e-9,
    )
    valid = jnp.asarray(params.valid)
    return jnp.where(valid, delay * SPEED_OF_LIGHT, 0.0)


def simple_troposphere_delay(elevation):
    """2.3 / max(sin|el|, 0.1) meters (``gnssSpp.cpp:995``)."""
    return 2.3 / jnp.maximum(jnp.sin(jnp.abs(elevation)), 0.1)
