"""GPS constellation simulator with fault injection.

Capability port of ``GPSRAIM.cpp:251-303`` (``generateSatelliteConstellation``):
satellites placed by azimuth/elevation on a 20200 km shell around a true
receiver position, pseudoranges with Gaussian noise, and injected faults —
a forced index or a random satellite with a configurable bias magnitude.
This is the closed-loop fake backend for RAIM tests.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from toyslam_tpu.core.geodesy import ecef_to_enu_rotation, ecef_to_lla

GPS_ORBIT_RADIUS = 26560e3  # ~20200 km altitude shell


class GpsSimConfig(NamedTuple):
    n_sats: int = 8
    noise_std: float = 2.0  # pseudorange noise (m)
    clock_bias: float = 0.0  # receiver clock bias (m)
    fault_magnitude: float = 50.0  # injected bias (m)
    min_elevation_deg: float = 15.0
    max_elevation_deg: float = 80.0


def simulate_constellation(key, receiver_ecef,
                           config: GpsSimConfig = GpsSimConfig(),
                           fault_index: int | None = None):
    """Generate satellite positions + pseudoranges, optionally faulted.

    fault_index: None = no fault; -1 = random satellite; >=0 = that index.
    Returns dict(sat_pos [S,3], pseudoranges [S], fault_idx, elevations [S]).
    """
    k_az, k_el, k_noise, k_fault = jax.random.split(key, 4)
    S = config.n_sats
    dtype = receiver_ecef.dtype

    az = jax.random.uniform(k_az, (S,), dtype, 0.0, 2.0 * jnp.pi)
    el = jax.random.uniform(
        k_el, (S,), dtype,
        jnp.deg2rad(config.min_elevation_deg),
        jnp.deg2rad(config.max_elevation_deg),
    )

    lla = ecef_to_lla(receiver_ecef)
    R = ecef_to_enu_rotation(lla[0], lla[1])  # rows = enu axes in ecef
    los_enu = jnp.stack(
        [jnp.cos(el) * jnp.sin(az), jnp.cos(el) * jnp.cos(az), jnp.sin(el)], -1
    )
    los_ecef = jnp.einsum("si,ij->sj", los_enu, R)
    # Place satellites along the LOS at the orbit shell distance
    sat_pos = receiver_ecef + los_ecef * (GPS_ORBIT_RADIUS - jnp.linalg.norm(receiver_ecef))

    true_range = jnp.linalg.norm(sat_pos - receiver_ecef, axis=-1)
    pr = (true_range + config.clock_bias
          + config.noise_std * jax.random.normal(k_noise, (S,), dtype))

    if fault_index is None:
        fault_idx = jnp.asarray(-1, jnp.int32)
    elif fault_index == -1:
        fault_idx = jax.random.randint(k_fault, (), 0, S)
    else:
        fault_idx = jnp.asarray(fault_index, jnp.int32)
    pr = jnp.where(
        jnp.arange(S) == fault_idx, pr + config.fault_magnitude, pr
    )
    return {"sat_pos": sat_pos, "pseudoranges": pr, "fault_idx": fault_idx,
            "elevations": el, "azimuths": az}
