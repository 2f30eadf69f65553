"""WGS84 geodesy: ECEF <-> LLA <-> ENU, GPS time helpers.

Capability port of the reference's ``CoordinateConverter``
(``gnssSpp.cpp:225-322``), flat-earth GPS->ENU (``uwb_imu_batch_node.cpp:
2182-2213``) and GPS<->Unix time conversion (``:2216-2252``,
``gnssSpp.cpp:211-222``). All functions are elementwise and batch over
leading dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp

SPEED_OF_LIGHT = 299792458.0  # m/s
GPS_L1_FREQ = 1575.42e6  # Hz
GPS_L1_WAVELENGTH = SPEED_OF_LIGHT / GPS_L1_FREQ
EARTH_ROTATION_RATE = 7.2921151467e-5  # rad/s
WGS84_A = 6378137.0
WGS84_B = 6356752.31424518
WGS84_E_SQ = 1.0 - (WGS84_B * WGS84_B) / (WGS84_A * WGS84_A)
MU_GPS = 3.9860050e14  # m^3/s^2 (GPS ICD value, gnssSpp.cpp:38)
GPS_SECONDS_PER_WEEK = 604800.0
GPS_LEAP_SECONDS = 18.0
GPS_UNIX_EPOCH_OFFSET = 315964800.0  # Unix time of GPS epoch 1980-01-06


def lla_to_ecef(lat, lon, alt):
    """Geodetic (rad, rad, m) -> ECEF (``gnssSpp.cpp:255-261``)."""
    sin_lat = jnp.sin(lat)
    N = WGS84_A / jnp.sqrt(1.0 - WGS84_E_SQ * sin_lat * sin_lat)
    x = (N + alt) * jnp.cos(lat) * jnp.cos(lon)
    y = (N + alt) * jnp.cos(lat) * jnp.sin(lon)
    z = (N * (1.0 - WGS84_E_SQ) + alt) * sin_lat
    return jnp.stack([x, y, z], -1)


def ecef_to_lla(ecef, iterations: int = 5):
    """ECEF -> geodetic by fixed-point iteration (``gnssSpp.cpp:228-252``)."""
    x, y, z = ecef[..., 0], ecef[..., 1], ecef[..., 2]
    lon = jnp.arctan2(y, x)
    p = jnp.sqrt(x * x + y * y)
    lat = jnp.arctan2(z, p * (1.0 - WGS84_E_SQ))
    h = jnp.zeros_like(lat)
    for _ in range(iterations):
        sin_lat = jnp.sin(lat)
        N = WGS84_A / jnp.sqrt(1.0 - WGS84_E_SQ * sin_lat * sin_lat)
        h = p / jnp.cos(lat) - N
        lat = jnp.arctan2(z, p * (1.0 - WGS84_E_SQ * N / (N + h)))
    return jnp.stack([lat, lon, h], -1)


def ecef_to_enu_rotation(lat, lon):
    """Rows are e, n, u unit vectors in ECEF (``gnssSpp.cpp:264-287``)."""
    sl, cl = jnp.sin(lat), jnp.cos(lat)
    so, co = jnp.sin(lon), jnp.cos(lon)
    zero = jnp.zeros_like(lat)
    return jnp.stack(
        [
            jnp.stack([-so, co, zero], -1),
            jnp.stack([-sl * co, -sl * so, cl], -1),
            jnp.stack([cl * co, cl * so, sl], -1),
        ],
        -2,
    )


def ecef_to_enu(point_ecef, ref_ecef, ref_lla=None):
    if ref_lla is None:
        ref_lla = ecef_to_lla(ref_ecef)
    R = ecef_to_enu_rotation(ref_lla[..., 0], ref_lla[..., 1])
    d = point_ecef - ref_ecef
    return jnp.einsum("...ij,...j->...i", R, d)


def enu_to_ecef(enu, ref_ecef, ref_lla=None):
    if ref_lla is None:
        ref_lla = ecef_to_lla(ref_ecef)
    R = ecef_to_enu_rotation(ref_lla[..., 0], ref_lla[..., 1])
    return ref_ecef + jnp.einsum("...ji,...j->...i", R, enu)


def ecef_velocity_to_enu(vel_ecef, lat, lon):
    R = ecef_to_enu_rotation(lat, lon)
    return jnp.einsum("...ij,...j->...i", R, vel_ecef)


def gps_to_unix_time(gps_week, gps_tow):
    """GPS week/TOW -> Unix seconds (``uwb_imu_batch_node.cpp:2216-2252``),
    including the microsecond-format autodetect: a TOW above one week's
    worth of seconds but below a week of microseconds is rescaled
    (``:2221-2227``; some receivers publish TOW in us)."""
    is_usec = (gps_tow > 1.0e6) & (gps_tow < GPS_SECONDS_PER_WEEK * 1.0e6)
    gps_tow = jnp.where(is_usec, gps_tow / 1.0e6, gps_tow)
    return (GPS_UNIX_EPOCH_OFFSET + gps_week * GPS_SECONDS_PER_WEEK + gps_tow
            - GPS_LEAP_SECONDS)


def unix_to_gps_time(unix_time):
    gps_sec = unix_time - GPS_UNIX_EPOCH_OFFSET + GPS_LEAP_SECONDS
    week = jnp.floor(gps_sec / GPS_SECONDS_PER_WEEK)
    tow = gps_sec - week * GPS_SECONDS_PER_WEEK
    return week, tow


def adjust_time_within_week(t, t_ref):
    """Wrap t - t_ref into [-302400, 302400] (half a GPS week)."""
    dt = t - t_ref
    dt = jnp.where(dt > GPS_SECONDS_PER_WEEK / 2, dt - GPS_SECONDS_PER_WEEK, dt)
    dt = jnp.where(dt < -GPS_SECONDS_PER_WEEK / 2, dt + GPS_SECONDS_PER_WEEK, dt)
    return dt


def flat_earth_gps_to_enu(lat, lon, alt, ref_lat, ref_lon, ref_alt):
    """Small-area equirectangular GPS->ENU used by the batch node
    (``uwb_imu_batch_node.cpp:2182-2213``). Radians in."""
    earth_radius = 6378137.0
    d_lat = lat - ref_lat
    d_lon = lon - ref_lon
    n = d_lat * earth_radius
    e = d_lon * earth_radius * jnp.cos(ref_lat)
    u = alt - ref_alt
    return jnp.stack([e, n, u], -1)


def flat_earth_enu_to_gps(enu, ref_lat, ref_lon, ref_alt):
    """Exact inverse of ``flat_earth_gps_to_enu`` (radians out) — used to
    synthesize INSPVAX/NavSatFix streams from simulated ENU trajectories
    for bag round-trip tests."""
    earth_radius = 6378137.0
    lat = ref_lat + enu[..., 1] / earth_radius
    lon = ref_lon + enu[..., 0] / (earth_radius * jnp.cos(ref_lat))
    alt = ref_alt + enu[..., 2]
    return lat, lon, alt
