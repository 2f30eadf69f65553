import numpy as np
import jax.numpy as jnp

from toyslam_tpu.core import geodesy
from toyslam_tpu.gnss import atmosphere, ephemeris, spp


def test_lla_ecef_roundtrip(rng):
    lla = np.stack([
        rng.uniform(-1.4, 1.4, 32),  # lat rad
        rng.uniform(-3.1, 3.1, 32),  # lon rad
        rng.uniform(-100, 4000, 32),  # alt m
    ], -1)
    ecef = geodesy.lla_to_ecef(jnp.asarray(lla[:, 0]), jnp.asarray(lla[:, 1]),
                               jnp.asarray(lla[:, 2]))
    back = geodesy.ecef_to_lla(ecef)
    np.testing.assert_allclose(np.asarray(back)[:, :2], lla[:, :2], atol=1e-9)
    np.testing.assert_allclose(np.asarray(back)[:, 2], lla[:, 2], atol=1e-4)


def test_enu_roundtrip(rng):
    ref = geodesy.lla_to_ecef(jnp.asarray(0.39), jnp.asarray(2.0), jnp.asarray(50.0))
    pts = jnp.asarray(ref) + jnp.asarray(rng.uniform(-1000, 1000, (16, 3)))
    enu = geodesy.ecef_to_enu(pts, ref)
    back = geodesy.enu_to_ecef(enu, ref)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-6)


def test_gps_time_roundtrip():
    week, tow = geodesy.unix_to_gps_time(jnp.asarray(1.7e9))
    t = geodesy.gps_to_unix_time(week, tow)
    assert abs(float(t) - 1.7e9) < 1e-6


def _synthetic_constellation(rng, n_sats=8, clock_bias=123.4):
    """Satellites on a 26000 km shell; receiver in Hong Kong-ish position."""
    rec_lla = (0.3896, 1.9950, 50.0)
    rec = np.asarray(geodesy.lla_to_ecef(*[jnp.asarray(v) for v in rec_lla]))
    az = rng.uniform(0, 2 * np.pi, n_sats)
    el = rng.uniform(np.deg2rad(15), np.deg2rad(85), n_sats)
    R = np.asarray(geodesy.ecef_to_enu_rotation(jnp.asarray(rec_lla[0]),
                                                jnp.asarray(rec_lla[1])))
    los_enu = np.stack([np.cos(el) * np.sin(az), np.cos(el) * np.cos(az),
                        np.sin(el)], -1)
    los_ecef = los_enu @ R  # R rows are enu in ecef -> transpose mapping
    sat_pos = rec + los_ecef * 2.2e7
    rng_true = np.linalg.norm(sat_pos - rec, axis=1)
    sagnac = -geodesy.EARTH_ROTATION_RATE * (
        rec[0] * sat_pos[:, 1] - rec[1] * sat_pos[:, 0]
    ) / geodesy.SPEED_OF_LIGHT
    pr = rng_true + clock_bias + sagnac
    return rec, sat_pos, pr, el


def test_spp_recovers_position():
    rng = np.random.default_rng(11)
    rec, sat_pos, pr, el = _synthetic_constellation(rng)
    S = len(pr)
    obs = spp.SatelliteObs(
        pos=jnp.asarray(sat_pos),
        pseudorange=jnp.asarray(pr),
        clock_bias=jnp.zeros(S),
        iono_delay=jnp.zeros(S),
        trop_delay=jnp.zeros(S),
        tgd=jnp.zeros(S),
        weight=spp.elevation_weight(jnp.asarray(el)),
        valid=jnp.ones(S, bool),
    )
    sol = spp.solve_spp(obs, initial_state=jnp.asarray([*(rec + 1000.0), 0.0]))
    assert bool(sol.valid)
    np.testing.assert_allclose(np.asarray(sol.state[:3]), rec, atol=1e-3)
    assert abs(float(sol.state[3]) - 123.4) < 1e-3
    assert float(sol.gdop) < 10.0


def test_spp_with_noise_and_atmosphere():
    rng = np.random.default_rng(12)
    rec, sat_pos, pr, el = _synthetic_constellation(rng, n_sats=10)
    S = len(pr)
    iono = 2.0 + rng.uniform(0, 3, S)
    trop = np.asarray(atmosphere.simple_troposphere_delay(jnp.asarray(el)))
    noise = rng.normal(0, 1.0, S)
    obs = spp.SatelliteObs(
        pos=jnp.asarray(sat_pos),
        pseudorange=jnp.asarray(pr + iono + trop + noise),
        clock_bias=jnp.zeros(S),
        iono_delay=jnp.asarray(iono),
        trop_delay=jnp.asarray(trop),
        tgd=jnp.zeros(S),
        weight=spp.elevation_weight(jnp.asarray(el)),
        valid=jnp.ones(S, bool),
    )
    sol = spp.solve_spp(obs, initial_state=jnp.asarray([*(rec + 5000.0), 0.0]))
    err = np.linalg.norm(np.asarray(sol.state[:3]) - rec)
    assert err < 5.0, f"SPP error {err} m with 1 m noise"


def test_doppler_velocity():
    rng = np.random.default_rng(13)
    rec, sat_pos, pr, el = _synthetic_constellation(rng)
    S = len(pr)
    true_vel = np.array([5.0, -3.0, 1.0])
    clock_drift_mps = 0.7
    d = sat_pos - rec
    los = d / np.linalg.norm(d, axis=1, keepdims=True)
    sat_vel = rng.normal(0, 1000, (S, 3))
    sagnac = (geodesy.EARTH_ROTATION_RATE / geodesy.SPEED_OF_LIGHT
              * (sat_vel[:, 0] * rec[1] - sat_vel[:, 1] * rec[0]))
    # Z = los.(sat_vel) + sagnac - 0 + range_rate  must equal los.v + drift
    range_rate = (los @ true_vel + clock_drift_mps
                  - np.einsum("ij,ij->i", los, sat_vel) - sagnac)
    dop = spp.DopplerObs(
        sat_pos=jnp.asarray(sat_pos), sat_vel=jnp.asarray(sat_vel),
        sat_clock_drift=jnp.zeros(S), range_rate=jnp.asarray(range_rate),
        weight=jnp.ones(S), valid=jnp.ones(S, bool),
    )
    vel = spp.solve_velocity(dop, jnp.asarray(rec))
    assert bool(vel.valid)
    np.testing.assert_allclose(np.asarray(vel.vel_ecef), true_vel, atol=1e-6)
    assert abs(float(vel.clock_drift) - clock_drift_mps) < 1e-6


def test_kepler_and_ephemeris_physical():
    """Circular-ish orbit: radius ~ a, speed ~ sqrt(mu/a)."""
    S = 4
    a = 26560e3
    eph = ephemeris.GpsEphemeris(
        sat=jnp.arange(S),
        toe_sec=jnp.zeros(S), toc_sec=jnp.zeros(S),
        sqrta=jnp.full(S, np.sqrt(a)),
        e=jnp.full(S, 0.01),
        m0=jnp.asarray([0.0, 1.0, 2.0, 3.0]),
        delta_n=jnp.zeros(S),
        omega=jnp.zeros(S), omg=jnp.asarray([0.0, 1.5, 3.0, 4.5]),
        omg_dot=jnp.zeros(S), i0=jnp.full(S, 0.96), i_dot=jnp.zeros(S),
        cus=jnp.zeros(S), cuc=jnp.zeros(S), crs=jnp.zeros(S),
        crc=jnp.zeros(S), cis=jnp.zeros(S), cic=jnp.zeros(S),
        af0=jnp.full(S, 1e-5), af1=jnp.zeros(S), af2=jnp.zeros(S),
        tgd=jnp.zeros(S), valid=jnp.ones(S, bool),
    )
    out = ephemeris.sat_pos_vel_clock(eph, jnp.asarray(100.0))
    r = np.linalg.norm(np.asarray(out["pos"]), axis=1)
    np.testing.assert_allclose(r, a, rtol=0.02)
    v = np.linalg.norm(np.asarray(out["vel"]), axis=1)
    v_orbital = np.sqrt(geodesy.MU_GPS / a)
    # ECEF speed = orbital speed modulated by Earth rotation (up to ~2 km/s)
    assert np.all(np.abs(v - v_orbital) < 2500.0)
    assert np.all(np.asarray(out["valid"]))
    # Velocity must equal the finite difference of the ECEF position series
    # (this is what Doppler prediction consumes). The reference's formula
    # double-counts Earth rotation here; ours is the true derivative.
    out2 = ephemeris.sat_pos_vel_clock(eph, jnp.asarray(100.5))
    v_fd = (np.asarray(out2["pos"]) - np.asarray(out["pos"])) / 0.5
    np.testing.assert_allclose(np.asarray(out["vel"]), v_fd, atol=2.0)


def test_klobuchar_reasonable():
    params = atmosphere.IonoParams(
        alpha=jnp.asarray([1.1176e-8, 7.4506e-9, -5.9605e-8, -5.9605e-8]),
        beta=jnp.asarray([90112.0, 0.0, -196610.0, -65536.0]),
    )
    delay = atmosphere.klobuchar_delay(
        params, jnp.asarray(50400.0), jnp.asarray(0.39), jnp.asarray(2.0),
        jnp.asarray(np.deg2rad(45.0)), jnp.asarray(1.0),
    )
    # Typical L1 iono delay: 1-15 m
    assert 1.0 < float(delay) < 20.0
    # Low elevation increases delay
    delay_low = atmosphere.klobuchar_delay(
        params, jnp.asarray(50400.0), jnp.asarray(0.39), jnp.asarray(2.0),
        jnp.asarray(np.deg2rad(10.0)), jnp.asarray(1.0),
    )
    assert float(delay_low) > float(delay)


def test_gps_to_unix_microsecond_autodetect():
    """TOW published in microseconds (some receivers) is rescaled
    (uwb_imu_batch_node.cpp:2221-2227); plain seconds pass through."""
    from toyslam_tpu.core import geodesy

    week = 2300
    tow = 345600.0  # mid-week, seconds
    t_sec = float(geodesy.gps_to_unix_time(week, tow))
    t_usec = float(geodesy.gps_to_unix_time(week, tow * 1e6))
    assert abs(t_sec - t_usec) < 1e-6
    # round-trip
    w2, tow2 = geodesy.unix_to_gps_time(t_sec)
    assert int(w2) == week and abs(float(tow2) - tow) < 1e-6
