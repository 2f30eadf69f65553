import numpy as np
import jax
import jax.numpy as jnp

from toyslam_tpu.core import geodesy
from toyslam_tpu.gnss import raim
from toyslam_tpu.sim import gps as gps_sim


def _receiver():
    return jnp.asarray(
        geodesy.lla_to_ecef(jnp.asarray(0.3896), jnp.asarray(1.995),
                            jnp.asarray(50.0)), jnp.float64)


def test_raim_no_fault():
    rec = _receiver()
    cfg = gps_sim.GpsSimConfig(n_sats=9, noise_std=1.0)
    sim = gps_sim.simulate_constellation(jax.random.PRNGKey(0), rec, cfg)
    S = cfg.n_sats
    init = jnp.concatenate([rec + 100.0, jnp.zeros(1, jnp.float64)])
    res = raim.raim_detect(sim["sat_pos"], sim["pseudoranges"],
                           jnp.ones(S, bool), init)
    err = np.linalg.norm(np.asarray(res.state[:3]) - np.asarray(rec))
    assert err < 10.0  # ~1 m noise x GDOP of a random 9-sat geometry
    assert not bool(res.fault_detected), float(res.test_statistic)
    assert float(res.hpl) > 0 and float(res.vpl) > 0
    assert float(res.hpl) < 100.0


def test_raim_detects_injected_fault():
    rec = _receiver()
    cfg = gps_sim.GpsSimConfig(n_sats=9, noise_std=1.0, fault_magnitude=80.0)
    sim = gps_sim.simulate_constellation(jax.random.PRNGKey(1), rec, cfg,
                                         fault_index=3)
    S = cfg.n_sats
    init = jnp.concatenate([rec + 100.0, jnp.zeros(1, jnp.float64)])
    res = raim.raim_detect(sim["sat_pos"], sim["pseudoranges"],
                           jnp.ones(S, bool), init)
    assert bool(res.fault_detected), float(res.test_statistic)

    # Exclusion should identify satellite 3
    excluded, stat, best = raim.fault_exclusion(
        sim["sat_pos"], sim["pseudoranges"], jnp.ones(S, bool), init)
    assert int(excluded) == 3, f"excluded {int(excluded)}"
    assert float(stat) < float(res.test_statistic)
    err = np.linalg.norm(np.asarray(best.state[:3]) - np.asarray(rec))
    assert err < 5.0


def test_raim_protection_levels_grow_with_noise():
    rec = _receiver()
    init = jnp.concatenate([rec + 100.0, jnp.zeros(1, jnp.float64)])
    hpls = []
    for noise in (1.0, 4.0):
        cfg = gps_sim.GpsSimConfig(n_sats=10, noise_std=noise)
        sim = gps_sim.simulate_constellation(jax.random.PRNGKey(2), rec, cfg)
        res = raim.raim_detect(
            sim["sat_pos"], sim["pseudoranges"], jnp.ones(10, bool), init,
            raim.RaimConfig(noise_stddev_m=noise))
        hpls.append(float(res.hpl))
    assert hpls[1] > hpls[0]


def test_covariance_ellipse_export(rng):
    """Headless covariance-ellipse/protection export (GPSRAIM.cpp:823-918):
    finite, PSD, consistent with the ECEF covariance trace, and the ellipse
    axes are ordered."""
    from toyslam_tpu.core.geodesy import lla_to_ecef

    receiver = lla_to_ecef(jnp.asarray(0.39, jnp.float64),
                           jnp.asarray(1.99, jnp.float64),
                           jnp.asarray(50.0, jnp.float64))
    sim = gps_sim.simulate_constellation(
        jax.random.PRNGKey(7), receiver, gps_sim.GpsSimConfig(n_sats=9))
    init = jnp.concatenate([receiver + 5.0, jnp.zeros(1, jnp.float64)])
    res = raim.raim_detect(sim["sat_pos"], sim["pseudoranges"],
                           jnp.ones(9, bool), init)
    ell = raim.covariance_ellipse(res)
    cov = np.asarray(ell["cov_enu"])
    assert np.isfinite(cov).all()
    np.testing.assert_allclose(cov, cov.T, atol=1e-12)
    assert np.linalg.eigvalsh(cov).min() > -1e-12
    # rotation preserves the 3x3 trace
    np.testing.assert_allclose(
        np.trace(cov), np.trace(np.asarray(res.covariance)[:3, :3]),
        rtol=1e-9)
    assert float(ell["semi_major"]) >= float(ell["semi_minor"]) > 0
    assert float(ell["hpl"]) > 0 and float(ell["vpl"]) > 0
