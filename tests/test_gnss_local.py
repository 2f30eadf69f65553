"""f32 local-frame GNSS (gnss/local.py) vs the f64 ECEF pipeline.

The TPU-native reformulation (host f64 prep linearizing about an anchor +
f32 on-chip GN over [delta, clock]) must reproduce the f64
``pipeline.run_epochs`` ECEF solution to < 0.1 m (VERDICT r2 item 2
acceptance)."""

import numpy as np
import jax
import jax.numpy as jnp

from toyslam_tpu.gnss import local, pipeline
from test_gnss_pipeline import _make_epoch_log


def _run_both(anchor_shift=(0.0, 0.0, 0.0), **log_kw):
    (store, iono, tows, prns, prs, dops, cn0s, valids, ref, gt_pos,
     gt_vel) = _make_epoch_log(**log_kw)
    cfg = pipeline.EpochConfig(apply_iono_correction=False)
    anchor = ref + jnp.asarray(anchor_shift, jnp.float64)

    sols64 = pipeline.run_epochs(store, iono, tows, prns, prs, dops, cn0s,
                                 valids, anchor, config=cfg)

    ep = local.prep_epochs(store, iono, tows, prns, prs, dops, cn0s,
                           valids, anchor, config=cfg)
    assert ep.y.dtype == jnp.float32
    sol32 = jax.jit(local.solve_epochs_local, static_argnums=1)(ep, cfg)
    return sols64, sol32, np.asarray(anchor), gt_pos, gt_vel


def test_local_f32_matches_f64_pipeline():
    sols64, sol32, anchor, gt_pos, gt_vel = _run_both()
    assert bool(np.asarray(sol32.valid).all())

    est32 = anchor + np.asarray(sol32.delta, np.float64)
    est64 = np.asarray(sols64.position.state[:, :3])
    d = np.linalg.norm(est32 - est64, axis=1)
    assert d.max() < 0.1, d

    cb = np.abs(np.asarray(sol32.clock_bias, np.float64)
                - np.asarray(sols64.position.state[:, 3]))
    assert cb.max() < 0.1, cb

    dv = np.linalg.norm(
        np.asarray(sol32.vel_ecef, np.float64)
        - np.asarray(sols64.velocity.vel_ecef), axis=1)
    assert dv.max() < 0.05, dv
    assert bool(np.asarray(sol32.vel_valid).all())

    # DOP/covariance come out of the same (LOS-corrected) geometry
    np.testing.assert_allclose(np.asarray(sol32.pdop),
                               np.asarray(sols64.position.pdop), rtol=2e-2)
    np.testing.assert_allclose(np.asarray(sol32.hdop),
                               np.asarray(sols64.position.hdop), rtol=2e-2)
    np.testing.assert_array_equal(np.asarray(sol32.num_sats),
                                  np.asarray(sols64.position.num_sats))

    # And the solution itself is good against ground truth
    err = np.linalg.norm(est32 - gt_pos, axis=1)
    assert np.sqrt(np.mean(err ** 2)) < 5.0


def test_local_solver_handles_km_scale_anchor_offset():
    """A 2 km anchor error (realistic cold-start approx position) must not
    degrade the f32 solution: the second-order range correction keeps the
    linearization honest (truncation < 2 mm at 10 km)."""
    sols64, sol32, anchor, gt_pos, gt_vel = _run_both(
        anchor_shift=(1500.0, -1200.0, 400.0))
    est32 = anchor + np.asarray(sol32.delta, np.float64)
    est64 = np.asarray(sols64.position.state[:, :3])
    d = np.linalg.norm(est32 - est64, axis=1)
    assert d.max() < 0.1, d
    # delta really is km-scale (the f32 regime being claimed)
    assert np.linalg.norm(np.asarray(sol32.delta), axis=1).min() > 1000.0


def test_local_enu_output_matches_frame():
    sols64, sol32, anchor, gt_pos, gt_vel = _run_both()
    # ENU = R_enu @ delta, with R_enu at the anchor — cross-check against
    # the f64 pipeline's ENU output (same origin).
    np.testing.assert_allclose(np.asarray(sol32.enu, np.float64),
                               np.asarray(sols64.enu), atol=0.1)


def test_local_nan_on_masked_satellite_does_not_poison_epoch():
    """A NaN pseudorange/doppler on an already-masked satellite (the sim's
    own convention for a PRN absent from an epoch) must not spread through
    the dense f32 solve: NaN * 0 is NaN, so unsanitized los/weight rows
    would poison H = Jw^T Jw, freeze the epoch at the anchor, and still
    report valid=True. prep_epochs zeroes masked solver channels."""
    (store, iono, tows, prns, prs, dops, cn0s, valids, ref, gt_pos,
     gt_vel) = _make_epoch_log()
    cfg = pipeline.EpochConfig(apply_iono_correction=False)

    # Clean baseline with satellite 5 dropped by mask alone.
    valids_drop = np.asarray(valids).copy()
    valids_drop[:, 5] = False
    ep_clean = local.prep_epochs(store, iono, tows, prns, prs, dops, cn0s,
                                 jnp.asarray(valids_drop), ref, config=cfg)
    sol_clean = jax.jit(local.solve_epochs_local, static_argnums=1)(
        ep_clean, cfg)

    # Same mask, but the masked satellite's channels are NaN (as when the
    # PRN simply has no measurement this epoch).
    prs_nan = np.asarray(prs).copy()
    dops_nan = np.asarray(dops).copy()
    prs_nan[:, 5] = np.nan
    dops_nan[:, 5] = np.nan
    ep_nan = local.prep_epochs(store, iono, tows, prns,
                               jnp.asarray(prs_nan), jnp.asarray(dops_nan),
                               cn0s, jnp.asarray(valids_drop), ref,
                               config=cfg)
    for name in ("los", "y", "inv_rho0", "sag_coef", "sat_vel", "z0",
                 "weight"):
        assert bool(np.isfinite(np.asarray(getattr(ep_nan, name))).all()), \
            name
    sol_nan = jax.jit(local.solve_epochs_local, static_argnums=1)(
        ep_nan, cfg)

    assert bool(np.asarray(sol_nan.valid).all())
    np.testing.assert_allclose(np.asarray(sol_nan.delta),
                               np.asarray(sol_clean.delta), atol=1e-3)
    np.testing.assert_allclose(np.asarray(sol_nan.vel_ecef),
                               np.asarray(sol_clean.vel_ecef), atol=1e-4)
    assert bool(np.isfinite(np.asarray(sol_nan.gdop)).all())
    # And the solve really used the remaining satellites, not the anchor.
    est = np.asarray(ref)[None] + np.asarray(sol_nan.delta, np.float64)
    err = np.linalg.norm(est - gt_pos, axis=1)
    assert err.max() < 10.0
