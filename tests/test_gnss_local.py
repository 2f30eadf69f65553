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
