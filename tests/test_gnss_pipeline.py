"""Closed-loop tests for the GNSS epoch pipeline (gnss/pipeline.py):
simulated Kepler constellation over a moving receiver -> pseudorange +
Doppler epochs -> SPP/velocity trajectory with an ATE bound (VERDICT r1
item 5 acceptance)."""

import numpy as np
import jax
import jax.numpy as jnp

from toyslam_tpu.core.geodesy import (
    SPEED_OF_LIGHT, EARTH_ROTATION_RATE, ecef_to_enu_rotation, ecef_to_lla,
    lla_to_ecef)
from toyslam_tpu.gnss import atmosphere, pipeline, spp
from toyslam_tpu.gnss.ephemeris import sat_pos_vel_clock

HK = jnp.asarray([22.3 * jnp.pi / 180, 114.17 * jnp.pi / 180, 50.0],
                 jnp.float64)


def _make_epoch_log(n_epochs=12, n_sats=24, noise_std=1.5, seed=0,
                    clock_bias_m=42.0, vel_enu=(1.5, 0.5, 0.0)):
    """Receiver on a straight ENU track; measurements generated from the
    same Kepler model the pipeline uses, plus noise and a receiver clock."""
    rng = np.random.default_rng(seed)
    eph = pipeline.synthetic_constellation(n_sats, toe=1000.0)
    store = pipeline.store_init()
    for k in range(n_sats):
        one = jax.tree_util.tree_map(lambda x: x[k], eph)
        store = store.update(one)

    ref = lla_to_ecef(HK[0], HK[1], HK[2])
    R = ecef_to_enu_rotation(HK[0], HK[1])
    v_ecef = jnp.matmul(R.T, jnp.asarray(vel_enu, jnp.float64))

    tows, prns, prs, dops, cn0s, valids, gt = [], [], [], [], [], [], []
    for e in range(n_epochs):
        tow = 1000.0 + e * 1.0
        pos = ref + v_ecef * (e * 1.0)
        # The pipeline evaluates satellites at TRANSMIT time (tow - pr/c);
        # generate measurements at the same point via one light-time
        # fixed-point iteration so the model is self-consistent.
        sat = sat_pos_vel_clock(eph, jnp.full((n_sats,), tow, jnp.float64))
        r0 = jnp.linalg.norm(sat["pos"] - pos, axis=-1)
        for _ in range(2):
            sat = sat_pos_vel_clock(eph, tow - r0 / SPEED_OF_LIGHT)
            r0 = jnp.linalg.norm(sat["pos"] - pos, axis=-1)
        el, az = spp.elevation_azimuth(sat["pos"], pos)
        trop = 2.3 / jnp.maximum(jnp.sin(jnp.abs(el)), 0.1)
        state_true = jnp.concatenate(
            [pos, jnp.asarray([clock_bias_m], jnp.float64)])
        obs_true = spp.SatelliteObs(
            pos=sat["pos"], pseudorange=r0, clock_bias=sat["clock_bias"],
            iono_delay=jnp.zeros(n_sats, jnp.float64), trop_delay=trop,
            tgd=eph.tgd, weight=jnp.ones(n_sats, jnp.float64),
            valid=jnp.ones(n_sats, bool))
        pr = (spp.predicted_pseudorange(state_true, obs_true)
              + noise_std * rng.standard_normal(n_sats))
        los = (sat["pos"] - pos) / r0[:, None]
        # range_rate channel Z solves: los.(v_sat - v_rx) = measured terms
        rr = (jnp.sum(los * v_ecef, -1) - jnp.sum(los * sat["vel"], -1)
              - (EARTH_ROTATION_RATE / SPEED_OF_LIGHT
                 * (sat["vel"][:, 0] * pos[1] - sat["vel"][:, 1] * pos[0]))
              + sat["clock_drift"] * SPEED_OF_LIGHT
              + 0.05 * rng.standard_normal(n_sats))
        tows.append(tow)
        prns.append(np.arange(1, n_sats + 1))
        prs.append(np.asarray(pr))
        dops.append(np.asarray(rr))
        cn0s.append(np.full(n_sats, 45.0))
        valids.append(np.asarray(el) > 0)  # below-horizon sats invalid
        gt.append(np.asarray(pos))
    iono = atmosphere.IonoParams(
        alpha=jnp.zeros(4, jnp.float64), beta=jnp.zeros(4, jnp.float64))
    return (store, iono, jnp.asarray(tows, jnp.float64),
            jnp.asarray(np.stack(prns), jnp.int32),
            jnp.asarray(np.stack(prs)), jnp.asarray(np.stack(dops)),
            jnp.asarray(np.stack(cn0s), jnp.float64),
            jnp.asarray(np.stack(valids)), ref, np.stack(gt),
            np.asarray(jnp.matmul(R.T, jnp.asarray(vel_enu, jnp.float64))))


def test_epoch_pipeline_closed_loop():
    (store, iono, tows, prns, prs, dops, cn0s, valids, ref, gt_pos,
     gt_vel) = _make_epoch_log()
    cfg = pipeline.EpochConfig(apply_iono_correction=False)
    sols = pipeline.run_epochs(store, iono, tows, prns, prs, dops, cn0s,
                               valids, ref, config=cfg)
    est = np.asarray(sols.position.state[:, :3])
    assert bool(np.asarray(sols.position.valid).all())
    err = np.linalg.norm(est - gt_pos, axis=1)
    ate = np.sqrt(np.mean(err ** 2))
    # 1.5 m pseudorange noise, ~8-9 used satellites, PDOP ~2 => a few
    # meters of solution scatter is the physical floor
    assert ate < 5.0, (ate, err)
    # clock bias recovered
    cb = np.asarray(sols.position.state[:, 3])
    assert np.abs(cb - 42.0).max() < 3.0, cb
    # velocity solution tracks the constant ECEF velocity
    v = np.asarray(sols.velocity.vel_ecef)
    ok = np.asarray(sols.velocity.valid)
    assert ok.all()
    assert np.linalg.norm(v - gt_vel, axis=1).max() < 0.5, v
    # DOP sane for an open-sky constellation
    assert float(np.median(np.asarray(sols.position.pdop))) < 6.0
    # skyplot record marks only above-mask satellites used
    used = np.asarray(sols.record.used)
    el = np.asarray(sols.record.elevation)
    assert (el[used] >= np.deg2rad(10.0) - 1e-9).all()


def test_ephemeris_store_replace_and_age_gate():
    eph = pipeline.synthetic_constellation(4, toe=1000.0)
    store = pipeline.store_init()
    for k in range(4):
        store = store.update(jax.tree_util.tree_map(lambda x: x[k], eph))
    # replace PRN 2 with a fresher toe
    new = jax.tree_util.tree_map(lambda x: x[1], eph)
    new = new._replace(toe_sec=jnp.asarray(5000.0, jnp.float64),
                       toc_sec=jnp.asarray(5000.0, jnp.float64))
    store = store.update(new)
    got = store.lookup(jnp.asarray([1, 2, 3, 31], jnp.int32))
    np.testing.assert_allclose(np.asarray(got.toe_sec)[:3],
                               [1000.0, 5000.0, 1000.0])
    # PRN 31 was never stored -> invalid
    assert not bool(got.valid[3])
    # age gate: a transmit time 3 h past toe invalidates the satellite
    sat = sat_pos_vel_clock(got, jnp.asarray([1500.0, 1500.0, 1500.0 + 3 * 3600,
                                              1500.0], jnp.float64))
    assert bool(sat["valid"][0])
    assert not bool(sat["valid"][2])


def test_cn0_and_elevation_masks():
    (store, iono, tows, prns, prs, dops, cn0s, valids, ref, gt_pos,
     gt_vel) = _make_epoch_log(n_epochs=2)
    low_cn0 = cn0s.at[:, 0].set(5.0)  # below min_cn0 10
    cfg = pipeline.EpochConfig(apply_iono_correction=False)
    sol = pipeline.process_epoch(
        store, iono, tows[0], prns[0], prs[0], dops[0], low_cn0[0],
        valids[0], ref, config=cfg)
    assert not bool(sol.record.used[0])
    # elevation filter disabled -> below-mask sats may enter
    cfg2 = pipeline.EpochConfig(apply_iono_correction=False,
                                disable_elevation_filter=True,
                                cut_off_degree=60.0)
    sol2 = pipeline.process_epoch(
        store, iono, tows[0], prns[0], prs[0], dops[0], cn0s[0],
        valids[0], ref, config=cfg2)
    assert int(np.asarray(sol2.record.used).sum()) \
        >= int(np.asarray(sol.record.used).sum())
