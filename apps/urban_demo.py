#!/usr/bin/env python
"""End-to-end urban-canyon GNSS demo: the ``RangingRC`` + ``user_teleop``
user story as a CLI.

    python apps/urban_demo.py out_dir [--epochs 40] [--n-sats 24]
        [--length 60] [--speed 3] [--seed 0] [--raim/--no-raim]

The reference pair drives a teleop trajectory through a simulated street
canyon and, per epoch, Kepler-propagates the constellation, ray-traces
every signal against the building AABBs (LOS / blocked /
single-bounce-multipath with reflected-segment blockage checks), applies
the full pseudorange error budget (iono, tropo, multipath extra path,
C/N0-dependent receiver noise, receiver clock walk), and publishes
pseudoranges + a colored skyplot + DOP text to RViz
(``RangingRC.cpp:135-266,379-542,996-1131,1447-1916,1917-3583``).

This demo is the headless equivalent: a circuit drive
(``generateCircuitTrajectory`` parity, ``sim/trajectories.circuit``)
down a two-row street canyon, one `lax.scan` over epochs, writing

    out_dir/skyplot.jsonl       per-epoch per-satellite az/el/CN0/class
                                (los|blocked|multipath) + GDOP/PDOP/HDOP/
                                VDOP of the usable geometry
    out_dir/pseudoranges.csv    the per-satellite observation stream
                                (pr, cn0, class, iono, tropo, usable)

and, with --raim (default), re-simulates the same drive with the
atmosphere off (clean geometric ranges; identical geometry/classes) and
runs SPP + RAIM per epoch — printing how often the chi-square test
flags the epochs the ray tracer says contain a large NLOS multipath
error. Exit 0 iff RAIM detects >= half of those epochs (matching the
acceptance bound of ``test_canyon_drive_raim_flags_ray_traced_nlos``).

f64 on CPU: ECEF-scale orbit propagation (same stance as gnss_demo cpu).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def _street_canyon(jnp, n_blocks: int, half_len: float):
    """Two rows of buildings flanking a street along x (the reference's
    canyon world): street |y| < 15, walls 28 m deep, 45 m tall."""
    mins, maxs = [], []
    pitch = 2.0 * half_len / n_blocks
    for i in range(n_blocks):
        x0 = -half_len + pitch * i
        x1 = x0 + pitch - 4.0  # 4 m gaps between blocks (cross streets)
        mins.append([x0, 15.0, 0.0])
        maxs.append([x1, 45.0, 45.0])
        mins.append([x0, -45.0, 0.0])
        maxs.append([x1, -15.0, 45.0])
    B = len(mins)
    from toyslam_tpu.sim import urban

    return urban.Buildings(
        min_xyz=jnp.asarray(mins, jnp.float64),
        max_xyz=jnp.asarray(maxs, jnp.float64),
        attenuation_db=jnp.full((B,), 40.0, jnp.float64),
        reflectivity=jnp.full((B,), 0.6, jnp.float64),
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--n-sats", type=int, default=24)
    ap.add_argument("--length", type=float, default=60.0,
                    help="circuit length (m); street spans +-length/2 - 10")
    ap.add_argument("--speed", type=float, default=3.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--raim", action=argparse.BooleanOptionalAction,
                    default=True)
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp

    from toyslam_tpu.core.geodesy import (ecef_to_enu_rotation, lla_to_ecef)
    from toyslam_tpu.gnss import pipeline, raim
    from toyslam_tpu.sim import trajectories, urban

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)

    T, S = args.epochs, args.n_sats
    city = _street_canyon(jnp, n_blocks=3, half_len=args.length / 2 + 10)
    ref_lla = jnp.asarray([np.deg2rad(22.3), np.deg2rad(114.17), 50.0],
                          jnp.float64)
    eph = pipeline.synthetic_constellation(S, toe=1000.0)

    times = 1000.0 + jnp.arange(T, dtype=jnp.float64)
    # Circuit down the street: width 14 keeps |y| <= 7 (street is |y|<15).
    traj = trajectories.circuit(times - times[0], length=args.length,
                                width=14.0, speed=args.speed, z=1.5)
    track = traj["pos"]

    key = jax.random.PRNGKey(args.seed)
    sim = urban.simulate_urban_epochs(key, track, times, eph, city, ref_lla)

    # ---- skyplot.jsonl (with per-epoch DOP) ----
    recs = urban.skyplot_records(sim, times=np.asarray(times))
    with open(out / "skyplot.jsonl", "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")

    # ---- pseudoranges.csv: the observation stream ----
    prs = np.asarray(sim["pseudoranges"])
    budget = sim["budget"]
    cn0 = np.asarray(budget.cn0)
    usable = np.asarray(budget.usable)
    multipath = np.asarray(budget.multipath)
    blocked = np.asarray(budget.blocked)
    iono = np.asarray(sim["iono_m"])
    tropo = np.asarray(sim["tropo_m"])
    with open(out / "pseudoranges.csv", "w") as f:
        f.write("t,sat,pseudorange,cn0,class,usable,iono_m,tropo_m\n")
        for e in range(T):
            for s in range(S):
                cls = ("multipath" if multipath[e, s]
                       else "blocked" if blocked[e, s] else "los")
                f.write(f"{float(times[e]):.1f},{s + 1},"
                        f"{prs[e, s]:.3f},{cn0[e, s]:.1f},{cls},"
                        f"{int(usable[e, s])},{iono[e, s]:.3f},"
                        f"{tropo[e, s]:.3f}\n")

    n_los = int((usable & ~multipath).sum())
    n_mp = int((usable & multipath).sum())
    n_blk = int(blocked.sum())
    pdops = [r["pdop"] for r in recs if np.isfinite(r["pdop"])]
    print(f"epochs: {T}, sats: {S}, buildings: {len(city.attenuation_db)}")
    print(f"signals: {n_los} LOS, {n_mp} NLOS-multipath, {n_blk} blocked; "
          f"median PDOP {np.median(pdops):.2f}")
    print(f"wrote {out}/skyplot.jsonl, pseudoranges.csv")
    if not args.raim:
        return 0

    # ---- RAIM on the clean-geometry rerun (same key -> same ray tracing,
    # so the NLOS extra path is the only systematic error) ----
    sim_c = urban.simulate_urban_epochs(
        key, track, times, eph, city, ref_lla,
        clock_bias_m=jnp.full((T,), 30.0, jnp.float64),
        apply_atmosphere=False)
    b = sim_c["budget"]
    usable_c = np.asarray(b.usable)
    pr_err = np.asarray(b.pseudorange_error)
    nlos_big = usable_c & np.asarray(b.multipath) & (pr_err > 10.0)
    cand = np.where(nlos_big.any(1) & (usable_c.sum(1) >= 6))[0]
    if len(cand) == 0:
        print("RAIM stage: no big-NLOS epochs with >= 6 usable sats; "
              "geometry too open — rerun with a longer drive")
        return 0

    ref_ecef = np.asarray(lla_to_ecef(ref_lla[0], ref_lla[1], ref_lla[2]))
    R = np.asarray(ecef_to_enu_rotation(ref_lla[0], ref_lla[1]))
    prs_c = np.asarray(sim_c["pseudoranges"])
    sat_enu = np.asarray(sim_c["sat_enu"])
    init = jnp.concatenate([jnp.asarray(ref_ecef), jnp.zeros(1, jnp.float64)])
    detect = jax.jit(raim.raim_detect)
    hits = 0
    for e in cand:
        sat_ecef = sat_enu[e] @ R + ref_ecef  # ENU -> ECEF (rows = enu)
        valid = jnp.asarray(usable_c[e] & np.isfinite(prs_c[e]))
        res = detect(jnp.asarray(sat_ecef),
                     jnp.asarray(np.nan_to_num(prs_c[e])), valid, init)
        hits += int(res.fault_detected)
    rate = hits / len(cand)
    print(f"RAIM flags {hits}/{len(cand)} ray-traced big-NLOS epochs "
          f"({rate:.0%})")
    return 0 if rate >= 0.5 else 1


if __name__ == "__main__":
    sys.exit(main())
