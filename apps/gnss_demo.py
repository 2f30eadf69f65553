#!/usr/bin/env python
"""End-to-end GNSS SPP demo: the epoch pipeline as a CLI.

The ``gnssSpp`` node user story without ROS:

    python apps/gnss_demo.py out_dir [--epochs 60] [--noise 1.5]
        [--n-sats 24] [--seed 0] [--speed 1.5] [--device cpu|tpu]

Simulates a Kepler constellation over a moving receiver (Hong Kong
reference point), feeds pseudorange + Doppler epochs through the ephemeris
store -> masks/weights -> WLS position + Doppler velocity pipeline, and
writes:

    out_dir/gnss_position.csv   the reference's CSV column set
                                (``gnssSpp.cpp:1086-1108``)
    out_dir/skyplot.jsonl       per-epoch per-satellite az/el/CN0/used —
                                the headless skyplot/DOP stream
                                (``RangingRC.cpp:1917-3497`` equivalent)
    out_dir/solution.csv        EvaPos-compatible ENU trajectory

and prints the ENU ATE vs ground truth.

``--device cpu`` (default) runs the f64 ECEF pipeline (``gnss/pipeline``).
``--device tpu`` runs the TPU-native path (``gnss/local``): f64 host prep
linearizes each epoch about the reference anchor, then the whole epoch log
solves ON-CHIP in f32 as one ``lax.scan`` (position GN + Doppler velocity
+ DOP), parity < 0.1 m vs the f64 pipeline (tests/test_gnss_local.py).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--noise", type=float, default=1.5)
    ap.add_argument("--n-sats", type=int, default=24)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--speed", type=float, default=1.5)
    ap.add_argument("--device", choices=("cpu", "tpu"), default="cpu",
                    help="cpu: f64 ECEF pipeline; tpu: f32 on-chip "
                         "local-frame solver (f64 prep stays on host)")
    ap.add_argument("--bag", default=None,
                    help="replay gnss_comm/GnssMeasMsg epochs from a ROS1 "
                         "bag (the reference's rawMeasCallback input, "
                         "gnssSpp.cpp:827) instead of simulating "
                         "measurements; the constellation/ephemeris still "
                         "comes from --n-sats/--seed")
    ap.add_argument("--write-bag", default=None,
                    help="also dump the simulated epochs as real-format "
                         "gnss_comm/GnssMeasMsg records (lz4 bag)")
    args = ap.parse_args(argv)

    import jax

    # Orbit propagation needs f64 (sub-meter at 2.6e7 m radii) — always on
    # the host CPU. In cpu mode the solve runs there too; in tpu mode only
    # the f32 local-frame solve dispatches to the chip.
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    cpu0 = jax.devices("cpu")[0]

    import jax.numpy as jnp

    from toyslam_tpu.core.geodesy import (
        SPEED_OF_LIGHT, EARTH_ROTATION_RATE, ecef_to_enu_rotation,
        ecef_to_lla, lla_to_ecef)
    from toyslam_tpu.gnss import atmosphere, pipeline, spp
    from toyslam_tpu.gnss.ephemeris import sat_pos_vel_clock
    from toyslam_tpu.utils import evalio

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)

    lat0, lon0 = np.deg2rad(22.3), np.deg2rad(114.17)
    import contextlib

    host = jax.default_device(cpu0) if args.device == "tpu" \
        else contextlib.nullcontext()
    host.__enter__()  # f64 simulation + prep stay on the host CPU
    ref = lla_to_ecef(jnp.float64(lat0), jnp.float64(lon0), jnp.float64(50.0))
    R = ecef_to_enu_rotation(jnp.float64(lat0), jnp.float64(lon0))
    v_ecef = jnp.matmul(R.T, jnp.asarray([args.speed, 0.4, 0.0], jnp.float64))

    eph = pipeline.synthetic_constellation(args.n_sats, toe=1000.0)
    store = pipeline.store_init()
    for k in range(args.n_sats):
        store = store.update(jax.tree_util.tree_map(lambda x: x[k], eph))
    iono = atmosphere.IonoParams(alpha=jnp.zeros(4, jnp.float64),
                                 beta=jnp.zeros(4, jnp.float64))

    # ---- simulate the epoch log (transmit-time-consistent) ----
    S = args.n_sats
    tows, prs, rrs, cn0s, valids, gt = [], [], [], [], [], []
    cb_m = 42.0
    for e in range(args.epochs):
        tow = 1000.0 + e
        pos = ref + v_ecef * float(e)
        sat = sat_pos_vel_clock(eph, jnp.full((S,), tow, jnp.float64))
        r0 = jnp.linalg.norm(sat["pos"] - pos, axis=-1)
        for _ in range(2):
            sat = sat_pos_vel_clock(eph, tow - r0 / SPEED_OF_LIGHT)
            r0 = jnp.linalg.norm(sat["pos"] - pos, axis=-1)
        el, _az = spp.elevation_azimuth(sat["pos"], pos)
        trop = 2.3 / jnp.maximum(jnp.sin(jnp.abs(el)), 0.1)
        state_true = jnp.concatenate([pos, jnp.asarray([cb_m], jnp.float64)])
        obs_true = spp.SatelliteObs(
            pos=sat["pos"], pseudorange=r0, clock_bias=sat["clock_bias"],
            iono_delay=jnp.zeros(S, jnp.float64), trop_delay=trop,
            tgd=eph.tgd, weight=jnp.ones(S, jnp.float64),
            valid=jnp.ones(S, bool))
        pr = (spp.predicted_pseudorange(state_true, obs_true)
              + args.noise * rng.standard_normal(S))
        los = (sat["pos"] - pos) / r0[:, None]
        rr = (jnp.sum(los * v_ecef, -1) - jnp.sum(los * sat["vel"], -1)
              - (EARTH_ROTATION_RATE / SPEED_OF_LIGHT
                 * (sat["vel"][:, 0] * pos[1] - sat["vel"][:, 1] * pos[0]))
              + sat["clock_drift"] * SPEED_OF_LIGHT
              + 0.05 * rng.standard_normal(S))
        tows.append(tow)
        prs.append(np.asarray(pr))
        rrs.append(np.asarray(rr))
        cn0s.append(np.clip(45.0 + 5.0 * rng.standard_normal(S), 25, 55))
        valids.append(np.asarray(el) > 0)
        gt.append(np.asarray(pos))
    gt = np.stack(gt)

    # GPS L1 wavelength: the bag carries Doppler in Hz (the receiver
    # convention — positive when approaching); the pipeline consumes range
    # rate = -dopp * lambda (``gnssSpp.cpp:1207``).
    wavelength = SPEED_OF_LIGHT / 1575.42e6
    if args.write_bag:
        from toyslam_tpu.runtime import rosbag as rosbag_io

        week = 2300
        records = []
        for e in range(args.epochs):
            use = np.asarray(valids[e])
            sats = np.arange(1, S + 1, dtype=np.int32)[use]
            records.append((
                "/ublox_driver/range_meas", "gnss_comm/GnssMeasMsg",
                float(tows[e]),
                rosbag_io.encode_gnss_meas(
                    week, float(tows[e]), sats, np.asarray(prs[e])[use],
                    np.asarray(cn0s[e])[use],
                    -np.asarray(rrs[e])[use] / wavelength,
                    stamp_sec=float(tows[e]))))
        rosbag_io.write_mixed_bag(args.write_bag, records,
                                  compression="lz4")
        print(f"wrote GNSS measurement bag: {args.write_bag}")

    if args.bag:
        from toyslam_tpu.runtime import rosbag as rosbag_io

        epochs_in = rosbag_io.pack_bag_gnss_meas(args.bag)
        if not epochs_in:
            raise SystemExit("bag contains no GnssMeasMsg epochs")
        E = len(epochs_in)
        tows = [ep["tow"] for ep in epochs_in]
        prs = [np.zeros(S) for _ in range(E)]
        rrs = [np.zeros(S) for _ in range(E)]
        cn0s = [np.zeros(S) for _ in range(E)]
        valids = [np.zeros(S, bool) for _ in range(E)]
        for e, ep in enumerate(epochs_in):
            for i, prn_i in enumerate(ep["sats"]):
                s = int(prn_i) - 1
                if not (0 <= s < S):
                    continue  # PRN outside the loaded constellation
                prs[e][s] = ep["psr"][i]
                rrs[e][s] = -ep["dopp"][i] * wavelength
                cn0s[e][s] = ep["cn0"][i]
                valids[e][s] = np.isfinite(ep["psr"][i])
        args.epochs = E
        gt = None
        print(f"bag: {E} GnssMeas epochs, median sats/epoch "
              f"{int(np.median([len(ep['sats']) for ep in epochs_in]))}")

    prn = jnp.tile(jnp.arange(1, S + 1, dtype=jnp.int32)[None], (args.epochs, 1))
    cfg = pipeline.EpochConfig(apply_iono_correction=False)
    log_args = (store, iono, jnp.asarray(tows, jnp.float64), prn,
                jnp.asarray(np.stack(prs)), jnp.asarray(np.stack(rrs)),
                jnp.asarray(np.stack(cn0s), jnp.float64),
                jnp.asarray(np.stack(valids)), ref)

    if args.device == "tpu":
        from toyslam_tpu.gnss import local

        ep = local.prep_epochs(*log_args, config=cfg)  # f64 host prep
        host.__exit__(None, None, None)
        ep = jax.device_put(ep, jax.devices()[0])  # f32 leaves -> chip
        solve = jax.jit(local.solve_epochs_local, static_argnums=1)
        sol = jax.block_until_ready(solve(ep, cfg))
        # No naive timing print here: repeated dispatches get elided by
        # the runtime (docs/TPU_NOTES.md "Honest measurement");
        # bench.py's gnss_epochs_per_sec_f32 is the verified number.
        print(f"on-chip f32 local-frame solve ({jax.default_backend()}): "
              f"{args.epochs} epochs")
        est_xyz = np.asarray(ref)[None] + np.asarray(sol.delta, np.float64)
        est = np.concatenate(
            [est_xyz, np.asarray(sol.clock_bias, np.float64)[:, None]], 1)
        enu = np.asarray(sol.enu, np.float64)
        # One batched f64 conversion on the host CPU (ecef_to_lla is fully
        # batch-capable); a per-epoch loop here costs E dispatches.
        with jax.default_device(cpu0):
            lla = np.asarray(ecef_to_lla(jnp.asarray(est_xyz)))
        num_sats = np.asarray(sol.num_sats)
        pdop, hdop = np.asarray(sol.pdop), np.asarray(sol.hdop)
        vdop, tdop = np.asarray(sol.vdop), np.asarray(sol.tdop)
        rec_prn, rec_el = np.asarray(ep.prn), np.asarray(ep.elevation)
        rec_az, rec_cn0 = np.asarray(ep.azimuth), np.asarray(ep.cn0)
        rec_used = np.asarray(ep.valid)
        vel_enu = np.asarray(sol.vel_enu, np.float64)
        vel_valid = np.asarray(sol.vel_valid)
    else:
        run = jax.jit(lambda *a: pipeline.run_epochs(*a, config=cfg))
        sols = run(*log_args)
        host.__exit__(None, None, None)
        est = np.asarray(sols.position.state)
        enu = np.asarray(sols.enu)
        lla = np.asarray(sols.lla)
        num_sats = np.asarray(sols.position.num_sats)
        pdop, hdop = (np.asarray(sols.position.pdop),
                      np.asarray(sols.position.hdop))
        vdop, tdop = (np.asarray(sols.position.vdop),
                      np.asarray(sols.position.tdop))
        rec_prn = np.asarray(sols.record.prn)
        rec_el = np.asarray(sols.record.elevation)
        rec_az = np.asarray(sols.record.azimuth)
        rec_cn0 = np.asarray(sols.record.cn0)
        rec_used = np.asarray(sols.record.used)
        vel_enu = np.asarray(sols.velocity.vel_enu)
        vel_valid = np.asarray(sols.velocity.valid)

    gt_enu = None if gt is None else np.einsum(
        "ij,ej->ei", np.asarray(R), gt - np.asarray(ref))

    # ---- gnss_position.csv: the reference's column set (:1086-1108) ----
    week = 2300
    with open(out / "gnss_position.csv", "w") as f:
        f.write("time,gps_week,gps_tow,latitude,longitude,altitude,"
                "ecef_x,ecef_y,ecef_z,enu_e,enu_n,enu_u,clock_bias,"
                "num_satellites,pdop,hdop,vdop,tdop\n")
        for e in range(args.epochs):
            f.write(
                f"{tows[e]:.6f},{week},{tows[e]:.6f},"
                f"{np.rad2deg(lla[e, 0]):.9f},{np.rad2deg(lla[e, 1]):.9f},"
                f"{lla[e, 2]:.4f},"
                f"{est[e, 0]:.4f},{est[e, 1]:.4f},{est[e, 2]:.4f},"
                f"{enu[e, 0]:.4f},{enu[e, 1]:.4f},{enu[e, 2]:.4f},"
                f"{est[e, 3]:.4f},{int(num_sats[e])},"
                f"{pdop[e]:.3f},{hdop[e]:.3f},{vdop[e]:.3f},{tdop[e]:.3f}\n")

    # ---- skyplot.jsonl: per-epoch per-satellite stream ----
    with open(out / "skyplot.jsonl", "w") as f:
        for e in range(args.epochs):
            f.write(json.dumps({
                "tow": float(tows[e]),
                "pdop": float(pdop[e]),
                "hdop": float(hdop[e]),
                "sats": [
                    {"prn": int(rec_prn[e, s]),
                     "el_deg": round(float(np.rad2deg(rec_el[e, s])), 2),
                     "az_deg": round(float(np.rad2deg(rec_az[e, s])), 2),
                     "cn0": round(float(rec_cn0[e, s]), 1),
                     "used": bool(rec_used[e, s])}
                    for s in range(S)
                ]}) + "\n")

    # ---- EvaPos-compatible ENU solution ----
    T = np.tile(np.eye(4), (args.epochs, 1, 1))
    T[:, :3, 3] = enu
    traj = evalio.from_transforms(np.asarray(tows), T, vel=vel_enu)
    evalio.write_evapos_csv(out / "solution.csv", traj)

    print(f"epochs: {args.epochs}, used sats (median): "
          f"{int(np.median(num_sats))}")
    if gt_enu is not None:
        err = np.linalg.norm(enu - gt_enu, axis=1)
        ate = float(np.sqrt(np.mean(err ** 2)))
        print(f"ENU ATE vs ground truth: {ate:.3f} m "
              f"(pseudorange noise {args.noise} m)")
    else:
        spread = np.linalg.norm(enu - enu.mean(0), axis=1)
        print(f"bag replay: ENU spread RMS {float(np.sqrt(np.mean(spread**2))):.3f} m")
    print(f"velocity valid: {int(vel_valid.sum())}/{args.epochs}")
    print(f"wrote {out}/gnss_position.csv, skyplot.jsonl, solution.csv")
    return 0


if __name__ == "__main__":
    sys.exit(main())
