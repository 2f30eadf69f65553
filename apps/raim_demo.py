#!/usr/bin/env python
"""End-to-end GPS RAIM demo: the ``GPSRAIM_node`` user story as a CLI.

    python apps/raim_demo.py out_dir [--epochs 120] [--n-sats 8]
        [--fault-every 6] [--fault-magnitude 50] [--noise 2.0] [--seed 0]

The reference node (``GPSRAIM.cpp``) runs a 1 Hz timer: generate a
simulated constellation around the true receiver, inject a pseudorange
fault on a random satellite, solve iterated elevation-weighted WLS, run
the chi-square residual test, compute rigorous HPL/VPL protection
levels, attempt greedy fault exclusion, and publish covariance-ellipse /
protection-cylinder markers to RViz (``:251-303,395-725,823-918``).

This demo is the headless equivalent, TPU-style: ALL epochs simulate,
solve, test, and exclude in one jitted vmap batch (the per-epoch
fault-exclusion sweep is itself a vmap over leave-one-out subsets, so
the whole run is a single [epochs, n_sats] batched program). Outputs:

    out_dir/raim.csv        per-epoch: position error, test statistic,
                            detection/exclusion outcome, HPL/VPL
    out_dir/ellipse.jsonl   per-epoch covariance-ellipse + protection
                            cylinder geometry (the RViz marker stream,
                            ``publishPositionWithCovariance`` ``:823-918``)

and prints detection / false-alarm / exclusion-accuracy rates. Exit 0
iff every injected fault is detected and the false-alarm rate is < 10%.

ECEF magnitudes (~2.6e7 m) need f64, so this app pins the CPU backend —
same stance as ``apps/gnss_demo.py --device cpu`` (the on-chip f32
local-frame story lives in ``gnss/local.py``; RAIM's chi-square test is
scale-free but its WLS is ECEF, so the f64 oracle path is the honest
default here).
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
    ap.add_argument("--epochs", type=int, default=120)
    ap.add_argument("--n-sats", type=int, default=8)
    ap.add_argument("--fault-every", type=int, default=6,
                    help="inject a fault on every k-th epoch (0 = never)")
    ap.add_argument("--fault-magnitude", type=float, default=50.0)
    ap.add_argument("--noise", type=float, default=2.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp

    from toyslam_tpu.core.geodesy import lla_to_ecef
    from toyslam_tpu.gnss import raim
    from toyslam_tpu.sim import gps

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)

    E, S = args.epochs, args.n_sats
    receiver = lla_to_ecef(jnp.deg2rad(jnp.float64(22.3)),
                           jnp.deg2rad(jnp.float64(114.17)),
                           jnp.float64(50.0))
    sim_cfg = gps.GpsSimConfig(n_sats=S, noise_std=args.noise,
                               clock_bias=42.0, fault_magnitude=0.0)
    raim_cfg = raim.RaimConfig(noise_stddev_m=args.noise)

    key = jax.random.PRNGKey(args.seed)
    epoch_keys = jax.random.split(key, E)
    # Fault schedule: every k-th epoch biases one uniformly-drawn
    # satellite (the reference's random-index injection, ``:287-296``).
    faulted = (jnp.arange(E) % max(args.fault_every, 1) == 0) \
        if args.fault_every > 0 else jnp.zeros(E, bool)
    fault_sat = jax.vmap(
        lambda k: jax.random.randint(jax.random.fold_in(k, 7), (), 0, S)
    )(epoch_keys)
    fault_sat = jnp.where(faulted, fault_sat, -1)

    def one_epoch(k, f_idx):
        sim = gps.simulate_constellation(k, receiver, sim_cfg)
        pr = sim["pseudoranges"] + jnp.where(
            jnp.arange(S) == f_idx, args.fault_magnitude, 0.0)
        valid = jnp.ones(S, bool)
        # Cold start ~30 m off truth, zero clock — the reference seeds
        # its WLS from the (known) simulation site too (``:395-481``).
        init = jnp.concatenate(
            [receiver + jnp.asarray([30.0, -20.0, 10.0]), jnp.zeros(1)])
        det = raim.raim_detect(sim["sat_pos"], pr, valid, init, raim_cfg)
        excl, post_stat, best = raim.fault_exclusion(
            sim["sat_pos"], pr, valid, init, raim_cfg)
        # Exclusion is only attempted (and only meaningful) on detection;
        # mirror the reference's "exclude only when the test fails".
        excl = jnp.where(det.fault_detected, excl, -1)
        ellipse = raim.covariance_ellipse(det)
        return {
            "err_m": jnp.linalg.norm(det.state[:3] - receiver),
            "err_after_excl_m": jnp.linalg.norm(best.state[:3] - receiver),
            "test_stat": det.test_statistic,
            "detected": det.fault_detected,
            "excluded": excl,
            "post_stat": post_stat,
            "hpl": det.hpl,
            "vpl": det.vpl,
            "semi_major": ellipse["semi_major"],
            "semi_minor": ellipse["semi_minor"],
            "orientation_rad": ellipse["orientation_rad"],
            "sigma_up": ellipse["sigma_up"],
        }

    run = jax.jit(jax.vmap(one_epoch))
    res = {k: np.asarray(v) for k, v in run(epoch_keys, fault_sat).items()}
    fault_sat = np.asarray(fault_sat)
    faulted = np.asarray(faulted)

    with open(out / "raim.csv", "w") as f:
        f.write("epoch,fault_sat,err_m,err_after_excl_m,test_stat,"
                "detected,excluded,post_stat,hpl,vpl\n")
        for e in range(E):
            f.write(f"{e},{int(fault_sat[e])},{res['err_m'][e]:.3f},"
                    f"{res['err_after_excl_m'][e]:.3f},"
                    f"{res['test_stat'][e]:.3f},{int(res['detected'][e])},"
                    f"{int(res['excluded'][e])},{res['post_stat'][e]:.3f},"
                    f"{res['hpl'][e]:.3f},{res['vpl'][e]:.3f}\n")

    with open(out / "ellipse.jsonl", "w") as f:
        for e in range(E):
            f.write(json.dumps({
                "epoch": e,
                "semi_major_m": round(float(res["semi_major"][e]), 4),
                "semi_minor_m": round(float(res["semi_minor"][e]), 4),
                "orientation_rad": round(float(res["orientation_rad"][e]), 5),
                "sigma_up_m": round(float(res["sigma_up"][e]), 4),
                "hpl_m": round(float(res["hpl"][e]), 3),
                "vpl_m": round(float(res["vpl"][e]), 3),
            }) + "\n")

    det_rate = float(res["detected"][faulted].mean()) if faulted.any() else 1.0
    fa_rate = float(res["detected"][~faulted].mean()) if (~faulted).any() else 0.0
    hits = res["excluded"][faulted] == fault_sat[faulted]
    excl_acc = float(hits.mean()) if faulted.any() else 1.0
    clean_err = float(np.sqrt(np.mean(res["err_m"][~faulted] ** 2)))
    print(f"epochs: {E} ({int(faulted.sum())} faulted, "
          f"{args.fault_magnitude:.0f} m bias)")
    print(f"detection rate on faulted epochs: {det_rate:.2%}; "
          f"false alarms on clean epochs: {fa_rate:.2%}")
    print(f"exclusion picks the injected satellite: {excl_acc:.2%}")
    print(f"clean-epoch position RMSE {clean_err:.2f} m; "
          f"mean HPL {res['hpl'].mean():.1f} m, VPL {res['vpl'].mean():.1f} m")
    print(f"wrote {out}/raim.csv, ellipse.jsonl")
    return 0 if (det_rate == 1.0 and fa_rate < 0.1) else 1


if __name__ == "__main__":
    sys.exit(main())
