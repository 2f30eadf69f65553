#!/usr/bin/env python
"""Fast iteration harness for the 256k odometry headline metrics.

Times ONLY the shipped-default and exact-control-flow 256k configs with
bench.py's verified elision-proof recipe (same scan stack, same S=32), so
kernel/map-build changes can be measured in ~2 min instead of a full
bench.py run. Numbers match BENCH_rNN's
``odometry_scans_per_sec_256kpt_synthetic`` keys.
"""

import sys
sys.path.insert(0, "/root/repo")

import argparse
import json

import numpy as np

import bench as B


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-exact", action="store_true")
    ap.add_argument("--s2", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from toyslam_tpu.core import pcd_io
    from toyslam_tpu.pipelines import odometry as odo

    print("backend:", jax.default_backend(), file=sys.stderr)
    target_np = pcd_io.read_pcd("/root/reference/ndt_omp/data/251370668.pcd")
    S2 = args.s2
    big_np = B._big_scans(target_np, S2)
    big_masks = jax.device_put(jnp.ones((S2, 262144), bool))
    out = {}

    cfg_default = odo.OdometryConfig(work_capacity=24576)
    out["odometry_scans_per_sec_256kpt_synthetic"] = round(
        B.bench_odometry(jax, jnp, odo, big_np, big_masks, cfg_default, S2,
                         floor_out=out,
                         floor_key="odometry_256kpt_pct_of_gather_floor"), 2)
    if not args.skip_exact:
        cfg_exact = cfg_default._replace(
            ndt=cfg_default.ndt._replace(frozen_linesearch=False,
                                         regather_iterations=1 << 30))
        out["odometry_exact_scans_per_sec_256kpt_synthetic"] = round(
            B.bench_odometry(
                jax, jnp, odo, big_np, big_masks, cfg_exact, S2,
                floor_out=out,
                floor_key="odometry_exact_256kpt_pct_of_gather_floor"), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
