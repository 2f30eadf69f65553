#!/usr/bin/env python
"""A/B the 64-way fleet with the default vs flattened batched gather.

The fleet's remaining profile is ~63% batched stats gathers at ~26 ns/row —
2x the single-lane row-gather rate (docs/TPU_NOTES.md). The flattened
lowering (ops/gatherflat.py) turns the [B, NK] -> [B, NK, 16] batched
gather into ONE single-level gather over a [B*cap, 16] operand; values are
bit-identical, so whichever is faster can ship. Whether it wins depends on
how gather rate scales with table size (measured flat to 8k rows,
13-16 ns/row at 16-32k; the flattened fleet table is B*cap rows) — only
this on-chip measurement settles it.

Usage: python benchmarks/profile_fleet_gather.py [--B 64] [--reps 3]
Prints one JSON line: agg scans/s for both lowerings + equality check.
"""

import sys
sys.path.insert(0, "/root/repo")

import argparse
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=64)
    ap.add_argument("--S", type=int, default=4)
    ap.add_argument("--cap", type=int, default=16384)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from bench import _jit_with_probe, _timed
    from toyslam_tpu.core import pcd_io
    from toyslam_tpu.ops import gatherflat
    from toyslam_tpu.pipelines import fusion as fus
    from toyslam_tpu.pipelines import odometry as odo

    target_np = pcd_io.read_pcd("/root/reference/ndt_omp/data/251370668.pcd")

    B, S, R, cap = args.B, args.S, 20, args.cap
    rng = np.random.default_rng(1)
    base = target_np[
        rng.choice(len(target_np), cap, replace=False)].astype(np.float32)
    xyzi = np.zeros((B, S, cap, 4), np.float32)
    for b in range(B):
        for s in range(S):
            pts = base.copy()
            pts[:, 0] += 0.3 * s + 0.01 * b
            pts[:, 1] += 0.1 * s
            xyzi[b, s] = pts
    mask = np.ones((B, S, cap), bool)
    imu_acc = np.tile(np.asarray([0.0, 0.0, 9.81], np.float32), (B, S * R, 1))
    imu_gyro = np.zeros((B, S * R, 3), np.float32)
    imu_dt = np.full((B, S * R), 0.005, np.float32)

    cfg = fus.FusionConfig(
        odometry=odo.OdometryConfig(work_capacity=8192), imu_per_scan=R)

    rest = tuple(map(jax.device_put, (jnp.asarray(mask),
                                      jnp.asarray(imu_acc),
                                      jnp.asarray(imu_gyro),
                                      jnp.asarray(imu_dt))))

    def measure(flat: bool):
        with gatherflat.flatten_batched(flat):
            batched = jax.vmap(lambda *a: fus.ndt_eskf_fusion(*a, config=cfg))
            run = _jit_with_probe(batched)
            sec, out = _timed(
                run,
                lambda r: (jax.device_put(
                    jnp.asarray(xyzi + np.float32(1e-3 * r))),) + rest)
        return B * (S - 1) / sec, np.asarray(out.fused_p)

    sps_default, p_default = measure(False)
    sps_flat, p_flat = measure(True)
    bitwise_equal = bool((p_default == p_flat).all())

    print(json.dumps({
        "B": B,
        "fleet_agg_scans_per_sec_default": round(sps_default, 2),
        "fleet_agg_scans_per_sec_flat_gather": round(sps_flat, 2),
        "speedup": round(sps_flat / sps_default, 3),
        "outputs_bitwise_equal": bitwise_equal,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
