#!/usr/bin/env python
"""Dump the optimized HLO of the 64-way fleet program and summarize the
named fusions the trace attributes time to (fusion.NNNN)."""

import sys
sys.path.insert(0, "/root/repo")

import argparse
import re

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=64)
    ap.add_argument("--S", type=int, default=4)
    ap.add_argument("--cap", type=int, default=16384)
    ap.add_argument("--flat", action="store_true")
    ap.add_argument("--names", nargs="*", default=[])
    ap.add_argument("--out", default="/tmp/fleet_optimized.hlo")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from benchmarks.profile_fleet_trace import build_inputs
    from toyslam_tpu.core import pcd_io
    from toyslam_tpu.ops import gatherflat
    from toyslam_tpu.pipelines import fusion as fus
    from toyslam_tpu.pipelines import odometry as odo

    target_np = pcd_io.read_pcd("/root/reference/ndt_omp/data/251370668.pcd")
    B, S, R, cap = args.B, args.S, 20, args.cap
    xyzi, mask, imu_acc, imu_gyro, imu_dt = build_inputs(
        target_np, B, S, cap, R)
    cfg = fus.FusionConfig(
        odometry=odo.OdometryConfig(work_capacity=8192), imu_per_scan=R)

    with gatherflat.flatten_batched(args.flat):
        batched = jax.jit(
            jax.vmap(lambda *a: fus.ndt_eskf_fusion(*a, config=cfg)))
        lowered = batched.lower(jnp.asarray(xyzi), jnp.asarray(mask),
                                jnp.asarray(imu_acc), jnp.asarray(imu_gyro),
                                jnp.asarray(imu_dt))
        compiled = lowered.compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {args.out}")

    for name in args.names:
        # Find the fusion instruction and the computation it calls.
        m = re.search(rf"%?{re.escape(name)} = .*", txt)
        if not m:
            print(f"--- {name}: NOT FOUND")
            continue
        line = m.group(0)
        print(f"--- {name}:\n{line[:2000]}")
        cm = re.search(r"calls=%?([\w.\-]+)", line)
        if cm:
            comp = cm.group(1)
            cdef = re.search(
                rf"%?{re.escape(comp)} [^\n]*\{{\n(.*?)\n\}}", txt, re.S)
            if cdef:
                body = cdef.group(1)
                lines = body.splitlines()
                print(f"    computation {comp}: {len(lines)} instrs")
                # Op histogram
                ops = {}
                for ln in lines:
                    om = re.search(r"= \S+ (\w[\w\-]*)\(", ln)
                    if om:
                        ops[om.group(1)] = ops.get(om.group(1), 0) + 1
                print("    ops:", dict(sorted(ops.items(),
                                              key=lambda kv: -kv[1])))


if __name__ == "__main__":
    main()
