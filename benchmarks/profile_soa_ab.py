#!/usr/bin/env python
"""A/B the SoA downsample prologue against the column-slice original,
with a NOOP control stage (round 5).

profile_ds_r5.py's stage numbers all include the axon relay's
per-dispatch overhead amortized over S scans (~14 ms / S) — without a
control stage the attribution is off by a constant. Stages here, all in
ONE process at S=32 (overhead ~0.45 ms/scan, identical across stages):

  noop      checksum of the input slice only (the scan + relay floor)
  mmx_old   masked min/max via [N,4] column slices (the pre-r5 form)
  mmx_soa   masked min/max via one transpose + lane-dense 1D rows
  ids_old   column-slice min/max + [N,3] ijk voxel ids (pre-r5 form)
  ids_soa   the shipped SoA prologue (pointcloud.voxel_ids)
  ds_full   the shipped voxel_downsample (SoA prologue)
"""

import sys

sys.path.insert(0, "/root/repo")

import json

import numpy as np

import bench as B

CAP = 16384
S = 32


def main():
    import jax
    import jax.numpy as jnp

    from toyslam_tpu.core import pcd_io, pointcloud as pc

    print("backend:", jax.default_backend(), file=sys.stderr)
    target_np = pcd_io.read_pcd("/root/reference/ndt_omp/data/251370668.pcd")
    big_np = B._big_scans(target_np, S)
    masks = jax.device_put(jnp.ones((S, 262144), bool))
    leaf = 0.3
    INTMAX = jnp.iinfo(jnp.int32).max

    def scan_over(stepfn):
        def prog(scans, m):
            out, _ = jax.lax.scan(stepfn, jnp.float32(0), (scans, m))
            return out
        return prog

    def noop(c, sm):
        x, mk = sm
        return c + x[0, 0] + x[-1, -1] + jnp.sum(mk[::1001]), None

    def mmx_old(c, sm):
        x, mk = sm
        big = jnp.float32(1e9)
        t = jnp.float32(0)
        for a in range(3):
            col = x[:, a]
            t += jnp.min(jnp.where(mk, col, big))
            t += jnp.max(jnp.where(mk, col, -big))
        return c + t, None

    def mmx_soa(c, sm):
        x, mk = sm
        cx, cy, cz, _ = pc.soa_channels(x)
        mn, mx = pc._min_max_soa(cx, cy, cz, mk, jnp.float32)
        return c + jnp.sum(mn) + jnp.sum(mx), None

    def ids_old(c, sm):
        x, mk = sm
        big = jnp.float32(1e9)
        mins, maxs = [], []
        for a in range(3):
            col = x[:, a]
            mins.append(jnp.min(jnp.where(mk, col, big)))
            maxs.append(jnp.max(jnp.where(mk, col, -big)))
        mn = jnp.stack(mins)
        mx = jnp.stack(maxs)
        inv = jnp.float32(1.0 / leaf)
        min_b = jnp.floor(mn * inv).astype(jnp.int32)
        max_b = jnp.floor(mx * inv).astype(jnp.int32)
        div = max_b - min_b + 1
        div_mul = jnp.stack([jnp.int32(1), div[0], div[0] * div[1]])
        ijk = jnp.floor(x[:, :3] * inv).astype(jnp.int32) - min_b
        vid = jnp.where(mk, jnp.sum(ijk * div_mul, axis=-1), INTMAX)
        return c + jnp.sum(vid ^ (vid >> 7)).astype(jnp.float32), None

    def ids_soa(c, sm):
        x, mk = sm
        vid, min_b, div_mul = pc.voxel_ids(pc.PointCloud(x, mk), leaf)
        return c + jnp.sum(vid ^ (vid >> 7)).astype(jnp.float32) + jnp.sum(
            min_b).astype(jnp.float32), None

    def ds_full(c, sm):
        x, mk = sm
        d = pc.voxel_downsample(pc.PointCloud(x, mk), leaf, CAP)
        return c + jnp.sum(d.xyzi * jnp.where(d.mask[:, None], 1.0, 0.0)
                           ) + jnp.sum(d.mask), None

    res = {}
    for name, fn in (("noop", noop), ("mmx_old", mmx_old),
                     ("mmx_soa", mmx_soa), ("ids_old", ids_old),
                     ("ids_soa", ids_soa), ("ds_full", ds_full)):
        run = B._jit_with_probe(scan_over(fn))
        sec, _ = B._timed(
            run, lambda r: (jax.device_put(
                jnp.asarray(big_np + np.float32(1e-3 * r))), masks))
        res[name] = round(sec / S * 1e3, 3)
        print(f"{name:8s} {res[name]:.3f} ms/scan", file=sys.stderr)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
