#!/usr/bin/env python
"""Per-stage breakdown of the GICP align on the sample pair.

GICP is a bench metric (``gicp_ms_per_align``); before optimizing it
further, measure where the ~54 ms/align actually goes. Stages, timed
separately with the honest single-dispatch recipe (bench.py ``_timed``):

  cov_src    compute_covariances(source)  (k=20 approx NN + eigh recompose)
  cov_tgt    compute_covariances(target)
  full       the complete gicp_align (covariances + outer GN loop)

The outer-loop cost is full - cov_src - cov_tgt (the NN-per-iteration +
GN terms + solves). Run on the chip:

    python benchmarks/profile_gicp.py [--leaf 0.1]
"""

import sys
sys.path.insert(0, "/root/repo")

import argparse
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--leaf", type=float, default=0.1)
    ap.add_argument("--cap", type=int, default=16384)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _jit_with_probe, _timed
    from toyslam_tpu.core import pcd_io, pointcloud
    from toyslam_tpu.registration import gicp

    target_np = pcd_io.read_pcd("/root/reference/ndt_omp/data/251370668.pcd")
    source_np = pcd_io.read_pcd("/root/reference/ndt_omp/data/251371071.pcd")

    ds = jax.jit(pointcloud.voxel_downsample, static_argnums=(1, 2))
    t = ds(pointcloud.from_numpy(target_np, capacity=70000), args.leaf,
           args.cap)
    s = ds(pointcloud.from_numpy(source_np, capacity=70000), args.leaf,
           args.cap)
    t = jax.tree_util.tree_map(np.asarray, t)
    s = jax.tree_util.tree_map(np.asarray, s)
    cfg = gicp.GICPConfig()

    def fresh(cloud):
        """Host-jittered copy per run so the dispatch can't be elided."""
        rng = np.random.default_rng()

        def make(r):
            x = cloud.xyzi + np.float32(1e-4 * (r + 1))
            return (jax.device_put(jnp.asarray(x)),
                    jax.device_put(jnp.asarray(cloud.mask)))
        return make

    out = {}

    cov = _jit_with_probe(lambda x, m: gicp.compute_covariances(
        x[:, :3], m, cfg.k_correspondences, cfg.gicp_epsilon,
        cfg.exact_knn))
    for name, cloud in (("cov_src", s), ("cov_tgt", t)):
        sec, _ = _timed(cov, fresh(cloud))
        out[name + "_ms"] = round(sec * 1e3, 3)

    mk_t = fresh(t)

    def args_full(r):
        sx, sm = fresh(s)(r)
        tx, tm = mk_t(r)
        return sx, sm, tx, tm

    full = _jit_with_probe(lambda sx, sm, tx, tm: gicp.gicp_align(
        pointcloud.PointCloud(sx, sm), pointcloud.PointCloud(tx, tm),
        jnp.eye(4, dtype=jnp.float32), cfg))
    sec, res = _timed(full, args_full)
    out["full_ms"] = round(sec * 1e3, 3)
    out["outer_loop_ms"] = round(
        out["full_ms"] - out["cov_src_ms"] - out["cov_tgt_ms"], 3)
    out["iterations"] = int(np.asarray(res.iterations))
    out["converged"] = bool(np.asarray(res.converged))
    out["n_src"] = int(np.asarray(s.mask).sum())
    out["n_tgt"] = int(np.asarray(t.mask).sum())
    out["backend"] = jax.default_backend()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
