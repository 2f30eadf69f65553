"""LOAM vs the f64 reference-control-flow oracle (tests/golden_loam.py).

Pins the pipeline's curvature stencil, adaptive thresholds, feature-gate
semantics and the edge/plane Gauss-Newton step against a line-cited f64
port of ``loam_mapping_node.cpp`` (VERDICT r4 missing #1).

Documented deviations (also in COVERAGE.md):
- picks: per-(ring, sector) argmax quotas here vs per-line greedy with
  min-distance suppression there — gate semantics pinned, sets overlap;
- stencil-border points: masked here, curvature-0 flat candidates there;
- rotation Jacobian: the pipeline uses the analytic left-perturbation
  form; the reference rotates the ALREADY-TRANSFORMED point and flips
  the surf-row sign (reference bug #5 — ``golden_loam.surf_factors_
  aloam`` docstring). The faithful port measurably walks AWAY from a
  clean fixture's ground truth; the analytic oracle and the pipeline
  both converge to it and to each other.
"""

import sys
from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))

import golden_loam as G  # noqa: E402

from toyslam_tpu.core import pointcloud, se3  # noqa: E402
from toyslam_tpu.pipelines import loam  # noqa: E402

FOV = (-25.0, 5.0)
N_RINGS = 16


def _key(p):
    return tuple(np.round(np.asarray(p, np.float64), 5))


def _clean_scan():
    """Structured scan with EXACT ring elevations and no noise, so the
    reference's int-binning and the pipeline's round-binning agree on
    every point and the azimuth orders coincide. Range profile has
    smooth sections + steps so curvature spans flat..edge regimes."""
    els = np.deg2rad(np.linspace(FOV[0], FOV[1], N_RINGS))
    az = np.linspace(-np.pi, np.pi, 360, endpoint=False)
    pts = []
    for e in els:
        r = 12.0 + 3.0 * np.sin(3 * az) + 2.0 * (np.sin(11 * az) > 0.7)
        x = r * np.cos(e) * np.cos(az)
        y = r * np.cos(e) * np.sin(az)
        z = r * np.sin(e)
        pts.append(np.stack([x, y, z], 1))
    return np.concatenate(pts).astype(np.float64)


@pytest.fixture(scope="module")
def oracle():
    return G.extract_features(_clean_scan(), N_RINGS, fov_deg=FOV,
                              edge_threshold=1.0, surf_threshold=0.1)


@pytest.fixture(scope="module")
def ours():
    cfg = loam.LoamConfig(n_rings=N_RINGS, vertical_fov_deg=FOV)
    cloud = pointcloud.from_numpy(_clean_scan(), capacity=6144,
                                  dtype=jnp.float64)
    org = loam.organize_scan(cloud, cfg)
    feats = loam.organize_and_extract(cloud, cfg)
    return org, feats, cfg


def test_curvature_stencil_matches_reference(oracle, ours):
    """Per-point 11-point curvature must match the oracle to f64
    roundoff wherever both sides compute it (stencil interior)."""
    org, _, _ = ours
    ocurv = {}
    for ln in oracle["lines"]:
        for p, c in zip(ln.pts, ln.curv):
            if c > 0.0:  # border points keep 0 — not comparable
                ocurv[_key(p)] = c
    xs = np.asarray(org.xyz)
    curv = np.asarray(org.curvature)
    ok = np.asarray(org.cur_ok)
    compared = 0
    for i in range(len(xs)):
        if not ok[i]:
            continue
        k = _key(xs[i])
        if k in ocurv:
            assert abs(curv[i] - ocurv[k]) <= 1e-9 * max(1.0, ocurv[k]), \
                (i, curv[i], ocurv[k])
            compared += 1
    assert compared > 2000, compared


def test_adaptive_thresholds_track_reference(oracle, ours):
    """Per-ring adaptive thresholds: ours takes percentiles over the
    curvature-valid interior points, the reference over all line points
    including the ten zero-curvature border lanes — a few ranks apart,
    so values agree to a modest relative bound (documented deviation)."""
    org, _, _ = ours
    ring = np.asarray(org.ring)
    e_thr = np.asarray(org.edge_thr)
    s_thr = np.asarray(org.surf_thr)
    checked = 0
    for r in range(N_RINGS):
        if len(oracle["lines"][r].pts) < 40:
            continue
        sel = ring == r
        if not sel.any():
            continue
        ours_e = float(np.median(e_thr[sel]))
        ours_s = float(np.median(s_thr[sel]))
        oe, os_ = oracle["edge_thr"][r], oracle["surf_thr"][r]
        assert abs(ours_e - oe) <= 0.35 * max(oe, 1e-6), (r, ours_e, oe)
        assert abs(ours_s - os_) <= 0.35 * max(os_, 1e-6), (r, ours_s, os_)
        checked += 1
    assert checked >= 8, checked


def test_feature_picks_respect_reference_gates(oracle, ours):
    """Every edge pick must clear the reference's own acceptance bound
    (curvature >= 0.8 x the oracle line threshold) and every surf pick
    must sit below 1.5 x the oracle surf threshold — the gates
    ``extractSharp/FlatPointsFromLine`` break on (``:815,:872``)."""
    org, feats, _ = ours
    xs = np.asarray(org.xyz)
    curv = np.asarray(org.curvature)
    ring = np.asarray(org.ring)
    cmap = {_key(xs[i]): (curv[i], ring[i]) for i in range(len(xs))}

    e_mask = np.asarray(feats.edge_mask)
    e_xyz = np.asarray(feats.edge_xyz)[e_mask]
    assert len(e_xyz) > 5
    for p in e_xyz:
        c, r = cmap[_key(p)]
        assert c >= 0.8 * oracle["edge_thr"][r], (c, oracle["edge_thr"][r])

    s_mask = np.asarray(feats.surf_mask)
    s_xyz = np.asarray(feats.surf_xyz)[s_mask]
    assert len(s_xyz) > 20
    for p in s_xyz:
        c, r = cmap[_key(p)]
        assert c <= 1.5 * oracle["surf_thr"][r], (c, oracle["surf_thr"][r])

    # Structural deviation (sector quotas vs per-line greedy): quantify
    # overlap of our edge picks with the oracle's less-sharp superset.
    oracle_edges = {_key(p) for p in oracle["less_sharp"]}
    if len(e_xyz) and len(oracle_edges):
        overlap = np.mean([_key(p) in oracle_edges for p in e_xyz])
        assert overlap >= 0.3, overlap


def _gn_fixture(rng):
    """Clean line/plane world: 4 poles (edge map) + ground & wall grids
    (surf map); features subsample the same geometry. >= 50 factors so
    the reference's min-correspondence gate passes."""
    poles = []
    for px, py in [(-6, 3), (4, -5), (-3, -7), (8, 6)]:
        z = np.linspace(0, 4, 40)
        poles.append(np.stack([np.full_like(z, px), np.full_like(z, py), z],
                              1))
    edge_map = np.concatenate(poles) + 0.005 * rng.normal(size=(160, 3))
    gx, gy = np.meshgrid(np.linspace(-10, 10, 24),
                         np.linspace(-10, 10, 24))
    ground = np.stack([gx.ravel(), gy.ravel(), np.zeros(gx.size)], 1)
    wx, wz = np.meshgrid(np.linspace(-10, 10, 24), np.linspace(0, 5, 12))
    wall = np.stack([wx.ravel(), np.full(wx.size, 9.0), wz.ravel()], 1)
    surf_map = np.concatenate([ground, wall]) + 0.005 * rng.normal(
        size=(ground.shape[0] + wall.shape[0], 3))

    dx_gt = np.array([0.3, -0.2, 0.05, 0.02, -0.01, 0.04])
    T = np.asarray(se3.pose6_to_matrix(jnp.asarray(dx_gt, jnp.float64)))
    R_gt, t_gt = T[:3, :3], T[:3, 3]
    edge_local = (edge_map[::2] - t_gt) @ R_gt
    surf_local = (surf_map[::3] - t_gt) @ R_gt
    return edge_map, surf_map, edge_local, surf_local, R_gt, t_gt


def test_gn_matches_analytic_oracle_and_reference_quirk_measured(rng):
    """(a) The pipeline's GN (f64) must land with the ANALYTIC-Jacobian
    oracle on the fixture's ground truth and on each other — same NN
    gates, eigen gates, weights, damping, update rule. (b) The FAITHFUL
    reference Jacobian (world-point rotation + flipped surf-row sign,
    ``:1298,:1399-1401``) measurably walks away from the same ground
    truth at the reference's own default damping — the reference bug the
    pipeline deliberately does not copy."""
    edge_map, surf_map, edge_local, surf_local, R_gt, t_gt = _gn_fixture(rng)
    q_gt = np.asarray(se3.rot_to_quat(jnp.asarray(R_gt)))

    q0 = np.array([1.0, 0.0, 0.0, 0.0])
    t0 = t_gt + np.array([0.08, -0.05, 0.03])

    aq, at, adxs = G.optimize_odometry(
        edge_local, surf_local, edge_map, surf_map, q0, t0,
        iterations=10, jacobian="analytic")

    cfg = loam.LoamConfig(max_nn_sqdist=1e6, optimization_iterations=10,
                          system_noise=1e-4)
    feats = loam.FeatureScan(
        edge_xyz=jnp.asarray(edge_local),
        edge_mask=jnp.ones(len(edge_local), bool),
        surf_xyz=jnp.asarray(surf_local),
        surf_mask=jnp.ones(len(surf_local), bool))
    maps = loam.LoamMaps(
        edge_xyz=jnp.asarray(edge_map),
        edge_mask=jnp.ones(len(edge_map), bool),
        surf_xyz=jnp.asarray(surf_map),
        surf_mask=jnp.ones(len(surf_map), bool))
    mq, mt = loam.optimize_pose(feats, maps,
                                jnp.asarray(q0), jnp.asarray(t0), cfg)
    mq, mt = np.asarray(mq), np.asarray(mt)

    # (a) analytic oracle and pipeline: on GT (noise floor: 5 mm map
    # noise) and on each other.
    assert np.linalg.norm(at - t_gt) < 0.01, (at, t_gt)
    assert abs(abs(np.dot(aq, q_gt)) - 1.0) < 1e-5
    assert np.linalg.norm(mt - t_gt) < 0.01, (mt, t_gt)
    assert np.linalg.norm(mt - at) < 0.005, (mt, at)
    qdot = abs(float(np.dot(mq / np.linalg.norm(mq),
                            aq / np.linalg.norm(aq))))
    assert qdot > 1.0 - 1e-6, (mq, aq)
    assert np.all(np.isfinite(adxs)) and np.linalg.norm(adxs[0]) > 1e-3

    # (b) the faithful reference iteration leaves the basin (measured
    # ~0.76 m translation error on this fixture; pinned loosely).
    _, rt, _ = G.optimize_odometry(
        edge_local, surf_local, edge_map, surf_map, q0, t0,
        iterations=10, system_noise=0.001, jacobian="reference")
    assert np.linalg.norm(rt - t_gt) > 0.1, rt
