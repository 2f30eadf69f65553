import numpy as np
import jax.numpy as jnp

from toyslam_tpu.core import pointcloud, se3
from toyslam_tpu.pipelines import loam


def _synthetic_lidar_scan(rng, pose_T=np.eye(4), n_per_ring=360, n_rings=16):
    """Structured world (walls + poles + ground) sampled like a spinning
    LiDAR from a given pose: emits rays, intersects simple geometry."""
    # World: ground plane z=0, two walls, four poles
    az = np.linspace(-np.pi, np.pi, n_per_ring, endpoint=False)
    el = np.deg2rad(np.linspace(-25, 5, n_rings))
    pts = []
    origin = pose_T[:3, 3]
    Rw = pose_T[:3, :3]
    for e in el:
        for a in az:
            d_body = np.array([np.cos(e) * np.cos(a), np.cos(e) * np.sin(a),
                               np.sin(e)])
            d = Rw @ d_body
            best = np.inf
            # ground z=0 (sensor at z=1.5)
            oz = origin[2] + 1.5
            if d[2] < -1e-3:
                t = -oz / d[2]
                if 0 < t < best:
                    best = t
            # wall y=15
            if abs(d[1]) > 1e-6:
                t = (15.0 - origin[1]) / d[1]
                if 0 < t < best:
                    p = origin + t * d
                    if 0 <= p[2] + oz - origin[2] and p[2] < 6 and -30 < p[0] < 30:
                        best = t
            # wall x=20
            if abs(d[0]) > 1e-6:
                t = (20.0 - origin[0]) / d[0]
                if 0 < t < best:
                    p = origin + t * d
                    if p[2] < 6 and -30 < p[1] < 30:
                        best = t
            # poles at corners
            for px, py in [(-8, 4), (5, -7), (-4, -9), (10, 8)]:
                # cylinder radius 0.3: solve |o_xy + t d_xy - c|^2 = r^2
                oc = origin[:2] + 0 - np.array([px, py])
                A = d[0] ** 2 + d[1] ** 2
                B = 2 * (oc[0] * d[0] + oc[1] * d[1])
                C = oc @ oc - 0.09
                disc = B * B - 4 * A * C
                if disc > 0 and A > 1e-9:
                    t = (-B - np.sqrt(disc)) / (2 * A)
                    if 0 < t < best:
                        best = t
            if np.isfinite(best) and 2.0 < best < 60.0:
                p = origin + best * d + 0.01 * rng.normal(size=3)
                pts.append(Rw.T @ (p - origin))  # body frame
    return np.asarray(pts, np.float32)


def test_feature_extraction_finds_edges_and_surfaces(rng):
    scan = _synthetic_lidar_scan(rng)
    cloud = pointcloud.from_numpy(scan, capacity=8192)
    cfg = loam.LoamConfig(n_rings=16, vertical_fov_deg=(-25.0, 5.0))
    feats = loam.organize_and_extract(cloud, cfg)
    n_edge = int(np.asarray(feats.edge_mask).sum())
    n_surf = int(np.asarray(feats.surf_mask).sum())
    assert n_edge > 10, n_edge  # poles & wall corners produce edges
    assert n_surf > 50, n_surf  # ground & walls produce surfaces
    # features are real points (finite, in range)
    e = np.asarray(feats.edge_xyz)[np.asarray(feats.edge_mask)]
    assert np.all(np.linalg.norm(e, axis=1) < 100)


def test_loam_odometry_tracks_motion(rng):
    poses = []
    T = np.eye(4)
    scans = []
    for i in range(5):
        scans.append(_synthetic_lidar_scan(rng, T))
        poses.append(T.copy())
        step = np.asarray(se3.pose6_to_matrix(
            jnp.asarray([0.4, 0.1, 0.0, 0.0, 0.0, 0.03], jnp.float64)))
        T = T @ step

    cap = max(len(s) for s in scans) + 64
    xyzi = np.full((5, cap, 4), 1e9, np.float32)
    mask = np.zeros((5, cap), bool)
    for i, s in enumerate(scans):
        xyzi[i, :len(s), :3] = s
        xyzi[i, :len(s), 3] = 0
        mask[i, :len(s)] = True

    cfg = loam.LoamConfig(n_rings=16, vertical_fov_deg=(-25.0, 5.0))
    out = loam.loam_odometry(jnp.asarray(xyzi), jnp.asarray(mask), cfg)
    est = np.asarray(out.positions)
    gt = np.stack([p[:3, 3] for p in poses])
    err = np.linalg.norm(est - gt, axis=1)
    assert err[-1] < 0.3, f"LOAM drift {err}"
    assert int(out.n_keyframes) >= 1
