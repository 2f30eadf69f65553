import numpy as np
import jax
import jax.numpy as jnp

from toyslam_tpu.core import pointcloud, pcd_io, se3


def test_read_sample_pcds(sample_pcds):
    target, source = sample_pcds
    assert target.shape == (69088, 4)
    assert source.shape == (69792, 4)
    assert np.isfinite(target).all()
    # Sanity: typical LiDAR ranges
    r = np.linalg.norm(target[:, :3], axis=1)
    assert r.max() < 300.0 and r.mean() > 1.0


def test_pcd_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(100, 4)).astype(np.float32)
    p = tmp_path / "t.pcd"
    pcd_io.write_pcd(p, pts, binary=True)
    back = pcd_io.read_pcd(p)
    np.testing.assert_allclose(back, pts, rtol=1e-6)
    pcd_io.write_pcd(p, pts, binary=False)
    back = pcd_io.read_pcd(p)
    np.testing.assert_allclose(back, pts, rtol=1e-5)


def _numpy_voxel_downsample(points, leaf):
    """Golden reference mirroring pcl::VoxelGrid centroid semantics."""
    xyz = points[:, :3]
    min_b = np.floor(xyz.min(axis=0) / leaf).astype(np.int64)
    ijk = np.floor(xyz / leaf).astype(np.int64) - min_b
    max_b = np.floor(xyz.max(axis=0) / leaf).astype(np.int64)
    div = max_b - min_b + 1
    vid = ijk[:, 0] + ijk[:, 1] * div[0] + ijk[:, 2] * div[0] * div[1]
    uniq, inverse = np.unique(vid, return_inverse=True)
    out = np.zeros((len(uniq), 4))
    cnt = np.zeros(len(uniq))
    np.add.at(out, inverse, points)
    np.add.at(cnt, inverse, 1.0)
    return out / cnt[:, None], uniq


def test_voxel_downsample_matches_numpy(sample_pcds):
    target, _ = sample_pcds
    pts = target[:20000]
    cloud = pointcloud.from_numpy(pts, capacity=24000)
    ds = jax.jit(pointcloud.voxel_downsample, static_argnums=1)(cloud, 1.0)
    golden, uniq = _numpy_voxel_downsample(pts.astype(np.float64), 1.0)

    got_mask = np.asarray(ds.mask)
    got = np.asarray(ds.xyzi)[got_mask]
    assert got.shape[0] == golden.shape[0]
    # Sort both by position for comparison
    order_a = np.lexsort(got[:, :3].T)
    order_b = np.lexsort(golden[:, :3].T)
    np.testing.assert_allclose(got[order_a], golden[order_b], atol=2e-3)


def test_voxel_downsample_handles_padding(rng):
    pts = rng.uniform(-10, 10, size=(500, 3))
    cloud = pointcloud.from_numpy(pts, capacity=1000)
    ds = pointcloud.voxel_downsample(cloud, 2.0)
    n_valid = int(np.asarray(ds.count))
    assert 0 < n_valid <= 500
    valid_pts = np.asarray(ds.xyzi)[np.asarray(ds.mask)]
    assert np.abs(valid_pts[:, :3]).max() < 11.0


def test_transform_keeps_mask(rng):
    pts = rng.uniform(-1, 1, size=(10, 3))
    cloud = pointcloud.from_numpy(pts, capacity=16)
    T = se3.pose6_to_matrix(jnp.asarray([1.0, 2.0, 3.0, 0.1, 0.2, 0.3]))
    out = pointcloud.transform(cloud, T)
    assert np.array_equal(np.asarray(out.mask), np.asarray(cloud.mask))
    expected = pts @ np.asarray(T)[:3, :3].T + np.asarray(T)[:3, 3]
    np.testing.assert_allclose(np.asarray(out.xyzi[:10, :3]), expected, atol=1e-5)
    # padded lanes stay at the sentinel
    assert np.all(np.asarray(out.xyzi[10:, 0]) == pointcloud.PAD_COORD)


def test_voxel_downsample_fused_capacity(rng):
    """downsample(cloud, leaf, C) == shrink_to(downsample(cloud, leaf), C),
    including when C drops some occupied voxels."""
    pts = rng.uniform(-20, 20, (4000, 4)).astype(np.float32)
    cloud = pointcloud.from_numpy(pts, capacity=5000)
    full = pointcloud.voxel_downsample(cloud, 2.0)
    n_vox = int(full.count)
    assert n_vox > 64
    for C in (n_vox + 37, 64):  # headroom and overflow cases
        fused = pointcloud.voxel_downsample(cloud, 2.0, C)
        ref = pointcloud.shrink_to(full, C)
        assert fused.capacity == C
        np.testing.assert_array_equal(np.asarray(fused.mask),
                                      np.asarray(ref.mask))
        np.testing.assert_allclose(np.asarray(fused.xyzi),
                                   np.asarray(ref.xyzi), rtol=1e-6)


def test_downsample_single_voxel_extreme_run():
    """The segmented tree reduction must stay exact when ALL points share
    one voxel (maximum run length = n, exercising every doubling round)."""
    rng = np.random.default_rng(0)
    n = 4096
    pts = (np.array([5.0, -3.0, 1.0]) + 0.2 * rng.random((n, 3))).astype(
        np.float32)
    cloud = pointcloud.from_numpy(pts, capacity=n + 13)
    ds = pointcloud.voxel_downsample(cloud, 1.0, 64)
    assert int(ds.count) == 1
    got = np.asarray(ds.xyzi)[np.asarray(ds.mask)][0, :3]
    np.testing.assert_allclose(got, pts.mean(0), rtol=1e-5, atol=1e-4)


def test_downsample_alternating_tiny_runs():
    """Run-length-1 segments (every point its own voxel) through the tree."""
    n = 257
    pts = np.stack([np.arange(n, dtype=np.float32) * 2.0,
                    np.zeros(n, np.float32),
                    np.zeros(n, np.float32)], 1)
    cloud = pointcloud.from_numpy(pts, capacity=n)
    ds = pointcloud.voxel_downsample(cloud, 1.0)
    assert int(ds.count) == n
    got = np.sort(np.asarray(ds.xyzi)[np.asarray(ds.mask)][:, 0])
    np.testing.assert_allclose(got, pts[:, 0], atol=1e-6)
