import numpy as np
import jax.numpy as jnp

from toyslam_tpu.core import se3
from toyslam_tpu.utils import evalio


def _random_traj(rng, T=50):
    times = np.arange(T) * 0.1
    poses = []
    p = np.eye(4)
    for _ in range(T):
        step = np.asarray(se3.pose6_to_matrix(jnp.asarray(
            [0.1, 0.01, 0.0, 0.001, 0.002, 0.01], jnp.float64)))
        p = p @ step
        poses.append(p.copy())
    return times, np.stack(poses)


def test_evapos_roundtrip(tmp_path, rng):
    times, poses = _random_traj(rng)
    traj = evalio.from_transforms(times, poses)
    path = tmp_path / "sol.csv"
    evalio.write_evapos_csv(path, traj)
    back = evalio.read_evapos_csv(path)
    np.testing.assert_allclose(back.pos, traj.pos, atol=1e-4)
    np.testing.assert_allclose(back.quat, traj.quat, atol=1e-4)
    # Time normalized to start at 0 like EvaPos.py
    assert back.time[0] == 0.0
    np.testing.assert_allclose(np.diff(back.time), 0.1, atol=1e-6)


def test_reads_reference_solution_csv():
    traj = evalio.read_evapos_csv("/root/reference/ICP/Solution1.csv")
    assert traj.pos.shape[1] == 3
    assert len(traj.time) > 100
    assert traj.time[0] == 0.0
    # unit quaternions
    norms = np.linalg.norm(traj.quat, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)


def test_tum_roundtrip(tmp_path, rng):
    times, poses = _random_traj(rng, 20)
    path = tmp_path / "traj.txt"
    evalio.write_tum(path, times, poses)
    t2, pos2, quat2 = evalio.read_tum(path)
    np.testing.assert_allclose(pos2, poses[:, :3, 3], atol=1e-5)


def test_ate_alignment(rng):
    gt = rng.normal(size=(100, 3)).cumsum(0)
    R = np.asarray(se3.euler_xyz_to_rot(jnp.asarray([0.1, -0.2, 0.5], jnp.float64)))
    est = gt @ R.T + np.array([5.0, -2.0, 1.0])
    rmse_aligned, _ = evalio.ate(est, gt, align=True)
    assert rmse_aligned < 1e-9
    rmse_raw, _ = evalio.ate(est, gt, align=False)
    assert rmse_raw > 1.0


def test_rpe_identity():
    times, poses = _random_traj(np.random.default_rng(0), 30)
    t_err, r_err = evalio.rpe(poses, poses)
    assert t_err < 1e-12 and r_err < 1e-6


def test_metrics_logger(tmp_path):
    log = evalio.MetricsLogger(tmp_path / "m.jsonl")
    log.log(scan=0, msec=1.5, fitness=0.2)
    log.log(scan=1, msec=1.2, fitness=0.19)
    rows = log.read()
    assert len(rows) == 2 and rows[1]["fitness"] == 0.19


def test_error_stats():
    s = evalio.error_stats([1.0, 2.0, 3.0])
    assert s.current == 3.0 and s.min == 1.0 and s.max == 3.0
    assert abs(s.avg - 2.0) < 1e-12 and s.count == 3


def test_from_transforms_velocity_irregular_timestamps():
    """Regression (advisor r1): velocity from irregularly-sampled poses must
    be a consistent central-difference estimator over the actual sample
    times — constant velocity in, constant velocity out."""
    t = np.array([0.0, 0.1, 0.35, 0.4, 0.9, 1.0])
    v_true = np.array([2.0, -1.0, 0.5])
    T = np.tile(np.eye(4), (len(t), 1, 1))
    T[:, :3, 3] = t[:, None] * v_true
    traj = evalio.from_transforms(t, T)
    np.testing.assert_allclose(traj.vel, np.tile(v_true, (len(t), 1)),
                               atol=1e-9)


def test_from_transforms_velocity_duplicate_timestamps():
    """Regression (advisor r2): exactly duplicated timestamps (common in
    real logs) must not explode velocities — the effective dt is clamped
    to >= 1 ns, so velocities stay bounded by |dp| / 1e-9, and identical
    consecutive poses at a duplicated stamp give ~zero velocity."""
    t = np.array([0.0, 0.1, 0.1, 0.2, 0.2, 0.3])
    pos = np.array([[0.0, 0, 0], [0.1, 0, 0], [0.1, 0, 0],
                    [0.2, 0, 0], [0.2, 0, 0], [0.3, 0, 0]])
    T = np.tile(np.eye(4), (len(t), 1, 1))
    T[:, :3, 3] = pos
    traj = evalio.from_transforms(t, T)
    assert np.isfinite(traj.vel).all()
    # duplicated stamps carry identical poses -> velocity stays ~1 m/s
    # scale, nowhere near the 1e12-scale garbage the old jitter produced
    assert np.abs(traj.vel).max() < 10.0, traj.vel


def test_from_transforms_velocity_out_of_order_timestamps():
    """Regression (r3 review): an out-of-order stamp clamped by the
    monotone cummax must still leave STRICTLY increasing coordinates —
    jitter-before-clamp left zero spacing there and np.gradient returned
    NaN rows."""
    t = np.array([0.0, 0.2, 0.1, 0.3])
    pos = np.array([[0.0, 0, 0], [0.2, 0, 0], [0.1, 0, 0], [0.3, 0, 0]])
    T = np.tile(np.eye(4), (len(t), 1, 1))
    T[:, :3, 3] = pos
    traj = evalio.from_transforms(t, T)
    assert np.isfinite(traj.vel).all(), traj.vel
    assert np.abs(traj.vel).max() < 1e10
