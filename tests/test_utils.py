import numpy as np
import jax
import jax.numpy as jnp

from toyslam_tpu.estimators import eskf, window
from toyslam_tpu.utils import checkpoint, evalio, profiling


def test_checkpoint_roundtrip_eskf(tmp_path):
    state = eskf.init_state(jnp.float64)
    state = state._replace(p=jnp.asarray([1.0, 2.0, 3.0], jnp.float64))
    path = tmp_path / "ckpt.npz"
    checkpoint.save_checkpoint(path, state)
    restored = checkpoint.load_checkpoint(path, eskf.init_state(jnp.float64))
    np.testing.assert_array_equal(np.asarray(restored.p), [1.0, 2.0, 3.0])
    np.testing.assert_array_equal(np.asarray(restored.P),
                                  np.asarray(state.P))


def test_checkpoint_roundtrip_window(tmp_path):
    cfg = window.WindowConfig(window_size=4)
    win = window.window_init(cfg, jnp.float64)
    win = win._replace(count=jnp.asarray(2, jnp.int32))
    path = tmp_path / "win.npz"
    checkpoint.save_checkpoint(path, win)
    restored = checkpoint.load_checkpoint(path,
                                          window.window_init(cfg, jnp.float64))
    assert int(restored.count) == 2


def test_stage_timer():
    t = profiling.StageTimer()
    x = jnp.ones((128,))
    for _ in range(3):
        with t.stage("add"):
            y = x + 1
        jax.block_until_ready(y)
    s = t.summary()
    assert s["add"]["count"] == 3
    assert s["add"]["avg_ms"] >= 0
    line = t.scan_log_line(5, 1.234, 0.2045)
    assert "1.234" in line and "0.204500" in line


def test_bench_1x_10x():
    f = jax.jit(lambda x: x * 2)
    single, ten, out = profiling.bench_1x_10x(f, jnp.ones((64,)))
    assert single > 0 and ten > 0
    np.testing.assert_array_equal(np.asarray(out), 2.0)


def test_compare_solutions_identical_and_offset():
    T = 50
    times = np.arange(T) * 0.1
    pos = np.cumsum(np.ones((T, 3)) * 0.1, axis=0)
    quat = np.tile([1.0, 0, 0, 0], (T, 1))
    vel = np.ones((T, 3))
    a = evalio.Trajectory(times, pos, quat, vel)
    out = evalio.compare_solutions(a, a)
    assert out["pos_3d"].rmse < 1e-12
    assert out["yaw"].rmse < 1e-12

    b = evalio.Trajectory(times, pos + [0.5, 0, 0], quat, vel)
    out = evalio.compare_solutions(a, b)
    assert abs(out["pos_x"].avg - 0.5) < 1e-9
    assert abs(out["pos_3d"].avg - 0.5) < 1e-9


def test_window_divergence_reset():
    cfg = window.WindowConfig(window_size=4)
    win = window.window_init(cfg, jnp.float64)
    win = win._replace(
        count=jnp.asarray(1, jnp.int32),
        states=win.states._replace(
            p=win.states.p.at[0].set(jnp.asarray([100.0, 0, 0])),
            v=win.states.v.at[0].set(jnp.asarray([50.0, 0, 0]))),
        prior_valid=jnp.asarray(True),
    )
    meas = jnp.asarray([1.0, 2.0, 3.0], jnp.float64)
    assert bool(window.window_is_diverged(win, meas))
    win2 = window.reset_to_measurement(win, meas, cfg)
    np.testing.assert_allclose(np.asarray(win2.states.p[0]), [1.0, 2.0, 3.0])
    assert not bool(win2.prior_valid)
    assert not bool(window.window_is_diverged(win2, meas))


def test_config_roundtrip(tmp_path):
    from toyslam_tpu import config as cfg
    from toyslam_tpu.registration import ndt

    c = cfg.default("ndt")
    assert isinstance(c, ndt.NDTConfig)
    d = cfg.to_dict(c)
    assert d["resolution"] == 1.0

    custom = cfg.from_dict(ndt.NDTConfig, {"resolution": 2.5,
                                           "max_iterations": 10})
    assert custom.resolution == 2.5 and custom.max_iterations == 10
    assert custom.step_size == 0.1  # default preserved

    path = tmp_path / "cfg.json"
    cfg.save(path, {"ndt": custom, "odometry": cfg.default("odometry")})
    loaded = cfg.load(path)
    assert loaded["ndt"].resolution == 2.5
    assert loaded["odometry"].ndt.resolution == 1.0

    # typos fail loudly
    import pytest
    with pytest.raises(KeyError):
        cfg.from_dict(ndt.NDTConfig, {"resolutoin": 1.0})


def test_plotio_ellipse_and_arrow_geometry():
    """Headless plot helpers (ICP/utils/plot.py port): the ellipse polyline
    must lie on the chi2 covariance contour, and the arrow shaft must point
    along yaw."""
    from toyslam_tpu.utils import plotio

    cov = np.array([[4.0, 1.2], [1.2, 1.0]])
    chi2 = 3.0
    e = plotio.covariance_ellipse_2d(cov, chi2)
    assert e["a"] >= e["b"] > 0
    poly = plotio.covariance_ellipse_polyline(2.0, -1.0, cov, chi2)
    # Every vertex satisfies (p-c)^T cov^-1 (p-c) == chi2
    d = poly - np.array([2.0, -1.0])
    md = np.einsum("ni,ij,nj->n", d, np.linalg.inv(cov), d)
    np.testing.assert_allclose(md, chi2, rtol=1e-9)

    arrow = plotio.arrow_polyline(1.0, 1.0, np.pi / 4, length=2.0)
    shaft = arrow[1] - arrow[0]
    assert abs(np.arctan2(shaft[1], shaft[0]) - np.pi / 4) < 1e-12
    np.testing.assert_allclose(np.linalg.norm(shaft), 2.0)
