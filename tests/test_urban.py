import numpy as np
import jax
import jax.numpy as jnp

from toyslam_tpu.sim import urban


def _simple_city():
    # One building north of the receiver: x in [-10, 10], y in [10, 20], h 30
    return urban.Buildings(
        min_xyz=jnp.asarray([[-10.0, 10.0, 0.0]]),
        max_xyz=jnp.asarray([[10.0, 20.0, 30.0]]),
        attenuation_db=jnp.asarray([30.0]),
        reflectivity=jnp.asarray([0.6]),
    )


def test_blockage_classification():
    city = _simple_city()
    receiver = jnp.asarray([0.0, 0.0, 1.5])
    # Sat A: low-elevation to the north (behind the building) -> blocked
    # Sat B: high elevation -> clear; Sat C: to the south -> clear
    sat = jnp.asarray([
        [0.0, 1000.0, 150.0],
        [0.0, 100.0, 2000.0],
        [0.0, -1000.0, 300.0],
    ])
    blocked, n = urban.classify_signals(receiver, sat, city)
    assert bool(blocked[0]) and not bool(blocked[1]) and not bool(blocked[2])


def test_multipath_reflection_geometry():
    # Receiver between two walls; satellite low to the north is blocked by
    # the north building but reflects off the south building's north face.
    city = urban.Buildings(
        min_xyz=jnp.asarray([[-20.0, 10.0, 0.0], [-20.0, -20.0, 0.0]]),
        max_xyz=jnp.asarray([[20.0, 20.0, 40.0], [20.0, -10.0, 40.0]]),
        attenuation_db=jnp.asarray([30.0, 30.0]),
        reflectivity=jnp.asarray([0.6, 0.6]),
    )
    receiver = jnp.asarray([0.0, 0.0, 1.5])
    sat = jnp.asarray([[0.0, 5000.0, 900.0]])  # low northern satellite
    el = jnp.asarray([np.arctan2(900.0, 5000.0)])
    budget = urban.signal_budget(receiver, sat, el, city)
    assert bool(budget.blocked[0])
    assert bool(budget.multipath[0]), "should reflect off the south wall"
    assert float(budget.pseudorange_error[0]) > 0.5  # extra path length
    # NLOS C/N0 must be lower than LOS would be
    assert float(budget.cn0[0]) < 45.0


def test_budget_and_noisy_ranges():
    city = _simple_city()
    receiver = jnp.asarray([0.0, 0.0, 1.5])
    rng = np.random.default_rng(0)
    az = rng.uniform(0, 2 * np.pi, 12)
    el = rng.uniform(0.2, 1.3, 12)
    sat = receiver + 2.2e7 * jnp.asarray(
        np.stack([np.cos(el) * np.sin(az), np.cos(el) * np.cos(az),
                  np.sin(el)], -1))
    pr, budget = urban.simulate_urban_pseudoranges(
        jax.random.PRNGKey(0), receiver, sat, jnp.asarray(el), city,
        clock_bias_m=30.0)
    usable = np.asarray(budget.usable)
    assert usable.sum() >= 6
    true_r = np.linalg.norm(np.asarray(sat - receiver), axis=1)
    err = np.asarray(pr)[usable] - true_r[usable] - 30.0
    assert np.all(np.abs(err) < 50.0)
    assert np.all(np.isnan(np.asarray(pr)[~usable]))


def test_clock_walk_is_smooth():
    bias = urban.receiver_clock_walk(jax.random.PRNGKey(1), 1000, 0.1,
                                     bias0=10.0, drift0=1e-7)
    b = np.asarray(bias)
    assert b.shape == (1000,)
    d = np.diff(b)
    # drift 1e-7 s/s -> ~3 m per 0.1 s step; smooth means no step-to-step jumps
    assert np.all(np.abs(d) < 5.0)
    assert np.std(np.diff(d)) < 0.1  # drift changes slowly
    assert abs(b[-1] - b[0]) > 0.1  # drifts over 100 s
