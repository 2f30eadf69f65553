"""RAIM: fault detection, exclusion and protection levels.

Capability port of ``GPSRAIM.cpp``: iterated elevation-weighted WLS
(``estimatePositionWeightedLeastSquares``, ``:395-481``), residual test
statistic via the hat matrix + chi-square threshold
(``calculateRAIMResiduals``, ``:483-523``), covariance (``:525-539``),
rigorous HPL/VPL with ENU-projected covariance eigen-axes and slope-based
minimum-detectable-bias terms (``calculateRigorousProtectionLevels``,
``:541-663``), and leave-one-out greedy fault exclusion
(``performFaultExclusion``, ``:664-725``).

TPU design: satellites are padded [S] tensors with validity masks; the
leave-one-out exclusion evaluates ALL S candidate subsets as one batched
(vmapped) solve instead of a sequential loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from toyslam_tpu.core.geodesy import ecef_to_enu_rotation, ecef_to_lla

_HP = jax.lax.Precision.HIGHEST

# Normal-quantile lookup used by the reference for k(P) multipliers
# (``t_distribution_values_``); nearest-value semantics preserved.
_PROB_TABLE = jnp.array([
    [0.5, 0.674], [0.6827, 1.0], [0.9, 1.645], [0.95, 1.96],
    [0.9545, 2.0], [0.99, 2.576], [0.9973, 3.0], [0.999, 3.291],
    [0.99999, 4.417], [0.9999999, 5.327],
])


def k_multiplier(probability):
    """Nearest-entry lookup (``getMultiplierForProbability``, ``:649-663``)."""
    idx = jnp.argmin(jnp.abs(_PROB_TABLE[:, 0] - probability))
    return _PROB_TABLE[idx, 1]


class RaimConfig(NamedTuple):
    max_iterations: int = 10
    chi_square_threshold: float = 5.0
    noise_stddev_m: float = 2.0
    prob_false_alarm: float = 1e-5
    prob_missed_detection: float = 1e-3
    min_weight: float = 0.01


class RaimResult(NamedTuple):
    state: jnp.ndarray  # [4] position + clock bias
    residuals: jnp.ndarray  # [S]
    test_statistic: jnp.ndarray
    fault_detected: jnp.ndarray
    covariance: jnp.ndarray  # [4, 4]
    hpl: jnp.ndarray
    vpl: jnp.ndarray
    weights: jnp.ndarray  # [S]


def _elevation_weights(sat_pos, position, valid, min_weight):
    lla = ecef_to_lla(position)
    R = ecef_to_enu_rotation(lla[0], lla[1])
    enu = jnp.einsum("ij,sj->si", R, sat_pos - position, precision=_HP)
    el = jnp.arctan2(enu[:, 2], jnp.sqrt(enu[:, 0] ** 2 + enu[:, 1] ** 2))
    w = jnp.maximum(jnp.sin(el) ** 2, min_weight)
    return jnp.where(valid, w, 0.0)


def wls_solve(sat_pos, pseudoranges, valid, initial_state,
              config: RaimConfig = RaimConfig()):
    """Iterated elevation-weighted WLS; returns (state, G, W diag)."""
    dtype = sat_pos.dtype

    def body(_, state):
        position = state[:3]
        d = sat_pos - position
        rng = jnp.maximum(jnp.linalg.norm(d, axis=-1), 1e-9)
        los = d / rng[:, None]
        G = jnp.concatenate([-los, jnp.ones_like(rng)[:, None]], 1)
        pred = rng + state[3]
        dr = jnp.where(valid, pseudoranges - pred, 0.0)
        w = _elevation_weights(sat_pos, position, valid, config.min_weight)
        Gw = G * w[:, None]
        N = jnp.matmul(G.T, Gw, precision=_HP) + 1e-9 * jnp.eye(4, dtype=dtype)
        delta = jnp.linalg.solve(N, jnp.matmul(Gw.T, dr, precision=_HP))
        return state + delta

    state = jax.lax.fori_loop(0, config.max_iterations, body,
                              initial_state.astype(dtype))
    position = state[:3]
    d = sat_pos - position
    rng = jnp.maximum(jnp.linalg.norm(d, axis=-1), 1e-9)
    G = jnp.concatenate([-d / rng[:, None], jnp.ones_like(rng)[:, None]], 1)
    w = _elevation_weights(sat_pos, position, valid, config.min_weight)
    return state, G, w


def raim_detect(sat_pos, pseudoranges, valid, initial_state,
                config: RaimConfig = RaimConfig()) -> RaimResult:
    """WLS solve + residual chi-square fault test + protection levels."""
    dtype = sat_pos.dtype
    state, G, w = wls_solve(sat_pos, pseudoranges, valid, initial_state, config)

    position = state[:3]
    rng = jnp.maximum(jnp.linalg.norm(sat_pos - position, axis=-1), 1e-9)
    dr = jnp.where(valid, pseudoranges - (rng + state[3]), 0.0)

    Gw = G * w[:, None]
    Ninv = jnp.linalg.inv(
        jnp.matmul(G.T, Gw, precision=_HP) + 1e-9 * jnp.eye(4, dtype=dtype)
    )
    # hat = G N^-1 G^T W ; residual projector S = I - hat (``:505-512``)
    hat = jnp.matmul(jnp.matmul(G, Ninv, precision=_HP), Gw.T, precision=_HP)
    res = dr - jnp.matmul(hat, dr, precision=_HP)
    res = jnp.where(valid, res, 0.0)

    n = jnp.sum(valid.astype(dtype))
    dof = jnp.maximum(n - 4.0, 1.0)
    test_stat = jnp.sum(res * w * res) / dof
    fault = test_stat > config.chi_square_threshold

    cov = Ninv  # (``calculatePositionCovariance``, ``:525-539``)

    # Protection levels (``:541-663``)
    lla = ecef_to_lla(position)
    R = ecef_to_enu_rotation(lla[0], lla[1])
    cov_enu = jnp.matmul(jnp.matmul(R, cov[:3, :3], precision=_HP), R.T,
                         precision=_HP)
    hc = cov_enu[:2, :2]
    tr = hc[0, 0] + hc[1, 1]
    det = hc[0, 0] * hc[1, 1] - hc[0, 1] * hc[1, 0]
    disc = jnp.sqrt(jnp.maximum(tr * tr / 4.0 - det, 0.0))
    semi_major = jnp.sqrt(jnp.maximum(tr / 2.0 + disc, 0.0))
    vertical_std = jnp.sqrt(jnp.maximum(cov_enu[2, 2], 0.0))

    k_md = k_multiplier(1.0 - config.prob_missed_detection)
    k_fa = k_multiplier(1.0 - config.prob_false_alarm)
    hpl = k_md * semi_major
    vpl = k_md * vertical_std

    # Slope terms: sensitivity of the solution to a bias on each satellite
    sens = jnp.matmul(Ninv, Gw.T, precision=_HP)  # [4, S]
    sens_enu = jnp.matmul(R, sens[:3], precision=_HP)  # [3, S]
    h_slope = jnp.sqrt(sens_enu[0] ** 2 + sens_enu[1] ** 2)
    v_slope = jnp.abs(sens_enu[2])
    h_slope = jnp.where(valid, h_slope, 0.0)
    v_slope = jnp.where(valid, v_slope, 0.0)
    mdb = k_fa * config.noise_stddev_m * jnp.sqrt(jnp.max(w))
    hpl = jnp.maximum(hpl, jnp.max(h_slope) * mdb)
    vpl = jnp.maximum(vpl, jnp.max(v_slope) * mdb)

    return RaimResult(
        state=state, residuals=res, test_statistic=test_stat,
        fault_detected=fault, covariance=cov, hpl=hpl, vpl=vpl, weights=w,
    )


def fault_exclusion(sat_pos, pseudoranges, valid, initial_state,
                    config: RaimConfig = RaimConfig()):
    """Leave-one-out exclusion, all candidates in one vmapped batch
    (``performFaultExclusion``, ``:664-725``).

    Returns (excluded_index or -1, test statistic after exclusion,
             RaimResult of the best subset).
    """
    S = sat_pos.shape[0]

    def without(i):
        mask_i = valid & (jnp.arange(S) != i)
        return raim_detect(sat_pos, pseudoranges, mask_i, initial_state, config)

    results = jax.vmap(without)(jnp.arange(S))
    # Only consider excluding satellites that were valid to begin with
    stats = jnp.where(valid, results.test_statistic, jnp.inf)
    best = jnp.argmin(stats)
    best_stat = stats[best]
    ok = best_stat < config.chi_square_threshold
    excluded = jnp.where(ok, best, -1)
    best_result = jax.tree_util.tree_map(lambda x: x[best], results)
    return excluded, best_stat, best_result


def covariance_ellipse(result: RaimResult):
    """Headless export of the RViz covariance/protection visualization
    (``publishPositionWithCovariance`` + the protection cylinder,
    ``GPSRAIM.cpp:823-918``): the ENU-rotated position covariance, the
    horizontal 1-sigma error-ellipse parameters (semi-axes + orientation
    east-of-north), and the protection-level cylinder (hpl radius, vpl
    half-height).

    Returns a dict of scalars/arrays ready for JSONL serialization.
    """
    position = result.state[:3]
    lla = ecef_to_lla(position)
    R = ecef_to_enu_rotation(lla[0], lla[1])
    cov_enu = jnp.matmul(jnp.matmul(R, result.covariance[:3, :3],
                                    precision=_HP), R.T, precision=_HP)
    hc = cov_enu[:2, :2]
    tr = hc[0, 0] + hc[1, 1]
    det = hc[0, 0] * hc[1, 1] - hc[0, 1] * hc[1, 0]
    disc = jnp.sqrt(jnp.maximum(tr * tr / 4.0 - det, 0.0))
    l_max = jnp.maximum(tr / 2.0 + disc, 0.0)
    l_min = jnp.maximum(tr / 2.0 - disc, 0.0)
    # Orientation of the major axis (angle of eigenvector of l_max)
    theta = 0.5 * jnp.arctan2(2.0 * hc[0, 1], hc[0, 0] - hc[1, 1])
    return {
        "cov_enu": cov_enu,
        "semi_major": jnp.sqrt(l_max),
        "semi_minor": jnp.sqrt(l_min),
        "orientation_rad": theta,
        "sigma_up": jnp.sqrt(jnp.maximum(cov_enu[2, 2], 0.0)),
        "hpl": result.hpl,
        "vpl": result.vpl,
    }
