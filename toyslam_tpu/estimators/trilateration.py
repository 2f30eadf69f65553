"""UWB trilateration by Gauss-Newton / Levenberg least squares.

Replaces the Ceres NLLS solves of the reference (``uwb_node.cpp:202-269``
RangeResidual + Huber + warm start; ``uwb_imu_sim_node.cpp:262-284`` DOGLEG
solve): residual r_i = ||p - a_i|| - d_i, solved by a fixed-iteration damped
Gauss-Newton inside ``lax.fori_loop`` — fully vmappable over time steps, so a
whole run's position fixes solve as one batched program.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_HP = jax.lax.Precision.HIGHEST


class TrilaterationConfig(NamedTuple):
    max_iterations: int = 20  # uwb_node.cpp solver cap (:236 options)
    damping: float = 1e-6
    huber_delta: float = 0.0  # 0 disables robust weights (uwb_node optional)


def solve_position(ranges, anchors, initial_guess, valid=None,
                   config: TrilaterationConfig = TrilaterationConfig()):
    """Least-squares position from anchor ranges.

    ranges [B], anchors [B, 3], initial_guess [3], valid [B] optional mask.
    Returns (position [3], final residual RMS).
    """
    dtype = ranges.dtype
    if valid is None:
        valid = jnp.ones(ranges.shape, bool)
    w_valid = valid.astype(dtype)

    def residual_jac(p):
        diff = p[None, :] - anchors  # [B, 3]
        dist = jnp.linalg.norm(diff, axis=-1)
        r = dist - ranges
        J = diff / jnp.maximum(dist, 1e-9)[:, None]  # [B, 3]
        w = w_valid
        if config.huber_delta > 0:
            absr = jnp.abs(r)
            w = w * jnp.where(absr <= config.huber_delta, 1.0,
                              config.huber_delta / jnp.maximum(absr, 1e-12))
        return r, J, w

    def body(_, p):
        r, J, w = residual_jac(p)
        Jw = J * w[:, None]
        H = jnp.matmul(Jw.T, J, precision=_HP) + config.damping * jnp.eye(3, dtype=dtype)
        g = jnp.matmul(Jw.T, r, precision=_HP)
        delta = jnp.linalg.solve(H, -g)
        return p + delta

    p = jax.lax.fori_loop(0, config.max_iterations, body, initial_guess.astype(dtype))
    r, _, w = residual_jac(p)
    rms = jnp.sqrt(jnp.sum((r * w) ** 2) / jnp.maximum(jnp.sum(w), 1.0))
    return p, rms


def solve_positions_batch(ranges, anchors, initial_guess,
                          config: TrilaterationConfig = TrilaterationConfig()):
    """vmap over time: ranges [T, B] -> positions [T, 3].

    Warm start semantics of the reference (``uwb_node.cpp:221``) don't batch;
    each solve starts from initial_guess (adequate for >= 4 anchors).
    """
    return jax.vmap(lambda r: solve_position(r, anchors, initial_guess,
                                             config=config))(ranges)
