"""Point-to-point ICP (SVD/Kabsch), TPU-native.

Capability port of ``ICP/iterative_closest_point/iterative_closest_point.py``
(reference: ``icp_matching`` ``:19-118``): brute-force nearest-neighbor
association + Kabsch motion estimation + homogeneous chaining, with the same
EPS=1e-4 / MAX_ITER=100 loop semantics.

TPU design: the O(N*M) association the reference does with a Python double
loop becomes one [N, M] distance matrix on the MXU (``-2 S T^T`` dominates);
the whole iteration loop runs in ``lax.while_loop``; padded lanes are masked
out of both the argmin and the Kabsch sums.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from toyslam_tpu.core import se3
from toyslam_tpu.core.pointcloud import PointCloud

_HP = jax.lax.Precision.HIGHEST


class ICPConfig(NamedTuple):
    eps: float = 1.0e-4  # reference EPS (iterative_closest_point.py:12)
    max_iterations: int = 100  # reference MAX_ITER (:13)
    # None auto-enables the fused Pallas distance+argmin kernel
    # (ops/nn_pallas.py) on TPU f32 — avoids materializing the [N, M]
    # distance matrix every iteration; falls back to jnp when shapes
    # don't tile.
    use_pallas_nn: bool | None = None
    # Ranking mode for the Pallas NN kernel (ops/nn_pallas._ranking_dot):
    #  - "x6" (default): the full 6-product hi/mid/lo expansion HIGHEST
    #    performs, as ONE K=18 MXU pass. Values are ~1e-7-class like
    #    HIGHEST but not bit-equal (different accumulation order) — an
    #    argmin flip needs a tie within MXU rounding, and the transform
    #    deviation is pinned < 1 mm / 1e-4 rad by
    #    test_icp_fast_nn_matches_exact (+ on-chip twin).
    #  - "highest": 6 separate MXU passes, bit-identical argmin to the
    #    jnp path (the strongest verification anchor; ~2x the NN cost).
    #  - "x3": fastest single-pass ranking (~2^-16 cross-term error, the
    #    GICP correspondence default). NOT recommended for ICP: its
    #    association flips can oscillate between iterations and stall
    #    the |d_err| < eps convergence check (observed on-chip r5 —
    #    600-pt cloud ran to max_iterations with the pose still near the
    #    exact path's); GICP's plane-to-plane objective tolerates it.
    # Only affects the Pallas path; the jnp fallback is always HIGHEST.
    nn_mode: str = "x6"


class ICPResult(NamedTuple):
    transform: jax.Array  # [4, 4] source -> target
    converged: jax.Array
    iterations: jax.Array
    error: jax.Array  # final mean matched distance


def nearest_neighbor_association(src_xyz, src_mask, tgt_xyz, tgt_mask):
    """For each source point: index of nearest target point + distance.

    Equivalent of the reference's O(N^2) scan
    (``iterative_closest_point.py:90-102``), as one MXU distance matrix.
    """
    big = jnp.asarray(1e30, src_xyz.dtype)
    d = (
        jnp.sum(src_xyz * src_xyz, axis=1)[:, None]
        - 2.0 * jnp.matmul(src_xyz, tgt_xyz.T, precision=_HP)
        + jnp.sum(tgt_xyz * tgt_xyz, axis=1)[None, :]
    )
    d = jnp.where(tgt_mask[None, :], d, big)
    idx = jnp.argmin(d, axis=1)
    dist = jnp.sqrt(jnp.maximum(jnp.take_along_axis(d, idx[:, None], 1)[:, 0], 0.0))
    dist = jnp.where(src_mask, dist, 0.0)
    return idx, dist


def svd_motion_estimation(src_xyz, matched_xyz, weights):
    """Kabsch: R, t minimizing sum w ||R s + t - m||^2
    (``iterative_closest_point.py:105-118``)."""
    wsum = jnp.maximum(jnp.sum(weights), 1.0)
    mu_s = jnp.sum(src_xyz * weights[:, None], axis=0) / wsum
    mu_m = jnp.sum(matched_xyz * weights[:, None], axis=0) / wsum
    s_c = (src_xyz - mu_s) * weights[:, None]
    m_c = matched_xyz - mu_m
    W = jnp.matmul(s_c.T, m_c, precision=_HP)  # [3, 3]
    u, _, vt = jnp.linalg.svd(W)
    # Proper rotation (det +1) correction
    d = jnp.linalg.det(jnp.matmul(vt.T, u.T, precision=_HP))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], src_xyz.dtype)).at[2, 2].set(d)
    R = jnp.matmul(vt.T, jnp.matmul(D, u.T, precision=_HP), precision=_HP)
    t = mu_m - jnp.matmul(R, mu_s, precision=_HP)
    return R, t


def icp_align(source: PointCloud, target: PointCloud, guess=None,
              config: ICPConfig = ICPConfig()) -> ICPResult:
    """Iteratively align source to target; returns the cumulative transform."""
    dtype = source.xyzi.dtype
    tgt_xyz = target.xyzi[:, :3]
    if guess is None:
        guess = jnp.eye(4, dtype=dtype)

    use_pallas_nn = config.use_pallas_nn
    if use_pallas_nn is None:
        use_pallas_nn = (jax.default_backend() == "tpu"
                         and dtype == jnp.float32)
    if use_pallas_nn:
        # Kernel operands (see ops/nn_pallas.py): zeroed invalid columns
        # + |t|^2 sentinel, computed once — the target never moves.
        tgt_zT = jnp.where(target.mask[:, None], tgt_xyz, 0.0).T
        tsq_sent = jnp.where(target.mask,
                             jnp.sum(tgt_zT * tgt_zT, 0), 1e30)[None]

    def _associate(cur):
        if use_pallas_nn:
            from toyslam_tpu.ops import nn_pallas

            nn = nn_pallas.nearest_neighbor(cur, tgt_zT, tsq_sent,
                                            mode=config.nn_mode)
            if nn is not None:
                part, idx = nn
                d2 = part + jnp.sum(cur * cur, 1)
                dist = jnp.sqrt(jnp.maximum(d2, 0.0))
                return idx, jnp.where(source.mask, dist, 0.0)
        return nearest_neighbor_association(
            cur, source.mask, tgt_xyz, target.mask)

    def body(carry):
        T, prev_err, it, _converged = carry
        cur = jnp.matmul(
            source.xyzi[:, :3], T[:3, :3].T, precision=_HP
        ) + T[:3, 3]
        idx, dist = _associate(cur)
        matched = tgt_xyz[idx]
        w = source.mask.astype(dtype)
        err = jnp.sum(dist) / jnp.maximum(jnp.sum(w), 1.0)
        R, t = svd_motion_estimation(cur, matched, w)
        T_new = se3.make_transform(R, t) @ T
        d_err = jnp.abs(prev_err - err)
        converged = d_err < config.eps
        return (T_new, err, it + 1, converged)

    def cond(carry):
        _T, _err, it, converged = carry
        return (~converged) & (it < config.max_iterations)

    init = (guess.astype(dtype), jnp.asarray(jnp.inf, dtype),
            jnp.zeros((), jnp.int32), jnp.asarray(False))
    T, err, it, converged = jax.lax.while_loop(cond, body, init)
    return ICPResult(transform=T, converged=converged, iterations=it, error=err)
