"""Independent float64 NumPy golden for GICP (VERDICT r3 item #3).

Mirrors the reference's control flow (``ndt_omp/include/pclomp/
gicp_omp_impl.hpp``), line-cited per function:

- ``compute_covariances``: exact k-NN covariance + Segal (1, 1, eps)
  singular-value reconstitution (``impl:48-124``).
- ``cost``/``cost_grad``: the BFGS functor's f/df — mean Mahalanobis
  quadratic over correspondences with the ZYX-Euler rotation-derivative
  projection (``OptimizationFunctorWithIndices::{operator(),df,fdf}``,
  ``impl:250-372``; ``computeRDerivative`` ``impl:128-177``).
- ``align``: the outer loop — single-NN correspondences on the
  guess-transformed cloud, per-pair M = (R C1 R^T + C2)^-1, inner
  minimize, mixed rotation/translation delta test with threshold 1
  (``computeTransformation``, ``impl:375-520``), final = T @ guess.

The ONE substitution: the inner minimizer. The reference calls PCL's
``BFGS<>`` (``pcl/registration/bfgs.h`` — GSL vector_bfgs2; NOT part of
this repository, so there is nothing to port from), stopping at gradient
tolerance 1e-2 or 20 iterations (``impl:209-246``). This oracle
minimizes the EXACT same f/df with scipy's BFGS at the same gtol/maxiter
— same objective, same analytic gradient, same stopping criterion class,
different line-search internals. Pose-level agreement bounds in
tests/test_gicp.py absorb that difference.

Test-only oracle; deliberately NumPy/SciPy, no JAX.
"""

from __future__ import annotations

import numpy as np
from scipy.optimize import minimize

_CHUNK = 2048


def _nn_indices(query, pts, k=1):
    """Exact brute-force k-NN (the KdTreeFLANN equivalent), chunked to
    bound the distance-matrix footprint. Returns ([Q, k] idx, [Q, k] d2),
    neighbors sorted by distance (ties: lower index first, like FLANN's
    exact backtracking search)."""
    q2 = np.sum(query * query, axis=1)
    p2 = np.sum(pts * pts, axis=1)
    idx = np.empty((len(query), k), np.int64)
    d2 = np.empty((len(query), k), np.float64)
    for lo in range(0, len(query), _CHUNK):
        q = query[lo:lo + _CHUNK]
        d = (q2[lo:lo + _CHUNK, None] - 2.0 * (q @ pts.T) + p2[None, :])
        if k == 1:
            j = np.argmin(d, axis=1)
            idx[lo:lo + _CHUNK, 0] = j
            d2[lo:lo + _CHUNK, 0] = d[np.arange(len(q)), j]
        else:
            part = np.argpartition(d, k - 1, axis=1)[:, :k]
            dp = np.take_along_axis(d, part, axis=1)
            order = np.argsort(dp, axis=1, kind="stable")
            idx[lo:lo + _CHUNK] = np.take_along_axis(part, order, axis=1)
            d2[lo:lo + _CHUNK] = np.take_along_axis(dp, order, axis=1)
    return idx, d2


def compute_covariances(points, k=20, eps=1e-3):
    """``computeCovariances`` (``impl:48-124``): k-NN (query included),
    raw-moment covariance over exactly k neighbors, SVD with singular
    values replaced by (1, 1, eps), reconstituted from U columns."""
    pts = np.asarray(points, np.float64)
    nn, _ = _nn_indices(pts, pts, k=k)
    covs = np.empty((len(pts), 3, 3), np.float64)
    for i in range(len(pts)):
        nbr = pts[nn[i]]
        mean = nbr.sum(0) / k
        cov = (nbr.T @ nbr) / k - np.outer(mean, mean)
        # JacobiSVD on a symmetric matrix: U columns ordered by
        # descending singular value.
        U, _s, _vt = np.linalg.svd(cov)
        out = np.zeros((3, 3))
        for c in range(3):
            v = eps if c == 2 else 1.0
            out += v * np.outer(U[:, c], U[:, c])
        covs[i] = out
    return covs


def apply_state(t, x):
    """``applyState`` (``impl:524-535``): ZYX Euler left-multiplied into
    the rotation block, translation added to column 3."""
    cx, sx = np.cos(x[3]), np.sin(x[3])
    cy, sy = np.cos(x[4]), np.sin(x[4])
    cz, sz = np.cos(x[5]), np.sin(x[5])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    t = t.copy()
    t[:3, :3] = (Rz @ Ry @ Rx) @ t[:3, :3]
    t[:3, 3] += x[:3]
    return t


def _r_derivative(x, R):
    """``computeRDerivative`` (``impl:128-177``): inner products of the
    three Euler-angle rotation derivatives with the accumulated R."""
    cphi, sphi = np.cos(x[3]), np.sin(x[3])
    ctheta, stheta = np.cos(x[4]), np.sin(x[4])
    cpsi, spsi = np.cos(x[5]), np.sin(x[5])
    dR_dPhi = np.array([
        [0.0, sphi * spsi + cphi * cpsi * stheta,
         cphi * spsi - cpsi * sphi * stheta],
        [0.0, -cpsi * sphi + cphi * spsi * stheta,
         -cphi * cpsi - sphi * spsi * stheta],
        [0.0, cphi * ctheta, -ctheta * sphi],
    ])
    dR_dTheta = np.array([
        [-cpsi * stheta, cpsi * ctheta * sphi, cphi * cpsi * ctheta],
        [-spsi * stheta, ctheta * sphi * spsi, cphi * ctheta * spsi],
        [-ctheta, -sphi * stheta, -cphi * stheta],
    ])
    dR_dPsi = np.array([
        [-ctheta * spsi, -cphi * cpsi - sphi * spsi * stheta,
         cpsi * sphi - cphi * spsi * stheta],
        [cpsi * ctheta, -cphi * spsi + cpsi * sphi * stheta,
         sphi * spsi + cphi * cpsi * stheta],
        [0.0, 0.0, 0.0],
    ])
    # matricesInnerProd(mat1, mat2) = sum_ij mat1(j,i)*mat2(i,j)
    # = tr(mat1 @ mat2) (``gicp_omp.h:325-334``), NOT the Frobenius
    # product — with R_acc = sum p temp^T this gives sum (dR p) . temp,
    # the true df/dangle (FD-verified).
    return np.array([np.sum(dR_dPhi * R.T), np.sum(dR_dTheta * R.T),
                     np.sum(dR_dPsi * R.T)])


def cost_grad(x, src, tgt, mahal):
    """The functor's ``fdf`` (``impl:340-372``): mean Mahalanobis
    quadratic + analytic gradient (base_transformation_ = identity, as
    set at ``impl:398``)."""
    T = apply_state(np.eye(4), x)
    m = len(src)
    pp = src @ T[:3, :3].T + T[:3, 3]
    res = pp - tgt  # [m, 3]
    temp = np.einsum("nij,nj->ni", mahal, res)
    f = float(np.sum(res * temp)) / m
    g = np.zeros(6)
    g[:3] = 2.0 / m * temp.sum(0)
    # Rotation block accumulates p_src * temp^T with the UNtransformed
    # source (base_transformation_ = identity, ``impl:362-366``).
    R_acc = 2.0 / m * np.einsum("ni,nj->ij", src, temp)
    g[3:] = _r_derivative(x, R_acc)
    return f, g


def estimate_rigid(src, tgt, mahal, T_init, gradient_tol=1e-2,
                   max_inner_iterations=20):
    """``estimateRigidTransformationBFGS`` (``impl:180-246``): x0 from
    the current transform's translation + ZYX Euler extraction, minimize
    f with analytic df to |g|_inf <= 1e-2 or 20 iterations, rebuild the
    transform by applyState on identity."""
    x0 = np.zeros(6)
    x0[:3] = T_init[:3, 3]
    x0[3] = np.arctan2(T_init[2, 1], T_init[2, 2])
    x0[4] = np.arcsin(-np.clip(T_init[2, 0], -1.0, 1.0))
    x0[5] = np.arctan2(T_init[1, 0], T_init[0, 0])
    # norm=2: PCL's testGradient checks the Euclidean gradient norm.
    r = minimize(lambda x: cost_grad(x, src, tgt, mahal), x0, jac=True,
                 method="BFGS",
                 options={"gtol": gradient_tol,
                          "maxiter": max_inner_iterations,
                          "norm": 2})
    return apply_state(np.eye(4), r.x)


def align(source, target, guess=None, k=20, eps=1e-3,
          max_correspondence_distance=5.0, max_iterations=200,
          transformation_epsilon=5e-4, rotation_epsilon=2e-3,
          source_covs=None, target_covs=None):
    """``computeTransformation`` (``impl:375-520``). Returns (final 4x4,
    outer iterations). Defaults are the reference's ctor values
    (``gicp_omp.h:117-127``)."""
    src = np.asarray(source, np.float64)
    tgt = np.asarray(target, np.float64)
    guess = np.eye(4) if guess is None else np.asarray(guess, np.float64)
    C1 = compute_covariances(src, k, eps) if source_covs is None \
        else source_covs
    C2 = compute_covariances(tgt, k, eps) if target_covs is None \
        else target_covs

    output = src @ guess[:3, :3].T + guess[:3, 3]
    transformation = np.eye(4)
    dist_threshold = max_correspondence_distance ** 2
    nr_iterations = 0
    while True:
        transform_R = transformation @ guess
        R = transform_R[:3, :3]
        query = output @ transformation[:3, :3].T + transformation[:3, 3]
        nn, d2 = _nn_indices(query, tgt, k=1)
        keep = d2[:, 0] < dist_threshold
        isrc = np.nonzero(keep)[0]
        itgt = nn[keep, 0]
        RC1R = np.einsum("ij,njk,lk->nil", R, C1[isrc], R)
        mahal = np.linalg.inv(RC1R + C2[itgt])

        prev = transformation
        transformation = estimate_rigid(output[isrc], tgt[itgt], mahal,
                                        transformation)
        ratio = np.full((4, 4), 1.0 / transformation_epsilon)
        ratio[:3, :3] = 1.0 / rotation_epsilon
        delta = np.max(ratio * np.abs(prev - transformation))
        nr_iterations += 1
        if nr_iterations >= max_iterations or delta < 1.0:
            break
    return transformation @ guess, nr_iterations
