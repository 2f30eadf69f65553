"""Independent float64 NumPy implementation of NDT align.

Written directly from Magnusson 2009 eqs. 6.8-6.13/6.18-6.21 and the
More-Thuente 1994 search logic as plain eager NumPy — used as the golden
oracle for the JAX implementation. Deliberately simple and scalar where the
JAX version is fused/batched.
"""

from __future__ import annotations

import math

import numpy as np


def build_map(points, res, min_pts=6, mult=0.01):
    xyz = points[:, :3].astype(np.float64)
    min_b = np.floor(xyz.min(0) / res).astype(np.int64)
    max_b = np.floor(xyz.max(0) / res).astype(np.int64)
    div = max_b - min_b + 1
    ijk = np.floor(xyz / res).astype(np.int64) - min_b
    vid = ijk[:, 0] + ijk[:, 1] * div[0] + ijk[:, 2] * div[0] * div[1]
    leaves = {}
    order = np.argsort(vid, kind="stable")
    sorted_vid = vid[order]
    bounds = np.searchsorted(sorted_vid, np.unique(sorted_vid))
    uniq = np.unique(sorted_vid)
    for k, v in enumerate(uniq):
        lo = bounds[k]
        hi = bounds[k + 1] if k + 1 < len(bounds) else len(sorted_vid)
        pts = xyz[order[lo:hi]]
        n = len(pts)
        if n < min_pts:
            continue
        mean = pts.mean(0)
        sum_p = pts.sum(0)
        sum_pp = pts.T @ pts
        cov = (sum_pp - 2 * np.outer(sum_p, mean)) / n + np.outer(mean, mean)
        cov *= (n - 1.0) / n
        evals, evecs = np.linalg.eigh(cov)
        if evals[0] < 0 or evals[1] < 0 or evals[2] <= 0:
            continue
        min_ev = mult * evals[2]
        if evals[0] < min_ev:
            evals = np.maximum(evals, min_ev)
            cov = evecs @ np.diag(evals) @ np.linalg.inv(evecs)
        icov = np.linalg.inv(cov)
        if not np.isfinite(icov).all():
            continue
        leaves[int(v)] = (mean, icov)
    return leaves, min_b, max_b, div


def gauss_coeffs(res, outlier_ratio):
    c1 = 10.0 * (1 - outlier_ratio)
    c2 = outlier_ratio / res**3
    d3 = -math.log(c2)
    d1 = -math.log(c1 + c2) - d3
    d2 = -2 * math.log((-math.log(c1 * math.exp(-0.5) + c2) - d3) / d1)
    return d1, d2, d3


_OFF7 = np.array(
    [[0, 0, 0], [1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1],
     [0, 0, -1]], np.int64
)


def pose_to_T(p):
    tx, ty, tz, a, b, c = p
    Rx = np.array([[1, 0, 0], [0, math.cos(a), -math.sin(a)],
                   [0, math.sin(a), math.cos(a)]])
    Ry = np.array([[math.cos(b), 0, math.sin(b)], [0, 1, 0],
                   [-math.sin(b), 0, math.cos(b)]])
    Rz = np.array([[math.cos(c), -math.sin(c), 0],
                   [math.sin(c), math.cos(c), 0], [0, 0, 1]])
    T = np.eye(4)
    T[:3, :3] = Rx @ Ry @ Rz
    T[:3, 3] = [tx, ty, tz]
    return T


def _angle_tables(p):
    def cs(a):
        if abs(a) < 10e-5:
            return 1.0, 0.0
        return math.cos(a), math.sin(a)

    cx, sx = cs(p[3])
    cy, sy = cs(p[4])
    cz, sz = cs(p[5])
    j = np.array([
        [-sx * sz + cx * sy * cz, -sx * cz - cx * sy * sz, -cx * cy],
        [cx * sz + sx * sy * cz, cx * cz - sx * sy * sz, -sx * cy],
        [-sy * cz, sy * sz, cy],
        [sx * cy * cz, -sx * cy * sz, sx * sy],
        [-cx * cy * cz, cx * cy * sz, -cx * sy],
        [-cy * sz, -cy * cz, 0],
        [cx * cz - sx * sy * sz, -cx * sz - sx * sy * cz, 0],
        [sx * cz + cx * sy * sz, cx * sy * cz - sx * sz, 0],
    ])
    h = np.array([
        [-cx * sz - sx * sy * cz, -cx * cz + sx * sy * sz, sx * cy],
        [-sx * sz + cx * sy * cz, -cx * sy * sz - sx * cz, -cx * cy],
        [cx * cy * cz, -cx * cy * sz, cx * sy],
        [sx * cy * cz, -sx * cy * sz, sx * sy],
        [-sx * cz - cx * sy * sz, sx * sz - cx * sy * cz, 0],
        [cx * cz - sx * sy * sz, -sx * sy * cz - cx * sz, 0],
        [-cy * cz, cy * sz, -sy],
        [-sx * sy * cz, sx * sy * sz, sx * cy],
        [cx * sy * cz, -cx * sy * sz, -cx * cy],
        [sy * sz, sy * cz, 0],
        [-sx * cy * sz, -sx * cy * cz, 0],
        [cx * cy * sz, cx * cy * cz, 0],
        [-cy * cz, cy * sz, 0],
        [-cx * sz - sx * sy * cz, -cx * cz + sx * sy * sz, 0],
        [-sx * sz + cx * sy * cz, -cx * sy * sz - sx * cz, 0],
    ])
    return j, h


def _leaf_arrays(leaves):
    ids = np.array(sorted(leaves.keys()), np.int64)
    means = np.stack([leaves[int(v)][0] for v in ids])
    icovs = np.stack([leaves[int(v)][1] for v in ids])
    return ids, means, icovs


def compute_derivatives(leaf_arrays, min_b, max_b, div, src, p, d1, d2, res,
                        ref_hang_bug=False):
    """Vectorized f64 derivatives (independent of the JAX implementation
    in structure: plain NumPy broadcasting, no masking tricks).

    ``ref_hang_bug=True`` reproduces the reference's float-path sign on
    h_ang row d1 (+sy, ``ndt_omp_impl.hpp:383``) for behavioural comparison.
    """
    ids, means, icovs = leaf_arrays
    T = pose_to_T(p)
    trans = src @ T[:3, :3].T + T[:3, 3]
    j_tab, h_tab = _angle_tables(p)
    if ref_hang_bug:
        h_tab = h_tab.copy()
        h_tab[6, 2] = -h_tab[6, 2]

    xj = src @ j_tab.T  # [N, 8]
    xh = src @ h_tab.T  # [N, 15]
    N = len(src)

    J = np.zeros((N, 3, 6))
    J[:, 0, 0] = J[:, 1, 1] = J[:, 2, 2] = 1.0
    J[:, 1, 3], J[:, 2, 3] = xj[:, 0], xj[:, 1]
    J[:, 0, 4], J[:, 1, 4], J[:, 2, 4] = xj[:, 2], xj[:, 3], xj[:, 4]
    J[:, 0, 5], J[:, 1, 5], J[:, 2, 5] = xj[:, 5], xj[:, 6], xj[:, 7]

    zeros = np.zeros(N)
    a = np.stack([zeros, xh[:, 0], xh[:, 1]], 1)
    b = np.stack([zeros, xh[:, 2], xh[:, 3]], 1)
    c = np.stack([zeros, xh[:, 4], xh[:, 5]], 1)
    d = np.stack([xh[:, 6], xh[:, 7], xh[:, 8]], 1)
    e = np.stack([xh[:, 9], xh[:, 10], xh[:, 11]], 1)
    f = np.stack([xh[:, 12], xh[:, 13], xh[:, 14]], 1)
    Hrr = np.stack([
        np.stack([a, b, c], 1),
        np.stack([b, d, e], 1),
        np.stack([c, e, f], 1),
    ], 1)  # [N, 3, 3, 3vec]

    ijk = np.floor(trans / res).astype(np.int64)
    nijk = ijk[:, None, :] + _OFF7[None]  # [N, 7, 3]
    in_b = np.all((nijk >= min_b) & (nijk <= max_b), axis=-1)
    rel = nijk - min_b
    vv = rel[..., 0] + rel[..., 1] * div[0] + rel[..., 2] * div[0] * div[1]
    idx = np.searchsorted(ids, vv.clip(min=0))
    idx = idx.clip(max=len(ids) - 1)
    found = in_b & (ids[idx] == vv)

    mean = means[idx]  # [N, 7, 3]
    icov = icovs[idx]
    q = trans[:, None, :] - mean
    Cq = np.einsum("nkij,nkj->nki", icov, q)
    qCq = np.sum(q * Cq, -1)
    ee = np.exp(-0.5 * d2 * qCq)
    gate = found & (d2 * ee >= 0) & (d2 * ee <= 1)
    w = np.where(gate, 1.0, 0.0)

    score = np.sum(-d1 * ee * w)
    factor = d1 * d2 * ee * w
    u = np.concatenate(
        [Cq, np.einsum("nki,nij->nkj", Cq, J[:, :, 3:])], -1
    )  # [N,7,6]
    grad = np.einsum("nk,nki->i", factor, u)
    hess = -d2 * np.einsum("nk,nki,nkj->ij", factor, u, u)
    fC = np.einsum("nk,nkij->nij", factor, icov)
    hess[:3, :3] += fC.sum(0)
    tr = np.einsum("nij,njm->im", fC, J[:, :, 3:])
    hess[:3, 3:] += tr
    hess[3:, :3] += tr.T
    hess[3:, 3:] += np.einsum("nia,nij,njb->ab", J[:, :, 3:], fC, J[:, :, 3:])
    fCq = np.einsum("nk,nki->ni", factor, Cq)
    hess[3:, 3:] += np.einsum("ni,nabi->ab", fCq, Hrr)
    return score, grad, hess


def align(leaves, min_b, max_b, div, src, cfg_res=1.0, outlier_ratio=0.55,
          step_size=0.1, eps=0.1, max_iter=35, guess=np.eye(4),
          ref_hang_bug=False):
    la = _leaf_arrays(leaves)
    d1, d2, _ = gauss_coeffs(cfg_res, outlier_ratio)
    # decompose guess with Eigen eulerAngles(0,1,2) convention
    R = guess[:3, :3]
    c2 = math.hypot(R[0, 0], R[0, 1])
    r0_raw = math.atan2(R[1, 2], R[2, 2])
    if r0_raw > 0:
        a0 = r0_raw - math.pi
        a1 = math.atan2(-R[0, 2], -c2)
    else:
        a0 = r0_raw
        a1 = math.atan2(-R[0, 2], c2)
    s1, c1 = math.sin(a0), math.cos(a0)
    a2 = math.atan2(s1 * R[2, 0] - c1 * R[1, 0], c1 * R[1, 1] - s1 * R[2, 1])
    p = np.concatenate([guess[:3, 3], [-a0, -a1, -a2]])

    score, grad, hess = compute_derivatives(
        la, min_b, max_b, div, src, p, d1, d2, cfg_res, ref_hang_bug
    )
    it = 0
    n_evals = [0]
    while True:
        u, s, vt = np.linalg.svd(hess)
        cut = np.finfo(np.float64).eps * 6 * s.max()
        sinv = np.where(s > cut, 1 / np.where(s > cut, s, 1), 0)
        delta_p = vt.T @ (sinv * (u.T @ -grad))
        norm = np.linalg.norm(delta_p)
        if norm == 0 or not np.isfinite(norm):
            break
        step_dir = delta_p / norm

        # More-Thuente
        phi0 = -score
        dphi0 = -(grad @ step_dir)
        if dphi0 >= 0:
            if dphi0 == 0:
                a_t = 0.0
                break
            dphi0 = -dphi0
            step_dir = -step_dir
        mu, nu = 1e-4, 0.9
        a_l = a_u = 0.0
        f_l = f_u = 0.0
        g_l = g_u = (1 - mu) * dphi0
        a_t = min(max(norm, eps / 2), step_size)
        open_int = True
        interval_converged = False

        def ev(a):
            n_evals[0] += 1
            return compute_derivatives(
                la, min_b, max_b, div, src, p + step_dir * a, d1, d2, cfg_res,
                ref_hang_bug
            )

        score, grad, hess = ev(a_t)
        phi_t, dphi_t = -score, -(grad @ step_dir)
        psi_t = phi_t - phi0 - mu * dphi0 * a_t
        dpsi_t = dphi_t - mu * dphi0
        si = 0
        while (not interval_converged and si < 10
               and not (psi_t <= 0 and dphi_t <= -nu * dphi0)):
            ft, gt = (psi_t, dpsi_t) if open_int else (phi_t, dphi_t)
            a_t = _trial(a_l, f_l, g_l, a_u, f_u, g_u, a_t, ft, gt)
            a_t = min(max(a_t, eps / 2), step_size)
            score, grad, hess = ev(a_t)
            phi_t, dphi_t = -score, -(grad @ step_dir)
            psi_t = phi_t - phi0 - mu * dphi0 * a_t
            dpsi_t = dphi_t - mu * dphi0
            if open_int and psi_t <= 0 and dpsi_t >= 0:
                open_int = False
                f_l += phi0 - mu * dphi0 * a_l
                g_l += mu * dphi0
                f_u += phi0 - mu * dphi0 * a_u
                g_u += mu * dphi0
            ft, gt = (psi_t, dpsi_t) if open_int else (phi_t, dphi_t)
            res = _update(a_l, f_l, g_l, a_u, f_u, g_u, a_t, ft, gt)
            a_l, f_l, g_l, a_u, f_u, g_u, interval_converged = res
            si += 1

        p = p + step_dir * a_t
        if it > max_iter or (it and abs(a_t) < eps):
            break
        it += 1
    return pose_to_T(p), p, it, n_evals[0]


def _nz(x):
    """Tiny-denominator guard (the secant terms below hit g_l == g_t when a
    trial lands exactly on the current endpoint; the jittable port guards
    the same way with finfo.tiny)."""
    return x if x != 0 else 1e-300


def _trial(a_l, f_l, g_l, a_u, f_u, g_u, a_t, f_t, g_t):
    def cubic(al, fl, gl, at, ft, gt):
        z = 3 * (ft - fl) / _nz(at - al) - gt - gl
        w = math.sqrt(max(z * z - gt * gl, 0.0))
        return al + (at - al) * (w - gl - z) / _nz(gt - gl + 2 * w)

    if f_t > f_l:
        a_c = cubic(a_l, f_l, g_l, a_t, f_t, g_t)
        a_q = a_l - 0.5 * (a_l - a_t) * g_l / _nz(
            g_l - (f_l - f_t) / _nz(a_l - a_t))
        if abs(a_c - a_l) < abs(a_q - a_l):
            return a_c
        return 0.5 * (a_q + a_c)
    if g_t * g_l < 0:
        a_c = cubic(a_l, f_l, g_l, a_t, f_t, g_t)
        a_s = a_l - (a_l - a_t) / _nz(g_l - g_t) * g_l
        if abs(a_c - a_t) >= abs(a_s - a_t):
            return a_c
        return a_s
    if abs(g_t) <= abs(g_l):
        a_c = cubic(a_l, f_l, g_l, a_t, f_t, g_t)
        a_s = a_l - (a_l - a_t) / _nz(g_l - g_t) * g_l
        a_n = a_c if abs(a_c - a_t) < abs(a_s - a_t) else a_s
        if a_t > a_l:
            return min(a_t + 0.66 * (a_u - a_t), a_n)
        return max(a_t + 0.66 * (a_u - a_t), a_n)
    return cubic(a_u, f_u, g_u, a_t, f_t, g_t)


def _update(a_l, f_l, g_l, a_u, f_u, g_u, a_t, f_t, g_t):
    if f_t > f_l:
        return a_l, f_l, g_l, a_t, f_t, g_t, False
    if g_t * (a_l - a_t) > 0:
        return a_t, f_t, g_t, a_u, f_u, g_u, False
    if g_t * (a_l - a_t) < 0:
        return a_t, f_t, g_t, a_l, f_l, g_l, False
    return a_l, f_l, g_l, a_u, f_u, g_u, True
