"""Generalized ICP (plane-to-plane), TPU-native.

Capability port of ``pclomp::GeneralizedIterativeClosestPoint``
(``ndt_omp/include/pclomp/gicp_omp.h`` + ``gicp_omp_impl.hpp``):

- Per-point covariances from k=20 nearest neighbors with Segal's
  (epsilon, 1, 1) plane regularization (``computeCovariances``,
  ``gicp_omp_impl.hpp:48-124``; defaults ``gicp_omp.h:119-127``:
  k_correspondences 20, gicp_epsilon 0.001).
- Mahalanobis-weighted correspondences M = (C_B + R C_A R^T)^-1
  (``impl:425-436``).
- The inner optimizer: the reference uses BFGS over 6-dof with analytic
  gradients (``estimateRigidTransformationBFGS``, ``impl:180-372``); here a
  damped Gauss-Newton over the same plane-to-plane objective — identical
  cost function, TPU-friendly fixed-iteration solver.

TPU design: k-NN is one MXU distance matrix + top_k; covariances use the
closed-form SoA eigensolver; the whole align is one jittable program.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from toyslam_tpu.core import se3
from toyslam_tpu.core.pointcloud import PointCloud
from toyslam_tpu.ops.eigh3 import eigh3_soa

_HP = jax.lax.Precision.HIGHEST
_BIG = 1.0e9


class GICPConfig(NamedTuple):
    k_correspondences: int = 20  # gicp_omp.h:119
    gicp_epsilon: float = 0.001  # gicp_omp.h:123
    # The reference finds covariance neighbors with an exact KD-tree
    # (``computeCovariances``); the TPU default uses the hardware
    # approximate top-k (recall ~0.95, measured 26x faster) — the Segal
    # regularization to (eps, 1, 1) eigenvalues makes the covariances
    # insensitive to one or two swapped far neighbors. Set True for the
    # exact (sort-based) semantics.
    exact_knn: bool = False
    # Correspondence search: None auto-enables the fused Pallas
    # distance+argmin kernel (ops/nn_pallas.py) on TPU f32 — it avoids
    # materializing the [N, M] distance matrix (~1 GB HBM traffic per
    # outer iteration at sample-pair scale) and matches jnp.argmin
    # tie-breaking; any shape that doesn't tile falls back to jnp.
    use_pallas_nn: bool | None = None
    # Ranking matmul mode inside the kernel (ops/nn_pallas._ranking_dot).
    # The "x3" default (single K=9 MXU pass since r5; previously the same
    # expansion as 3 separate passes) flips ~2.5% of correspondences to
    # near-tied neighbors (<~0.05 m^2 farther on the sample pair); the
    # final transform moves < 0.2 mm (tests_tpu re-proves on hardware).
    # "x6" is the ~1e-7-class single-pass expansion; "highest" gives
    # bit-exact jnp.argmin parity at 6 MXU passes.
    nn_mode: str = "x3"
    # Inner Gauss-Newton normal equations: None auto-enables the fused
    # per-point terms kernel (ops/gicp_pallas.py) on TPU f32 when N is a
    # multiple of 1024 — one launch per GN step instead of ~20 small
    # XLA ops (measured 18.4 ms of the 70 ms sample-pair align).
    use_pallas_terms: bool | None = None
    # Covariance-stage k-NN operand: None auto-enables the fused bf16
    # negated-distance pass (ops/nn_pallas.neg_dist_bf16) on TPU f32 —
    # one matrix-sized pass instead of three feeding approx_max_k; same
    # bf16x3 ranking semantics as the approx default.
    use_pallas_cov: bool | None = None
    max_correspondence_distance: float = 5.0  # pcl default
    max_iterations: int = 20  # outer loop
    inner_iterations: int = 8  # GN steps per correspondence set
    transformation_epsilon: float = 5e-4  # gicp_omp.h region
    rotation_epsilon: float = 2e-3
    damping: float = 1e-6


class GICPResult(NamedTuple):
    transform: jax.Array
    converged: jax.Array
    iterations: jax.Array
    error: jax.Array


def compute_covariances(xyz, mask, k: int, epsilon: float,
                        exact_knn: bool = False,
                        use_pallas: bool | None = None,
                        interpret: bool = False):
    """Segal regularized covariances: eigenvalues -> (eps, 1, 1)
    (``computeCovariances``, ``gicp_omp_impl.hpp:48-124``)."""
    # exact_knn keeps full-f32 (HIGHEST) distances + a real sort; the
    # approx default ranks with a HIGH (3-pass) matmul and bf16-stored
    # distances — the [N, N] matrix write + the top-k read are the cost
    # (1 GB each at 16k f32), and ~0.4% relative quantization on
    # near-neighbor distances is noise next to approx_max_k's own ~0.95
    # recall (the Segal (eps,1,1) recomposition only keeps the plane
    # normal, which one or two swapped neighbors barely rotate). On TPU
    # f32 the fused Pallas pass (ops/nn_pallas.neg_dist_bf16) writes
    # approx_max_k's bf16 operand directly — one matrix-sized pass
    # instead of three (f32 matmul write, mask pass, bf16 cast).
    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu"
                      and xyz.dtype == jnp.float32)
    if use_pallas and not exact_knn and xyz.dtype == jnp.float32:
        from toyslam_tpu.ops import nn_pallas

        sq = jnp.sum(xyz * xyz, 1)
        tgt_t = jnp.where(mask[None, :], xyz.T, 0.0)
        tgt_sq = jnp.where(mask, sq, _BIG)[None, :]
        nd = nn_pallas.neg_dist_bf16(xyz, sq[:, None], tgt_t, tgt_sq,
                                     interpret=interpret)
    else:
        nd = None
    if nd is not None:
        negd, idx = jax.lax.approx_max_k(nd, k)
        negd = negd.astype(xyz.dtype)
    else:
        prec = _HP if exact_knn else jax.lax.Precision.HIGH
        d = (
            jnp.sum(xyz * xyz, 1)[:, None]
            - 2.0 * jnp.matmul(xyz, xyz.T, precision=prec)
            + jnp.sum(xyz * xyz, 1)[None, :]
        )
        d = jnp.where(mask[None, :], d, _BIG)
        if exact_knn:
            negd, idx = jax.lax.top_k(-d, k)  # includes self (d=0)
        elif d.dtype == jnp.float32:
            negd, idx = jax.lax.approx_max_k(-d.astype(jnp.bfloat16), k)
            negd = negd.astype(xyz.dtype)
        else:  # f64 oracle path: keep full-precision ranking
            negd, idx = jax.lax.approx_max_k(-d, k)
    # Sparse clouds (< k valid points) select padded sentinels as
    # neighbors; their 1e9-scale coordinates would poison the mean/cov.
    # Gate on ALL k selected distances being real (reference skips points
    # lacking k true neighbors, ``gicp_omp_impl.hpp:48-124``); gated
    # points fall back to the identity covariance below.
    has_k_real = -negd[:, -1] < _BIG / 2
    nn = xyz[idx]  # [N, k, 3]
    mean = jnp.mean(nn, axis=1)
    c = nn - mean[:, None, :]
    cov = jnp.einsum("nki,nkj->nij", c, c, precision=_HP) / k

    (l0, l1, l2), vec = eigh3_soa(
        cov[:, 0, 0], cov[:, 0, 1], cov[:, 0, 2],
        cov[:, 1, 1], cov[:, 1, 2], cov[:, 2, 2],
    )
    # Recompose with eigenvalues (epsilon, 1, 1) — ascending order
    e = jnp.asarray(epsilon, xyz.dtype)

    def recompose(i, j):
        return (e * vec[i * 3 + 0] * vec[j * 3 + 0]
                + vec[i * 3 + 1] * vec[j * 3 + 1]
                + vec[i * 3 + 2] * vec[j * 3 + 2])

    C = jnp.stack([
        jnp.stack([recompose(0, 0), recompose(0, 1), recompose(0, 2)], -1),
        jnp.stack([recompose(0, 1), recompose(1, 1), recompose(1, 2)], -1),
        jnp.stack([recompose(0, 2), recompose(1, 2), recompose(2, 2)], -1),
    ], -2)  # [N, 3, 3]
    ok = mask & has_k_real
    return jnp.where(ok[:, None, None], C, jnp.eye(3, dtype=xyz.dtype))


def gicp_align(source: PointCloud, target: PointCloud, guess=None,
               config: GICPConfig = GICPConfig()) -> GICPResult:
    dtype = source.xyzi.dtype
    src = source.xyzi[:, :3]
    tgt = target.xyzi[:, :3]
    if guess is None:
        guess = jnp.eye(4, dtype=dtype)

    C_src = compute_covariances(src, source.mask,
                                config.k_correspondences,
                                config.gicp_epsilon, config.exact_knn,
                                use_pallas=config.use_pallas_cov)
    C_tgt = compute_covariances(tgt, target.mask,
                                config.k_correspondences,
                                config.gicp_epsilon, config.exact_knn,
                                use_pallas=config.use_pallas_cov)
    tgt_sq = jnp.sum(tgt * tgt, 1)
    max_d2 = config.max_correspondence_distance ** 2

    use_pallas_nn = config.use_pallas_nn
    if use_pallas_nn is None:
        use_pallas_nn = (jax.default_backend() == "tpu"
                         and dtype == jnp.float32)
    if use_pallas_nn:
        # Kernel operands: zeroed invalid columns + |t|^2 sentinel (see
        # ops/nn_pallas.py docstring).
        tgt_zT = jnp.where(target.mask[:, None], tgt, 0.0).T
        tsq_sent = jnp.where(target.mask,
                             jnp.sum(tgt_zT * tgt_zT, 0), _BIG)[None]

    use_pallas_terms = config.use_pallas_terms
    if use_pallas_terms is None:
        use_pallas_terms = (jax.default_backend() == "tpu"
                            and dtype == jnp.float32)
    use_pallas_terms = use_pallas_terms and src.shape[0] % 1024 == 0

    def inverse3(M):
        a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
        e, f = M[..., 1, 1], M[..., 1, 2]
        i = M[..., 2, 2]
        A = e * i - f * f
        B = -(b * i - f * c)
        C_ = b * f - e * c
        det = a * A + b * B + c * C_
        inv = 1.0 / det
        out = jnp.stack([
            jnp.stack([A, B, C_], -1),
            jnp.stack([B, a * i - c * c, -(a * f - b * c)], -1),
            jnp.stack([C_, -(a * f - b * c), a * e - b * b], -1),
        ], -2)
        return out * inv[..., None, None]

    def outer_body(carry):
        T, it, _conv, _err = carry
        R = T[:3, :3]
        moved = jnp.matmul(src, R.T, precision=_HP) + T[:3, 3]
        nn = None
        if use_pallas_nn:
            from toyslam_tpu.ops import nn_pallas

            nn = nn_pallas.nearest_neighbor(moved, tgt_zT, tsq_sent,
                                            mode=config.nn_mode)
        if nn is not None:
            part, nn_i = nn
            nn_d = part + jnp.sum(moved * moved, 1)
        else:
            d = (
                jnp.sum(moved * moved, 1)[:, None]
                - 2.0 * jnp.matmul(moved, tgt.T, precision=_HP)
                + tgt_sq[None, :]
            )
            # Mask the FULL distance, not just |q|^2: for a padded target
            # point at the 1e9 sentinel the cross term -2 p.q (~ -2e11)
            # would dominate any additive penalty on |q|^2 and make pads
            # the nearest neighbor.
            d = jnp.where(target.mask[None, :], d, _BIG)
            # argmin reduction, NOT top_k: TPU top_k lowers to a lane sort
            # (measured ~44x slower than the min-reduction at [16k, 16k])
            nn_i = jnp.argmin(d, axis=1)
            nn_d = jnp.min(d, axis=1)
        corr_ok = source.mask & (nn_d < max_d2)

        q = tgt[nn_i]  # matched target points
        C_b = C_tgt[nn_i]

        # Mahalanobis M = (C_B + R C_A R^T)^-1 per pair (``impl:425-436``)
        RCA = jnp.einsum("ij,njk,lk->nil", R, C_src, R, precision=_HP)
        Minv = C_b + RCA
        M = inverse3(Minv)
        w = corr_ok.astype(dtype)

        def _finish(T_new, T_prev, it_, q_, w_):
            # Convergence on transform change (``transformation_epsilon``)
            dT = jnp.abs(T_new - T_prev)
            conv_ = (jnp.max(dT[:3, 3]) < config.transformation_epsilon) & (
                jnp.max(dT[:3, :3]) < config.rotation_epsilon)
            r_fin = jnp.matmul(src, T_new[:3, :3].T,
                               precision=_HP) + T_new[:3, 3] - q_
            err_ = jnp.sum(jnp.sum(r_fin * r_fin, -1) * w_) / jnp.maximum(
                jnp.sum(w_), 1.0)
            return (T_new, it_ + 1, conv_, err_)

        if use_pallas_terms:
            from toyslam_tpu.ops import gicp_pallas

            R_N = src.shape[0] // 128
            xyz3 = src.T.reshape(3, R_N, 128)
            q3 = q.T.reshape(3, R_N, 128)
            m6 = jnp.stack([
                M[:, 0, 0], M[:, 0, 1], M[:, 0, 2],
                M[:, 1, 1], M[:, 1, 2], M[:, 2, 2],
            ]).reshape(6, R_N, 128)
            w1 = w.reshape(R_N, 128)

            def gn_body(_, Tin):
                Rn = Tin[:3, :3]
                tn = Tin[:3, 3]
                params = jnp.concatenate([Rn.reshape(-1), tn])[None]
                s27 = gicp_pallas.gicp_terms(params, xyz3, q3, m6, w1)
                g = s27[:6]
                iu = jnp.triu_indices(3)
                A_tt = jnp.zeros((3, 3), dtype).at[iu].set(
                    s27[6:12]).at[iu[1], iu[0]].set(s27[6:12])
                A_tr = s27[12:21].reshape(3, 3)
                A_rr = jnp.zeros((3, 3), dtype).at[iu].set(
                    s27[21:27]).at[iu[1], iu[0]].set(s27[21:27])
                A = jnp.block([[A_tt, A_tr], [A_tr.T, A_rr]])
                A = A + config.damping * jnp.eye(6, dtype=dtype)
                dx = -jnp.linalg.solve(A, g)
                return se3.make_transform(
                    se3.so3_exp(dx[3:6]) @ Rn, tn + dx[:3])

            T_new = jax.lax.fori_loop(
                0, config.inner_iterations, gn_body, T)
            return _finish(T_new, T, it, q, w)

        def gn_body(_, Tin):
            Rn = Tin[:3, :3]
            tn = Tin[:3, 3]
            p_t = jnp.matmul(src, Rn.T, precision=_HP) + tn
            r = p_t - q  # [N, 3]
            Mr = jnp.einsum("nij,nj->ni", M, r, precision=_HP)
            # J wrt [t, theta] (left perturbation): dr/dt = I,
            # dr/dtheta = -[R p]x
            Rp = jnp.matmul(src, Rn.T, precision=_HP)
            # A = sum_n J^T M J, g = sum_n J^T M r
            # translation block: sum M; cross terms via skew
            # Build per-point J^T M rows using component form:
            # (J^T M r)_t = Mr ; (J^T M r)_theta = Rp x Mr
            g_t = jnp.sum(Mr * w[:, None], axis=0)
            g_r = jnp.sum(jnp.cross(Rp, Mr) * w[:, None], axis=0)
            g = jnp.concatenate([g_t, g_r])

            # Hessian: [[sum M, sum M S^T],[sum S M, sum S M S^T]] with
            # S = skew(Rp) acting as J_theta = -S
            S = se3.skew(Rp)  # [N, 3, 3]
            # J_theta = -S, so A_tr = M J_theta = -M S = M S^T (S skew)
            MS = jnp.einsum("nij,nkj->nik", M, S, precision=_HP)  # M S^T
            A_tt = jnp.einsum("n,nij->ij", w, M, precision=_HP)
            A_tr = jnp.einsum("n,nik->ik", w, MS, precision=_HP)
            SM = jnp.einsum("nij,njk->nik", S, M, precision=_HP)
            A_rr = jnp.einsum("n,nij,nkj->ik", w, SM, S, precision=_HP)
            A = jnp.block([[A_tt, A_tr], [A_tr.T, A_rr]])
            A = A + config.damping * jnp.eye(6, dtype=dtype)
            dx = -jnp.linalg.solve(A, g)
            T_new = se3.make_transform(
                se3.so3_exp(dx[3:6]) @ Rn, tn + dx[:3])
            return T_new

        T_new = jax.lax.fori_loop(0, config.inner_iterations, gn_body, T)
        return _finish(T_new, T, it, q, w)

    def outer_cond(carry):
        _T, it, conv, _err = carry
        return (~conv) & (it < config.max_iterations)

    T, it, conv, err = jax.lax.while_loop(
        outer_cond, outer_body,
        (guess.astype(dtype), jnp.zeros((), jnp.int32), jnp.asarray(False),
         jnp.asarray(jnp.inf, dtype)),
    )
    return GICPResult(transform=T, converged=conv, iterations=it, error=err)
