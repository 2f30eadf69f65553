"""Batched symmetric 3x3 eigendecomposition via cyclic Jacobi rotations.

The NDT voxel map needs eigenvalues *and* eigenvectors of every voxel
covariance (for the near-singularity inflation of eq. 6.11 [Magnusson 2009],
reference ``voxel_grid_covariance_omp_impl.hpp:332-357``). XLA's
``jnp.linalg.eigh`` on TPU is a heavyweight generic path; for 3x3 matrices a
fixed number of branch-free Jacobi sweeps is exact to f32 precision, fully
vectorized on the VPU, and trivially vmap/batchable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HP = jax.lax.Precision.HIGHEST


def _jacobi_rotation(A, V, p, q):
    """One Jacobi rotation zeroing A[p,q], batched over leading dims."""
    app = A[..., p, p]
    aqq = A[..., q, q]
    apq = A[..., p, q]
    # Branch-free stable rotation angle computation
    tau = (aqq - app) / (2.0 * jnp.where(apq == 0, 1.0, apq))
    t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    t = jnp.where(apq == 0, 0.0, jnp.where(tau == 0, 1.0, t))
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    s = t * c

    # Build the rotation as a full 3x3 (cheap, keeps everything vectorized)
    G = jnp.zeros_like(A)
    idx = [0, 1, 2]
    for i in idx:
        G = G.at[..., i, i].set(jnp.where((i == p) | (i == q), c, 1.0))
    G = G.at[..., p, q].set(s)
    G = G.at[..., q, p].set(-s)

    # A' = G^T A G; V' = V G. Full f32 precision (TPU default would be bf16).
    A = jnp.einsum("...ji,...jk,...kl->...il", G, A, G, precision=_HP)
    V = jnp.einsum("...ij,...jk->...ik", V, G, precision=_HP)
    return A, V


def eigh3(A, sweeps: int = 8):
    """Eigendecomposition of symmetric [..., 3, 3] matrices.

    Returns (eigenvalues [..., 3] ascending, eigenvectors [..., 3, 3] with
    columns as eigenvectors), matching Eigen::SelfAdjointEigenSolver ordering.
    """
    dtype = A.dtype
    # Scale for numerical stability (covariances can be ~1e-6 .. 1e4)
    scale = jnp.maximum(jnp.max(jnp.abs(A), axis=(-1, -2), keepdims=True), 1e-30)
    A = A / scale
    V = jnp.broadcast_to(jnp.eye(3, dtype=dtype), A.shape)
    for _ in range(sweeps):
        for (p, q) in ((0, 1), (0, 2), (1, 2)):
            A, V = _jacobi_rotation(A, V, p, q)
    evals = jnp.stack([A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]], axis=-1)
    # Sort ascending, permute eigenvector columns accordingly
    order = jnp.argsort(evals, axis=-1)
    evals = jnp.take_along_axis(evals, order, axis=-1)
    V = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    return evals * scale[..., 0], V
