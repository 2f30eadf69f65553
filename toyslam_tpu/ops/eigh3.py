"""Batched symmetric 3x3 eigendecomposition via cyclic Jacobi rotations.

The NDT voxel map needs eigenvalues *and* eigenvectors of every voxel
covariance (for the near-singularity inflation of eq. 6.11 [Magnusson 2009],
reference ``voxel_grid_covariance_omp_impl.hpp:332-357``).

TPU layout note: the hot entry point is :func:`eigh3_soa`, which works on
structure-of-arrays components (six ``[V]`` arrays for the symmetric matrix,
nine for the eigenvectors). Materializing ``[V, 3, 3]`` tensors on TPU pads
every 3x3 tile to (8, 128) — a ~400x memory blowup per op — so all Jacobi
updates here are scalar component expressions on clean 1D lanes.
:func:`eigh3` is a thin AoS wrapper kept for tests and generic callers.
"""

from __future__ import annotations

import jax.numpy as jnp


def _rot_coeffs(app, aqq, apq):
    """Stable Jacobi rotation (c, s) zeroing the (p, q) entry, branch-free."""
    tau = (aqq - app) / (2.0 * jnp.where(apq == 0, 1.0, apq))
    t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    t = jnp.where(apq == 0, 0.0, jnp.where(tau == 0, 1.0, t))
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    return c, t * c


def eigh3_soa(a00, a01, a02, a11, a12, a22, sweeps: int = 5):
    """Eigendecomposition of symmetric 3x3 matrices in component form.

    Inputs: the six unique components, each shape [...]. Returns
    (evals: 3-tuple ascending, evecs: 9-tuple row-major v[i][j] = component i
    of eigenvector j), all shape [...].
    """
    one = jnp.ones_like(a00)
    zero = jnp.zeros_like(a00)
    # Scale for numerical stability
    scale = jnp.maximum(
        jnp.maximum(jnp.maximum(jnp.abs(a00), jnp.abs(a11)),
                    jnp.maximum(jnp.abs(a22), jnp.abs(a01))),
        jnp.maximum(jnp.abs(a02), jnp.abs(a12)),
    )
    scale = jnp.maximum(scale, 1e-30)
    A = [[a00 / scale, a01 / scale, a02 / scale],
         [a01 / scale, a11 / scale, a12 / scale],
         [a02 / scale, a12 / scale, a22 / scale]]
    V = [[one, zero, zero], [zero, one, zero], [zero, zero, one]]

    for _ in range(sweeps):
        for (p, q) in ((0, 1), (0, 2), (1, 2)):
            c, s = _rot_coeffs(A[p][p], A[q][q], A[p][q])
            r = 3 - p - q  # the untouched index
            # Rows/cols p and q rotate; A symmetric, update in closed form.
            app = c * c * A[p][p] - 2.0 * s * c * A[p][q] + s * s * A[q][q]
            aqq = s * s * A[p][p] + 2.0 * s * c * A[p][q] + c * c * A[q][q]
            arp = c * A[r][p] - s * A[r][q]
            arq = s * A[r][p] + c * A[r][q]
            A[p][p], A[q][q] = app, aqq
            A[p][q] = A[q][p] = zero
            A[r][p] = A[p][r] = arp
            A[r][q] = A[q][r] = arq
            for i in range(3):
                vip = c * V[i][p] - s * V[i][q]
                viq = s * V[i][p] + c * V[i][q]
                V[i][p], V[i][q] = vip, viq

    evals = [A[0][0] * scale, A[1][1] * scale, A[2][2] * scale]

    # Sort ascending with a 3-element sorting network (branch-free swaps).
    def cswap(i, j):
        swap = evals[i] > evals[j]
        evals[i], evals[j] = (
            jnp.where(swap, evals[j], evals[i]),
            jnp.where(swap, evals[i], evals[j]),
        )
        for r_ in range(3):
            V[r_][i], V[r_][j] = (
                jnp.where(swap, V[r_][j], V[r_][i]),
                jnp.where(swap, V[r_][i], V[r_][j]),
            )

    cswap(0, 1)
    cswap(1, 2)
    cswap(0, 1)
    return tuple(evals), tuple(V[i][j] for i in range(3) for j in range(3))


def eigh3(A, sweeps: int = 5):
    """AoS wrapper: A [..., 3, 3] symmetric -> (evals [..., 3] ascending,
    evecs [..., 3, 3] columns), matching Eigen::SelfAdjointEigenSolver."""
    evals, evecs = eigh3_soa(
        A[..., 0, 0], A[..., 0, 1], A[..., 0, 2],
        A[..., 1, 1], A[..., 1, 2], A[..., 2, 2],
        sweeps=sweeps,
    )
    ev = jnp.stack(evals, axis=-1)
    Vm = jnp.stack(
        [jnp.stack(evecs[3 * i: 3 * i + 3], axis=-1) for i in range(3)],
        axis=-2,
    )
    return ev, Vm
