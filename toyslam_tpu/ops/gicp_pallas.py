"""Pallas TPU kernel for the GICP Gauss-Newton normal equations.

Each inner GN step of ``gicp_align`` (the TPU replacement for the
reference's BFGS inner optimizer, ``gicp_omp_impl.hpp:180-372``)
evaluates, per correspondence: the transformed residual r = R s + t - q,
the Mahalanobis product M r, and the 6x6 normal-equation blocks
[[sum w M,      sum w M S^T],
 [sum w S M,    sum w S M S^T]]  with  S = skew(R s),
plus the gradient [sum w M r, sum w (R s) x (M r)]. In plain XLA this is
~20 small elementwise/reduce ops per iteration over [N]-sized data —
measured ~0.57 ms per GN step at N = 16k (dispatch/fusion overhead, not
bandwidth), 18.4 ms of the sample-pair align's 70 ms.

This kernel fuses the whole evaluation: inputs are the per-point source
coordinates, matched target q, packed symmetric Mahalanobis M (6
channels) and weight — all constant across the inner loop except the
pose — and the pose enters as 12 SMEM scalars, so each GN step is ONE
kernel launch producing the 27 reduction channels (6 gradient + 6 A_tt
+ 9 A_tr + 6 A_rr upper) as a [27, 128] lane-sum tile. The 6x6 solve
stays outside (tiny).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_TERMS = 27  # 6 gradient + 6 A_tt upper + 9 A_tr + 6 A_rr upper

# params layout (SMEM [1, 12]): R row-major (9) then t (3)


def _kernel(par_ref, xyz_ref, q_ref, m_ref, w_ref, out_ref):
    i = pl.program_id(0)

    x, y, z = xyz_ref[0], xyz_ref[1], xyz_ref[2]
    qx, qy, qz = q_ref[0], q_ref[1], q_ref[2]
    m00, m01, m02 = m_ref[0], m_ref[1], m_ref[2]
    m11, m12, m22 = m_ref[3], m_ref[4], m_ref[5]
    w = w_ref[...]

    def R(r, c):
        return par_ref[0, 3 * r + c]

    # a = R s  (the rotated point, the skew axis); p = a + t
    ax = R(0, 0) * x + R(0, 1) * y + R(0, 2) * z
    ay = R(1, 0) * x + R(1, 1) * y + R(1, 2) * z
    az = R(2, 0) * x + R(2, 1) * y + R(2, 2) * z
    rx = ax + par_ref[0, 9] - qx
    ry = ay + par_ref[0, 10] - qy
    rz = az + par_ref[0, 11] - qz

    # Mr = M r (M symmetric)
    mrx = m00 * rx + m01 * ry + m02 * rz
    mry = m01 * rx + m11 * ry + m12 * rz
    mrz = m02 * rx + m12 * ry + m22 * rz

    # g_t = w Mr ; g_r = w (a x Mr)
    gtx, gty, gtz = w * mrx, w * mry, w * mrz
    grx = w * (ay * mrz - az * mry)
    gry = w * (az * mrx - ax * mrz)
    grz = w * (ax * mry - ay * mrx)

    # B = M S^T = -(M S); (M S)_i0 = M_i1 az - M_i2 ay,
    # (M S)_i1 = -M_i0 az + M_i2 ax, (M S)_i2 = M_i0 ay - M_i1 ax
    b00 = -(m01 * az - m02 * ay)
    b01 = -(-m00 * az + m02 * ax)
    b02 = -(m00 * ay - m01 * ax)
    b10 = -(m11 * az - m12 * ay)
    b11 = -(-m01 * az + m12 * ax)
    b12 = -(m01 * ay - m11 * ax)
    b20 = -(m12 * az - m22 * ay)
    b21 = -(-m02 * az + m22 * ax)
    b22 = -(m02 * ay - m12 * ax)

    # A_rr = S B: (S X)_0j = -az X_1j + ay X_2j ; (S X)_1j = az X_0j
    # - ax X_2j ; (S X)_2j = -ay X_0j + ax X_1j   (upper triangle only)
    c00 = -az * b10 + ay * b20
    c01 = -az * b11 + ay * b21
    c02 = -az * b12 + ay * b22
    c11 = az * b01 - ax * b21
    c12 = az * b02 - ax * b22
    c22 = -ay * b02 + ax * b12

    chans = (
        gtx, gty, gtz, grx, gry, grz,
        w * m00, w * m01, w * m02, w * m11, w * m12, w * m22,
        w * b00, w * b01, w * b02,
        w * b10, w * b11, w * b12,
        w * b20, w * b21, w * b22,
        w * c00, w * c01, w * c02, w * c11, w * c12, w * c22,
    )
    tile = jnp.stack([jnp.sum(c, axis=0) for c in chans])  # [27, 128]

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += tile


def gicp_terms(params, xyz3, q3, m6, w1, block_tiles: int | None = None,
               interpret: bool = False):
    """Run the fused GN-terms kernel.

    params: [1, 12] f32 (R row-major, then t);
    xyz3 / q3: [3, R_N, 128] source / matched-target coordinates;
    m6: [6, R_N, 128] packed symmetric Mahalanobis (00 01 02 11 12 22);
    w1: [R_N, 128] weights (0 for invalid correspondences).
    Returns [27] sums (layout in the module docstring).
    """
    R_N = xyz3.shape[1]
    if block_tiles is None:
        block_tiles = 8
        for b in (128, 96, 64, 48, 40, 32, 24, 16, 8):
            if R_N % b == 0:
                block_tiles = b
                break
    if R_N % block_tiles != 0:
        raise ValueError(
            f"gicp_terms: R_N={R_N} is not divisible by "
            f"block_tiles={block_tiles}; trailing rows would be silently "
            f"dropped from the GN sums. Pad the point count or pass a "
            f"block_tiles that divides it.")
    tiles = R_N // block_tiles
    out = pl.pallas_call(
        _kernel,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((1, 12), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((3, block_tiles, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, block_tiles, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, block_tiles, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_tiles, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N_TERMS, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_TERMS, 128), jnp.float32),
        interpret=interpret,
    )(params, xyz3, q3, m6, w1)
    return jnp.sum(out, axis=1)
