"""Pallas TPU kernel for the NDT derivative accumulation.

The NDT derivative evaluation is ~25 XLA kernels (gathers break fusion and
every reduction/elementwise chain costs a dispatch + HBM round trip). TPU
has no hardware random-gather path inside Pallas ("Cannot do int indexing"),
so the two voxel-table gathers stay in XLA; everything after them — the
Mahalanobis forms, the Gaussian gate (eq. 6.9), the gradient u-vectors and
all 21 Hessian contributions (eqs. 6.12/6.13 [Magnusson 2009]) — fuses into
ONE kernel that streams the gathered channels once and emits 28
lane-partial sums.

Layout: all channels arrive as [R, 128] tiles (R = N*K/128); the kernel
reduces over sublanes per grid step and accumulates a [28, 128] lane-sum
tile across the sequential grid; the final 128-lane reduction happens
outside (tiny).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_TERMS = 28  # 1 score + 6 gradient + 21 Hessian upper triangle


def _kernel(d_ref, tx, ty, tz, mx, my, mz,
            cxx, cxy, cxz, cyy, cyz, czz,
            gatef, xj0, xj1, xj2, xj3, xj4, xj5, xj6, xj7,
            xh_ref, out_ref):
    i = pl.program_id(0)
    d1 = d_ref[0, 0]
    d2 = d_ref[0, 1]
    n_rows = d_ref[0, 2].astype(jnp.int32)  # valid rows (mask OOB pad)
    block_rows = tx.shape[0]
    row_ids = (i * block_rows
               + jax.lax.broadcasted_iota(jnp.int32, tx.shape, 0))
    in_range = row_ids < n_rows

    def clean(ref):
        # Zero out-of-range rows: the last grid block may read past R, and
        # garbage there would poison the sums through 0 * inf/NaN.
        return jnp.where(in_range, ref[...], 0.0)

    qx = clean(tx) - clean(mx)
    qy = clean(ty) - clean(my)
    qz = clean(tz) - clean(mz)
    cxx_, cxy_, cxz_ = clean(cxx), clean(cxy), clean(cxz)
    cyy_, cyz_, czz_ = clean(cyy), clean(cyz), clean(czz)
    Cqx = cxx_ * qx + cxy_ * qy + cxz_ * qz
    Cqy = cxy_ * qx + cyy_ * qy + cyz_ * qz
    Cqz = cxz_ * qx + cyz_ * qy + czz_ * qz
    qCq = qx * Cqx + qy * Cqy + qz * Cqz

    e = jnp.exp(-0.5 * d2 * qCq)
    exc = d2 * e
    gate = jnp.where(
        (exc <= 1.0) & (exc >= 0.0) & (clean(gatef) > 0.5) & in_range,
        1.0, 0.0)
    e = e * gate
    factor = d1 * d2 * e

    xj = [clean(xj0), clean(xj1), clean(xj2), clean(xj3), clean(xj4),
          clean(xj5), clean(xj6), clean(xj7)]
    u = (
        Cqx,
        Cqy,
        Cqz,
        Cqy * xj[0] + Cqz * xj[1],
        Cqx * xj[2] + Cqy * xj[3] + Cqz * xj[4],
        Cqx * xj[5] + Cqy * xj[6] + Cqz * xj[7],
    )

    C = [[cxx_, cxy_, cxz_],
         [cxy_, cyy_, cyz_],
         [cxz_, cyz_, czz_]]
    CJ = [[C[r][1] * xj[0] + C[r][2] * xj[1],
           C[r][0] * xj[2] + C[r][1] * xj[3] + C[r][2] * xj[4],
           C[r][0] * xj[5] + C[r][1] * xj[6] + C[r][2] * xj[7]]
          for r in range(3)]

    def col_dot(a, v):
        if a == 0:
            return xj[0] * v[1] + xj[1] * v[2]
        if a == 1:
            return xj[2] * v[0] + xj[3] * v[1] + xj[4] * v[2]
        return xj[5] * v[0] + xj[6] * v[1] + xj[7] * v[2]

    xh = [jnp.where(in_range, xh_ref[k], 0.0) for k in range(15)]
    Hv = {
        (0, 0): Cqy * xh[0] + Cqz * xh[1],
        (0, 1): Cqy * xh[2] + Cqz * xh[3],
        (0, 2): Cqy * xh[4] + Cqz * xh[5],
        (1, 1): Cqx * xh[6] + Cqy * xh[7] + Cqz * xh[8],
        (1, 2): Cqx * xh[9] + Cqy * xh[10] + Cqz * xh[11],
        (2, 2): Cqx * xh[12] + Cqy * xh[13] + Cqz * xh[14],
    }

    partials = [jnp.sum(-d1 * e, axis=0)]
    for ui in u:
        partials.append(jnp.sum(factor * ui, axis=0))
    for a in range(6):
        for b in range(a, 6):
            contrib = -d2 * factor * u[a] * u[b]
            if a < 3 and b < 3:
                contrib = contrib + factor * C[a][b]
            elif a < 3 <= b:
                contrib = contrib + factor * CJ[a][b - 3]
            else:
                a_, b_ = a - 3, b - 3
                contrib = contrib + factor * (
                    col_dot(a_, [CJ[0][b_], CJ[1][b_], CJ[2][b_]])
                    + Hv[(a_, b_)]
                )
            partials.append(jnp.sum(contrib, axis=0))

    tile = jnp.stack(partials)  # [28, 128]

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += tile


def ndt_terms(d12, channels, xh_stack, block_rows: int = 256,
              interpret: bool = False):
    """Run the fused derivative kernel.

    d12: [1, 4] (d1, d2, R, 0) scalars; channels: tuple of 21 [R, 128] f32 arrays
    in the kernel's argument order (trans(3), mean(3), icov(6), gate,
    xj(8)); xh_stack: [15, R, 128]. Returns [28] sums.
    """
    R = channels[0].shape[0]
    grid = (pl.cdiv(R, block_rows),)

    in_specs = [pl.BlockSpec((1, 4), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)]
    in_specs += [
        pl.BlockSpec((block_rows, 128), lambda i: (i, 0),
                     memory_space=pltpu.VMEM)
        for _ in channels
    ]
    in_specs.append(
        pl.BlockSpec((15, block_rows, 128), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((N_TERMS, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_TERMS, 128), jnp.float32),
        interpret=interpret,
    )(d12, *channels, xh_stack)
    return jnp.sum(out, axis=1)
