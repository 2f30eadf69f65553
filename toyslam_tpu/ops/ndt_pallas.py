"""Pallas TPU kernel for the NDT derivative accumulation.

The NDT derivative evaluation in plain XLA materializes ~36 [K*N]-sized
elementwise channels in HBM (expanded transforms, angular projections, the
28 term products) — measured ~2.1 ms per evaluation at K*N = 172k, pure
HBM-bandwidth waste. This kernel computes everything post-gather
in-register: inputs are only the 3 per-point source coordinates (re-read
per offset from a [3, N/128, 128] block) and the 10 packed per-(offset,
point) stats channels produced by the hash-table gather; the rigid
transform, the j_ang/h_ang projections (eqs. 6.19/6.21 [Magnusson 2009]),
the Mahalanobis forms, the Gaussian gate (eq. 6.9) and all 28
score/grad/Hessian terms (eqs. 6.12/6.13) are evaluated on the VPU and
reduced to one [28, 128] lane-sum tile accumulated across the sequential
grid. The final 128-lane reduction happens outside (tiny).

Reference hot loop: ``computeDerivatives`` + ``updateDerivatives``
(``ndt_omp/include/pclomp/ndt_omp_impl.hpp:178-285,483-537``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_TERMS = 28  # 1 score + 6 gradient + 21 Hessian upper triangle

# params layout (SMEM [1, 83]):
#   0: d1    1: d2
#   2..13:  T[:3, :] row-major (R00 R01 R02 t0 / R10.. t1 / R20.. t2)
#   14..37: j_tab [8, 3] row-major
#   38..82: h_tab [15, 3] row-major
_P_T = 2
_P_J = 14
_P_H = 38


def _kernel(par_ref, xyz_ref, st_ref, out_ref):
    i = pl.program_id(0) + pl.program_id(1)  # only for the init guard

    d1 = par_ref[0, 0]
    d2 = par_ref[0, 1]

    x = xyz_ref[0]
    y = xyz_ref[1]
    z = xyz_ref[2]

    def rowdot(base, r):
        return (par_ref[0, base + 3 * r] * x
                + par_ref[0, base + 3 * r + 1] * y
                + par_ref[0, base + 3 * r + 2] * z)

    # Transformed point (T has 4 entries per row: R row + t)
    tx = (par_ref[0, _P_T + 0] * x + par_ref[0, _P_T + 1] * y
          + par_ref[0, _P_T + 2] * z + par_ref[0, _P_T + 3])
    ty = (par_ref[0, _P_T + 4] * x + par_ref[0, _P_T + 5] * y
          + par_ref[0, _P_T + 6] * z + par_ref[0, _P_T + 7])
    tz = (par_ref[0, _P_T + 8] * x + par_ref[0, _P_T + 9] * y
          + par_ref[0, _P_T + 10] * z + par_ref[0, _P_T + 11])

    mx, my, mz = st_ref[0], st_ref[1], st_ref[2]
    cxx, cxy, cxz = st_ref[3], st_ref[4], st_ref[5]
    cyy, cyz, czz = st_ref[6], st_ref[7], st_ref[8]
    gatef = st_ref[9]

    qx = tx - mx
    qy = ty - my
    qz = tz - mz
    Cqx = cxx * qx + cxy * qy + cxz * qz
    Cqy = cxy * qx + cyy * qy + cyz * qz
    Cqz = cxz * qx + cyz * qy + czz * qz
    qCq = qx * Cqx + qy * Cqy + qz * Cqz

    e = jnp.exp(-0.5 * d2 * qCq)
    exc = d2 * e
    gate = jnp.where((exc <= 1.0) & (exc >= 0.0) & (gatef > 0.5), 1.0, 0.0)
    e = e * gate
    factor = d1 * d2 * e

    # Per-point angular projections x . j_row / x . h_row (eq. 6.19/6.21)
    xj = [rowdot(_P_J, r) for r in range(8)]
    xh = [rowdot(_P_H, r) for r in range(15)]

    u = (
        Cqx,
        Cqy,
        Cqz,
        Cqy * xj[0] + Cqz * xj[1],
        Cqx * xj[2] + Cqy * xj[3] + Cqz * xj[4],
        Cqx * xj[5] + Cqy * xj[6] + Cqz * xj[7],
    )

    C = [[cxx, cxy, cxz],
         [cxy, cyy, cyz],
         [cxz, cyz, czz]]
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


def _kernel_raw(par_ref, xyz_ref, aux_ref, st_ref, out_ref):
    """Raw-gather variant: consumes the [K*N, 16] hash-table gather output
    DIRECTLY (one in-kernel transpose per 1024-point block) and computes
    the id-verification gate in-register from compact aux channels.

    Motivation (measured, exact-control-flow 256k odometry trace): the
    gather output tiles to (8, 128) with only 16 lanes used, and the XLA
    unpack (column slices for the id check, the gate and-reduce, the
    9-channel transpose copy) re-reads that 8x-padded buffer ~3 times per
    evaluation — ~3.5 ms/scan at ~13 evaluations/scan. Here the kernel is
    the padded buffer's ONLY consumer.
    """
    i = pl.program_id(0) + pl.program_id(1)  # only for the init guard

    d1 = par_ref[0, 0]
    d2 = par_ref[0, 1]

    x = xyz_ref[0]
    y = xyz_ref[1]
    z = xyz_ref[2]

    def rowdot(base, r):
        return (par_ref[0, base + 3 * r] * x
                + par_ref[0, base + 3 * r + 1] * y
                + par_ref[0, base + 3 * r + 2] * z)

    tx = (par_ref[0, _P_T + 0] * x + par_ref[0, _P_T + 1] * y
          + par_ref[0, _P_T + 2] * z + par_ref[0, _P_T + 3])
    ty = (par_ref[0, _P_T + 4] * x + par_ref[0, _P_T + 5] * y
          + par_ref[0, _P_T + 6] * z + par_ref[0, _P_T + 7])
    tz = (par_ref[0, _P_T + 8] * x + par_ref[0, _P_T + 9] * y
          + par_ref[0, _P_T + 10] * z + par_ref[0, _P_T + 11])

    # [1024, 16] raw rows -> [16, 8, 128] channel blocks (in-register)
    st = st_ref[...].T.reshape(16, 8, 128)
    mx, my, mz = st[0], st[1], st[2]
    cxx, cxy, cxz = st[3], st[4], st[5]
    cyy, cyz, czz = st[6], st[7], st[8]
    vox, id_lo, id_hi = st[9], st[10], st[11]

    # Gate (mirrors gather_neighborhood): in-bounds & masked (aux okm),
    # id halves match the expected voxel id, exactly-one-voxel occupancy.
    nvid_lo = aux_ref[0]
    nvid_hi = aux_ref[1]
    okm = aux_ref[2]
    gatef = jnp.where(
        (okm > 0.5) & (id_lo == nvid_lo) & (id_hi == nvid_hi)
        & (vox > 0.5) & (vox < 1.5), 1.0, 0.0)

    qx = tx - mx
    qy = ty - my
    qz = tz - mz
    Cqx = cxx * qx + cxy * qy + cxz * qz
    Cqy = cxy * qx + cyy * qy + cyz * qz
    Cqz = cxz * qx + cyz * qy + czz * qz
    qCq = qx * Cqx + qy * Cqy + qz * Cqz

    e = jnp.exp(-0.5 * d2 * qCq)
    exc = d2 * e
    gate = jnp.where((exc <= 1.0) & (exc >= 0.0) & (gatef > 0.5), 1.0, 0.0)
    e = e * gate
    factor = d1 * d2 * e

    xj = [rowdot(_P_J, r) for r in range(8)]
    xh = [rowdot(_P_H, r) for r in range(15)]

    u = (
        Cqx,
        Cqy,
        Cqz,
        Cqy * xj[0] + Cqz * xj[1],
        Cqx * xj[2] + Cqy * xj[3] + Cqz * xj[4],
        Cqx * xj[5] + Cqy * xj[6] + Cqz * xj[7],
    )

    C = [[cxx, cxy, cxz],
         [cxy, cyy, cyz],
         [cxz, cyz, czz]]
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


def ndt_terms_raw(params, xyz3, aux3, raw16, interpret: bool = False):
    """Run the fused derivative kernel on RAW gather output.

    params: [1, 83] f32 scalars (same layout as ``ndt_terms``);
    xyz3: [3, R_N, 128] per-point source coordinates (R_N = N/128,
    R_N % 8 == 0);
    aux3: [3, K*R_N, 128] f32 — expected voxel id low/high 16-bit halves
    and the in-bounds & source-mask flag, offset-major;
    raw16: [K*N, 16] f32 — the hash-table row gather output, untouched.
    Returns [28] sums. Bit-identical inputs produce the same terms as
    ``ndt_terms`` fed the XLA-unpacked channels.
    """
    R_N = xyz3.shape[1]
    K = aux3.shape[1] // R_N
    tiles = R_N // 8  # 1024 points per block
    grid = (K, tiles)

    in_specs = [
        pl.BlockSpec((1, 83), lambda k, i: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((3, 8, 128), lambda k, i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, 8, 128),
                     lambda k, i, t=tiles: (0, k * t + i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1024, 16),
                     lambda k, i, t=tiles: (k * t + i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out = pl.pallas_call(
        _kernel_raw,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((N_TERMS, 128), lambda k, i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_TERMS, 128), jnp.float32),
        interpret=interpret,
    )(params, xyz3, aux3, raw16)
    return jnp.sum(out, axis=1)


def _repack_kernel(aux_ref, st_ref, out_ref):
    st = st_ref[...].T.reshape(16, 8, 128)  # [1024, 16] -> channels
    nvid_lo = aux_ref[0]
    nvid_hi = aux_ref[1]
    okm = aux_ref[2]
    gate = jnp.where(
        (okm > 0.5) & (st[10] == nvid_lo) & (st[11] == nvid_hi)
        & (st[9] > 0.5) & (st[9] < 1.5), 1.0, 0.0)
    out_ref[...] = jnp.concatenate([st[:9], gate[None]], axis=0)


def ndt_repack(aux3, raw16, interpret: bool = False):
    """Raw [K*N, 16] gather output -> the compact [10, K*N/128, 128]
    packed stats (9 channels + the id-verification gate) in ONE pass.

    Used by the frozen/turbo gather sites, where the stats must live in
    compact form (carried across Newton iterations, re-read by several
    line-search trials): the XLA unpack paid ~3 separate passes over the
    8x lane-padded gather buffer per regather (slice_bitcast +
    slice_reduce + and_reduce + transpose copies — measured ~1.8 ms/scan
    on the default 256k config, profile_exact_trace.py --default). Same
    gate semantics as ``gather_neighborhood``'s jnp path, bit-identical
    output channels.
    """
    KR = aux3.shape[1]
    tiles = KR // 8  # 1024 rows per block
    out = pl.pallas_call(
        _repack_kernel,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((3, 8, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1024, 16), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((10, 8, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((10, KR, 128), jnp.float32),
        interpret=interpret,
    )(aux3, raw16)
    return out


def ndt_terms(params, xyz3, stats10, block_tiles: int | None = None,
              interpret: bool = False):
    """Run the fused derivative kernel.

    params: [1, 83] f32 scalars (layout at the top of this module);
    xyz3: [3, R_N, 128] per-point source coordinates (R_N = N/128);
    stats10: [10, K*R_N, 128] packed gather output in offset-major order
    (``NeighborhoodStats.packed`` reshaped). Returns [28] sums.
    """
    R_N = xyz3.shape[1]
    K = stats10.shape[1] // R_N
    if block_tiles is None:
        # Mosaic requires the block's second-to-last dim divisible by 8
        # (or equal to the full dim) — callers gate on R_N % 8 == 0.
        block_tiles = 8
        for b in (128, 96, 64, 48, 40, 32, 24, 16, 8):
            if R_N % b == 0:
                block_tiles = b
                break
    tiles = R_N // block_tiles
    grid = (K, tiles)

    in_specs = [
        pl.BlockSpec((1, 83), lambda k, i: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((3, block_tiles, 128), lambda k, i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((10, block_tiles, 128),
                     lambda k, i, t=tiles: (0, k * t + i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((N_TERMS, 128), lambda k, i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_TERMS, 128), jnp.float32),
        interpret=interpret,
    )(params, xyz3, stats10)
    return jnp.sum(out, axis=1)
