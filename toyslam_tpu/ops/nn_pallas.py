"""Pallas TPU kernel for brute-force nearest-neighbor search.

GICP's correspondence search (``gicp_omp_impl.hpp:425-436`` uses a
KD-tree per point; the TPU-native design replaces it with a dense
distance argmin) materializes an [N, M] distance matrix in HBM when
written in plain XLA: at the sample-pair scale (16k x 16k f32) that is
~1 GB of HBM write+read traffic PER outer GICP iteration, completely
bandwidth-bound. This kernel never materializes the matrix: it tiles
source rows against target columns, computes each [TN, TM] distance
tile on the MXU ( -2 s.t + |t|^2 ; the |s|^2 row constant cannot change
the argmin and is added back by the caller), and keeps a running
(min, argmin) pair in the revisited output block across the sequential
target-tile grid axis. HBM traffic drops to the two point sets plus
[N] outputs — a few MB.

Masked (padded) target points are handled by the caller: their
coordinates must be zeroed and their |t|^2 entry set to a large
sentinel, so d = sentinel - 0 never wins the min.

Tie-breaking matches ``jnp.argmin`` (first occurrence): within a tile
the smallest column index among minima is taken, and a strict ``<``
across tiles keeps the earliest tile's winner.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _make_kernel(exact: bool):
  def _kernel(src_ref, tgt_t_ref, tsq_ref, best_ref, idx_ref):
    j = pl.program_id(1)
    s = src_ref[...]  # [TN, 3]
    t_t = tgt_t_ref[...]  # [3, TM]
    tsq = tsq_ref[...]  # [1, TM]
    if exact:
        # HIGHEST (6 bf16 MXU passes): the default single bf16 pass
        # loses ~0.4% relative on ~100 m coordinates — meters of
        # distance error, enough to flip real correspondences
        # (measured: GICP error 0.28 vs 0.18 on the sample pair).
        st = jnp.dot(s, t_t, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    else:
        # Manual bf16x3 split (~= Precision.HIGH, which Mosaic does not
        # support): s.t = s_hi.t_hi + s_hi.t_lo + s_lo.t_hi, dropping
        # the lo.lo term. 3 MXU passes instead of 6 — measured 1.49 vs
        # 2.43 ms/call at [16k, 16k]. Residual error ~2^-16 relative on
        # the cross term flips ~2.5% of sample-pair correspondences to
        # a neighbor at most ~0.05 m^2 farther — harmless for GICP's
        # plane-to-plane objective (end-to-end transform delta < 0.2 mm,
        # tests_tpu), but NOT bit-exact: callers that advertise
        # jnp.argmin equality (ICP) keep exact=True.
        s_hi = s.astype(jnp.bfloat16)
        s_lo = (s - s_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        t_hi = t_t.astype(jnp.bfloat16)
        t_lo = (t_t - t_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        st = jnp.dot(s_hi, t_hi, preferred_element_type=jnp.float32)
        st += jnp.dot(s_hi, t_lo, preferred_element_type=jnp.float32)
        st += jnp.dot(s_lo, t_hi, preferred_element_type=jnp.float32)
    d = tsq - 2.0 * st
    local_best = jnp.min(d, axis=1)  # [TN]
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    in_tile = jnp.min(
        jnp.where(d <= local_best[:, None], col, 1 << 30), axis=1)
    local_arg = in_tile + j * d.shape[1]

    @pl.when(j == 0)
    def _():
        best_ref[...] = local_best[:, None]
        idx_ref[...] = local_arg[:, None]

    @pl.when(j != 0)
    def _():
        prev = best_ref[...][:, 0]
        prev_i = idx_ref[...][:, 0]
        take = local_best < prev
        best_ref[...] = jnp.where(take, local_best, prev)[:, None]
        idx_ref[...] = jnp.where(take, local_arg, prev_i)[:, None]

  return _kernel


def _pick_tile(n, candidates):
    for c in candidates:
        if n % c == 0:
            return c
    return None


def _neg_dist_kernel(src_ref, ssq_ref, tgt_t_ref, tsq_ref, out_ref):
    s = src_ref[...]  # [TN, 3]
    ssq = ssq_ref[...]  # [TN, 1]
    t_t = tgt_t_ref[...]  # [3, TM]
    tsq = tsq_ref[...]  # [1, TM]
    # bf16x3 ranking product (see _make_kernel exact=False)
    s_hi = s.astype(jnp.bfloat16)
    s_lo = (s - s_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    t_hi = t_t.astype(jnp.bfloat16)
    t_lo = (t_t - t_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    st = jnp.dot(s_hi, t_hi, preferred_element_type=jnp.float32)
    st += jnp.dot(s_hi, t_lo, preferred_element_type=jnp.float32)
    st += jnp.dot(s_lo, t_hi, preferred_element_type=jnp.float32)
    out_ref[...] = (2.0 * st - tsq - ssq).astype(jnp.bfloat16)


def neg_dist_bf16(src_xyz, src_sq, tgt_t, tgt_sq, interpret: bool = False):
    """[N, M] bf16 NEGATED squared distances in one pass, as the operand
    of ``jax.lax.approx_max_k`` k-NN (GICP covariances).

    The plain-XLA covariance k-NN materializes the f32 distance matrix
    (1 GB at 16k), then re-reads it for the bf16 cast and the mask pass —
    three matrix-sized HBM passes before approx_max_k even starts. This
    kernel writes approx_max_k's operand directly: 3 bf16 MXU passes + one
    0.5 GB bf16 write, nothing else. Values match the jnp path's
    ``-(d).astype(bf16)`` up to fusion rounding of the adds: |s|^2 is
    subtracted IN-kernel before the cast — a row constant cannot change
    per-row ranking, but leaving it out would shift near-neighbor
    distances to ~|s|^2 magnitude where bf16 cannot resolve them.

    src_xyz [N, 3] f32; src_sq [N, 1] f32 = |s|^2; tgt_t [3, M] f32 with
    invalid columns zeroed; tgt_sq [1, M] f32 = |t|^2 or a >= 1e9
    sentinel for invalid columns. Returns None when shapes don't tile.
    """
    N = src_xyz.shape[0]
    M = tgt_t.shape[1]
    tn = _pick_tile(N, (256, 128, 64, 32, 16))
    tm = _pick_tile(M, (2048, 1024, 512, 256, 128))
    if tn is None or tm is None:
        return None
    grid = (N // tn, M // tm)
    return pl.pallas_call(
        _neg_dist_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tm), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn, tm), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, M), jnp.bfloat16),
        interpret=interpret,
    )(src_xyz, src_sq, tgt_t, tgt_sq)


def nearest_neighbor(src_xyz, tgt_xyz, tgt_valid_sq,
                     exact: bool = True,
                     interpret: bool = False):
    """argmin_m ( |src_n - tgt_m|^2 ) without materializing [N, M].

    src_xyz: [N, 3] f32 query points (every row is searched; mask the
    results in the caller).
    tgt_xyz: [3, M] f32 target points, transposed, with INVALID COLUMNS
    ZEROED by the caller.
    tgt_valid_sq: [1, M] f32 = |t|^2 for valid columns, a large sentinel
    (>= 1e9) for invalid ones.

    Returns (partial [N], idx [N] int32) where partial = min_m
    ( -2 s.t + |t|^2 ); the true squared distance is
    ``partial + |s|^2`` (add it in the caller — it does not affect the
    argmin). Falls back to None (caller should use the jnp path) when
    the shapes don't tile.

    exact=True ranks with a full-f32 (HIGHEST) distance matmul and
    matches jnp.argmin bit-for-bit; exact=False uses the ~1.6x faster
    bf16x3 3-pass matmul whose ~2^-16 relative ranking error can pick a
    near-tied neighbor (see _make_kernel).
    """
    N = src_xyz.shape[0]
    M = tgt_xyz.shape[1]
    tn = _pick_tile(N, (512, 256, 128, 64, 32, 16, 8))
    tm = _pick_tile(M, (2048, 1024, 512, 256, 128))
    if tn is None or tm is None:
        return None
    grid = (N // tn, M // tm)
    best, idx = pl.pallas_call(
        _make_kernel(exact),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tm), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tn, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
            jax.ShapeDtypeStruct((N, 1), jnp.int32),
        ),
        interpret=interpret,
    )(src_xyz, tgt_xyz, tgt_valid_sq)
    return best[:, 0], idx[:, 0]
