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

NN_MODES = ("highest", "x6", "x3")


def _split2(x):
    """Exact 2-way bf16 split: x == hi + lo up to the dropped sub-bf16
    tail (hi holds the top 8 mantissa bits, lo the next 8)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _split3(x):
    """Exact 3-way bf16 split: x == hi + mid + lo exactly for normal
    f32 (8 + 8 + 8 mantissa bits cover the 24-bit significand)."""
    hi = x.astype(jnp.bfloat16)
    r = x - hi.astype(jnp.float32)
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _ranking_dot(s, t_t, mode: str):
    """s @ t_t for *ranking* at the chosen accuracy/speed point.

    A plain single bf16 pass loses ~0.4% relative on ~100 m coordinates —
    meters of distance error, enough to flip real correspondences
    (measured: GICP error 0.28 vs 0.18 on the sample pair). The three
    modes above that floor (all measured on the v5e,
    benchmarks/diag_bf16_concat.py, max relative error vs a f64 oracle
    at 120 m coordinates):

    - "highest": ``Precision.HIGHEST`` — 6 bf16 MXU passes, 7.1e-8.
      Bit-identical to the jnp path's HIGHEST matmul, which is the ICP
      ``nn_mode="highest"`` jnp.argmin-equality contract.
    - "x6": the SAME 6-product hi/mid/lo expansion HIGHEST performs,
      stacked along the contraction dim as ONE K=18 bf16 MXU pass with
      f32 accumulation: 6.7e-6 measured (the dropped mid.lo/lo.lo terms
      are ~2^-24; the measured error is MXU accumulation-order rounding,
      same class as x3's). Not bit-equal to HIGHEST (different sum
      order).
    - "x3": the 3-product hi/lo expansion (~= Precision.HIGH, which
      Mosaic does not support natively) as ONE K=9 pass: 6.7e-6 — the
      dropped lo.lo cross term is ~2^-16 relative. Flips ~2.5% of
      sample-pair correspondences to a neighbor at most ~0.05 m^2
      farther — harmless for GICP's plane-to-plane objective
      (end-to-end transform delta < 0.2 mm, tests_tpu).

    The single-pass concat stacking was validated against the r3b
    "accuracy collapse": that experiment stacked K=6 ([hi|lo] against
    [hi;hi]), which algebraically DROPS the *.t_lo cross terms — a
    2.0e-3 (bf16-level) error by construction, not a Mosaic accumulation
    bug (diag_bf16_concat.py separates the hypotheses; TPU_NOTES "Root
    cause of the r3b concat collapse").
    """
    if mode == "highest":
        return jnp.dot(s, t_t, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    if mode == "x6":
        s_hi, s_mid, s_lo = _split3(s)
        t_hi, t_mid, t_lo = _split3(t_t)
        s18 = jnp.concatenate([s_hi, s_hi, s_mid, s_hi, s_lo, s_mid], 1)
        t18 = jnp.concatenate([t_hi, t_mid, t_hi, t_lo, t_hi, t_mid], 0)
        return jnp.dot(s18, t18, preferred_element_type=jnp.float32)
    if mode == "x3":
        s_hi, s_lo = _split2(s)
        t_hi, t_lo = _split2(t_t)
        s9 = jnp.concatenate([s_hi, s_hi, s_lo], 1)
        t9 = jnp.concatenate([t_hi, t_lo, t_hi], 0)
        return jnp.dot(s9, t9, preferred_element_type=jnp.float32)
    raise ValueError(f"unknown ranking mode {mode!r} (one of {NN_MODES})")


def _make_kernel(mode: str):
  def _kernel(src_ref, tgt_t_ref, tsq_ref, best_ref, idx_ref):
    j = pl.program_id(1)
    s = src_ref[...]  # [TN, 3]
    t_t = tgt_t_ref[...]  # [3, TM]
    tsq = tsq_ref[...]  # [1, TM]
    st = _ranking_dot(s, t_t, mode)
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
    # Single-pass x3 ranking product (see _ranking_dot): the result is
    # bf16-cast anyway, so the ~2^-16 x3 error class is invisible here.
    st = _ranking_dot(s, t_t, "x3")
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
                     mode: str = "highest",
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

    ``mode`` picks the ranking accuracy/speed point (see _ranking_dot):
    "highest" matches jnp.argmin bit-for-bit (6 MXU passes); "x6" is the
    same 6-product expansion as ONE K=18 pass (~1e-7-class values, not
    bit-equal); "x3" is the fastest single-pass ranking (~2^-16 cross
    term, may pick a near-tied neighbor).
    """
    N = src_xyz.shape[0]
    M = tgt_xyz.shape[1]
    tn = _pick_tile(N, (512, 256, 128, 64, 32, 16, 8))
    tm = _pick_tile(M, (2048, 1024, 512, 256, 128))
    if tn is None or tm is None:
        return None
    grid = (N // tn, M // tm)
    best, idx = pl.pallas_call(
        _make_kernel(mode),
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
