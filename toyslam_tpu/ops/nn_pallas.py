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

def _kernel(src_ref, tgt_t_ref, tsq_ref, best_ref, idx_ref):
    j = pl.program_id(1)
    s = src_ref[...]  # [TN, 3]
    t_t = tgt_t_ref[...]  # [3, TM]
    tsq = tsq_ref[...]  # [1, TM]
    # HIGHEST: the default bf16 MXU passes lose ~0.4% relative on ~100 m
    # coordinates — meters of distance error, enough to flip real
    # correspondences (measured: GICP error 0.28 vs 0.18 on the sample
    # pair without this).
    d = tsq - 2.0 * jnp.dot(s, t_t, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
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


def _pick_tile(n, candidates):
    for c in candidates:
        if n % c == 0:
            return c
    return None


def nearest_neighbor(src_xyz, tgt_xyz, tgt_valid_sq,
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
    """
    N = src_xyz.shape[0]
    M = tgt_xyz.shape[1]
    tn = _pick_tile(N, (512, 256, 128, 64, 32, 16, 8))
    tm = _pick_tile(M, (2048, 1024, 512, 256, 128))
    if tn is None or tm is None:
        return None
    grid = (N // tn, M // tm)
    best, idx = pl.pallas_call(
        _kernel,
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
