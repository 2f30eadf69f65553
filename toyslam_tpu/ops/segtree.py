"""Two-level segmented reduction over sorted keys (round 5).

The flat segmented doubling-tree (``pointcloud.voxel_downsample``,
``ndt.build_ndt_map``) runs ceil(log2 n) full-array rounds: at 256k
points that is 18 shifted masked adds over every channel, though almost
all segments (points per voxel) are far shorter than the late rounds'
strides — rounds with k >= the longest segment move nothing but still
pay full bandwidth.

This module reshapes the sorted arrays to [R, L] rows (L = 128 lanes)
and splits the reduction:

1. **In-row tree** — log2(L) = 7 rounds of lane-shifted masked adds,
   confined to each row. After them, every in-row run's first element
   holds that run's within-row sum.
2. **Cross-row carry** — a segment spanning rows r..q contributes its
   rows' head sums to its global first element. Because keys are
   sorted, row q's head run continues row r's tail run iff
   ``K[q, 0] == K[q-1, L-1]`` chains down to r, which reduces the carry
   to the first-order linear recurrence ``C[r] = a[r] + b[r] * C[r+1]``
   (a = linked next-row head sum, b = link & next row boundary-free) —
   solved in log2(R) rounds of a reversed ``associative_scan`` over
   [C, R] row summaries (~n/L elements, negligible).
3. **Fix-up** — add C[r] at each row's LAST global segment start (the
   only position whose segment can extend past the row end).

Global bookkeeping (first flags, segment index, unique count) falls out
of in-row cumsums plus one tiny row-level cumsum, replacing the flat
cummax/cumsum full-length scans as well.

Invalid tail elements (key == INT32_MAX) follow the flat tree's
contract: they are excluded from ``first``/``pos`` and MUST carry
all-zero channel values (the callers zero them), so any sums they join
are no-ops.

Summation ORDER differs from the flat tree at the f32 rounding level
(pairings change); integer-valued channels (counts) are exact either
way. ``tests/test_segtree.py`` pins sums exactly against a NumPy f64
oracle segment-by-segment for integer data and to f32 tolerance for
reals, plus equality of the bookkeeping against the flat recipe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_INT_MAX = jnp.iinfo(jnp.int32).max
LANE = 128


def seg_reduce(keys, vals, lane: int = LANE):
    """Segmented sums over runs of equal sorted keys.

    keys: [n] int32, sorted ascending, INT32_MAX = invalid padding.
    vals: [C, n] channels; invalid lanes must already be zeroed.

    Returns (sums, first, pos, n_unique):
      sums  [C, n] — each segment's FIRST element holds the full segment
            sum; every other position is unspecified.
      first [n] bool — global segment starts (invalid keys excluded).
      pos   [n] int32 — global segment index per element (clipped to the
            last real segment for the invalid tail, matching the flat
            recipe).
      n_unique — number of segments.
    """
    C, n = vals.shape
    pad = (-n) % lane
    if pad:
        keys = jnp.concatenate([keys, jnp.full((pad,), _INT_MAX, keys.dtype)])
        vals = jnp.concatenate(
            [vals, jnp.zeros((C, pad), vals.dtype)], axis=1)
    R = keys.shape[0] // lane
    K = keys.reshape(R, lane)
    V = vals.reshape(C, R, lane)
    dtype = vals.dtype

    iota = jnp.arange(lane, dtype=jnp.int32)[None, :]
    # In-row run starts (c == 0 counts as a start regardless of linkage).
    F = jnp.concatenate(
        [jnp.ones((R, 1), bool), K[:, 1:] != K[:, :-1]], axis=1)
    P = jnp.cumsum(F.astype(jnp.int32), axis=1) - 1  # in-row run index
    seg_start = jax.lax.cummax(jnp.where(F, iota, -1), axis=1)
    O = iota - seg_start  # in-row offset within run

    k = 1
    while k < lane:
        take = ((O % (2 * k)) == 0) & (P == jnp.concatenate(
            [P[:, k:], jnp.full((R, k), -1, P.dtype)], axis=1))
        shifted = jnp.concatenate(
            [V[:, :, k:], jnp.zeros((C, R, k), dtype)], axis=2)
        V = V + jnp.where(take[None], shifted, 0.0)
        k *= 2

    # Cross-row carry. link[r] = row r+1's head continues row r's tail.
    head_sum = V[:, :, 0]  # [C, R] (zero contribution for INT_MAX heads)
    link = K[:-1, -1] == K[1:, 0]  # [R-1]
    has_b = jnp.any(F[:, 1:], axis=1)  # row has a start beyond c == 0
    a = jnp.where(link[None, :], head_sum[:, 1:], 0.0)  # [C, R-1]
    b = (link & ~has_b[1:]).astype(dtype)[None, :]  # [1, R-1]

    def comb(x, y):
        # Linear-map composition for the suffix recurrence
        # C[r] = a[r] + b[r] * C[r+1]. Under reverse=True,
        # associative_scan feeds comb(x = further-suffix combination,
        # y = the element nearer the row being solved) — verified
        # empirically (a flipped order silently computes a different
        # composition).
        ax, bx = x
        ay, by = y
        return (ay + by * ax, by * bx)

    if R > 1:
        A, _ = jax.lax.associative_scan(comb, (a, b), axis=1, reverse=True)
        carry = jnp.concatenate([A, jnp.zeros((C, 1), dtype)], axis=1)
    else:
        carry = jnp.zeros((C, R), dtype)

    # Global starts: in-row starts, minus heads that continue the
    # previous row, minus the invalid tail.
    not_cont = jnp.concatenate(
        [jnp.ones((1,), bool), K[1:, 0] != K[:-1, -1]])
    G = F & (K != _INT_MAX)
    G = G.at[:, 0].set(G[:, 0] & not_cont)

    # Add the carry at each row's LAST global start (the only start whose
    # run can extend past the row end; rows whose tail is invalid padding
    # carry zeros, so the add is harmless there).
    has_G = jnp.any(G, axis=1)
    lc = jax.lax.cummax(jnp.where(G, iota, -1), axis=1)[:, -1]  # [R]
    tgt = (iota == lc[:, None]) & has_G[:, None]
    V = V + jnp.where(tgt[None], carry[:, :, None], 0.0)

    # Global bookkeeping from row summaries (no full-length scans).
    per_row = jnp.sum(G.astype(jnp.int32), axis=1)  # [R]
    base = jnp.cumsum(per_row) - per_row  # exclusive prefix
    PG = jnp.cumsum(G.astype(jnp.int32), axis=1)  # [R, L]
    pos = base[:, None] + PG - 1  # pre-first-G elements continue base - 1
    n_unique = jnp.maximum(base[-1] + per_row[-1], 0)
    pos = jnp.maximum(pos, 0).astype(jnp.int32)

    sums = V.reshape(C, -1)
    first = G.reshape(-1)
    pos = pos.reshape(-1)
    if pad:
        sums = sums[:, :n]
        first = first[:n]
        pos = pos[:n]
    return sums, first, pos, n_unique


def seg_broadcast(keys, vals, lane: int = LANE):
    """Broadcast each segment's FIRST element's value to the whole
    segment (the inverse companion of ``seg_reduce``; two-level version
    of the flat log-shift broadcast in ``ndt.build_ndt_map``).

    keys: [n] int32 sorted (INT32_MAX invalid); vals: [C, n] with
    meaningful values at global segment-first positions. Returns [C, n]
    where every element of a segment holds its first element's value
    (invalid-key positions return whatever the fill produced — callers
    gate them, exactly as with the flat recipe).

    Level 1 fills within 128-lane rows from each row's global starts
    (7 log-shift rounds); level 2 fixes the pre-first-start prefix of
    every row with the value open at the previous row's end — a
    last-set-wins forward ``associative_scan`` over [C, R] row
    summaries.
    """
    C, n = vals.shape
    pad = (-n) % lane
    if pad:
        keys = jnp.concatenate([keys, jnp.full((pad,), _INT_MAX, keys.dtype)])
        vals = jnp.concatenate(
            [vals, jnp.zeros((C, pad), vals.dtype)], axis=1)
    R = keys.shape[0] // lane
    K = keys.reshape(R, lane)
    V = vals.reshape(C, R, lane)
    dtype = vals.dtype

    iota = jnp.arange(lane, dtype=jnp.int32)[None, :]
    F = jnp.concatenate(
        [jnp.ones((R, 1), bool), K[:, 1:] != K[:, :-1]], axis=1)
    not_cont = jnp.concatenate(
        [jnp.ones((1,), bool), K[1:, 0] != K[:-1, -1]])
    G = F & (K != _INT_MAX)
    G = G.at[:, 0].set(G[:, 0] & not_cont)

    # In-row forward fill from G anchors: off = distance to the last
    # anchor at or before each column; shifting by each set bit of off
    # lands every element on its anchor (the flat recipe's bit trick,
    # confined to rows). Elements with no prior in-row anchor keep
    # garbage and are patched by level 2.
    anchor = jax.lax.cummax(jnp.where(G, iota, -1), axis=1)  # [R, L]
    off = iota - anchor  # lane+ for pre-anchor elements (anchor == -1)
    b = 1
    while b < lane:
        bit = ((off & b) != 0) & (anchor >= 0)
        shifted = jnp.concatenate(
            [jnp.zeros((C, R, b), dtype), V[:, :, :-b]], axis=2)
        V = jnp.where(bit[None], shifted, V)
        b *= 2

    # Level 2: the value open at each row's END is the fill at its last
    # column when the row has an anchor, else whatever came in from
    # above. Last-set-wins scan over rows, then patch each row's
    # pre-anchor prefix with the PREVIOUS row's outgoing value.
    has_G = jnp.any(G, axis=1)
    v_last = V[:, :, -1]  # [C, R] — correct outgoing value when has_G
    if R > 1:
        def comb(x, y):
            vx, gx = x
            vy, gy = y
            keep = gy > 0.5
            return (jnp.where(keep, vy, vx), jnp.maximum(gx, gy))

        flag = has_G.astype(dtype)[None, :]
        d_out, _ = jax.lax.associative_scan(
            comb, (v_last, jnp.broadcast_to(flag, v_last.shape)), axis=1)
        d_in = jnp.concatenate(
            [jnp.zeros((C, 1), dtype), d_out[:, :-1]], axis=1)  # [C, R]
        pre = (anchor < 0)[None]  # [1, R, L]
        V = jnp.where(pre, d_in[:, :, None], V)

    out = V.reshape(C, -1)
    if pad:
        out = out[:, :n]
    return out
