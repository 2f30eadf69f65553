"""Batched row gather with a flattened-lane vmap lowering.

Under ``jax.vmap``, a per-lane table lookup ``table[idx]`` lowers to a
batched gather (XLA ``operand_batching_dims``), measured at ~26 ns/row on
v5e for the fleet's ``[B, NK] -> [B, NK, 16]`` stats fetch — about 2x the
single-lane row-gather rate (9-13 ns/row; ``docs/TPU_NOTES.md``). The
batched gathers are ~63% of the 64-way fleet program
(``bench.py:bench_batch64_fusion`` trace), so halving their cost is the
single biggest remaining fleet lever.

``row_gather`` is semantically ``table[idx]``; its ``custom_vmap`` rule can
instead flatten the lane axis into the table axis — ONE single-level gather
over a ``[B*cap, R]`` operand with lane-offset indices. Values are
bit-identical (same rows fetched); only the lowering differs. Whether the
flat form wins depends on how the gather rate scales with table size
(measured: flat to 8k rows, 13-16 ns/row at 16-32k; the flattened fleet
table is B*cap rows), so the rule is gated on ``FLATTEN_BATCHED`` until
the on-chip measurement picks the default.

Indices must be in ``[0, cap)`` (the NDT lookup guarantees this by
construction: ``vid & (cap-1)`` with ``jnp.where(ok, ., 0)``) — the
flattened indices then stay strictly in-bounds, which matters on TPU
(out-of-bounds clamp/drop modes are measurably slower).
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
from jax import custom_batching

# Trace-time switch for the flattened batched lowering. NOTE: toggling does
# NOT invalidate already-traced jits of callers; flip it before tracing
# (tests build fresh jits per setting). Default OFF for two reasons:
# (1) ``custom_vmap`` does not support reverse-mode autodiff, and the NDT
# derivative oracles differentiate through the gather; (2) whether the
# flattened form actually wins depends on gather-rate-vs-table-size
# scaling, which only an on-chip measurement settles.
FLATTEN_BATCHED = False


@contextlib.contextmanager
def flatten_batched(on: bool = True):
    """Enable the flattened lowering for code traced inside the block."""
    global FLATTEN_BATCHED
    old = FLATTEN_BATCHED
    FLATTEN_BATCHED = on
    try:
        yield
    finally:
        FLATTEN_BATCHED = old


@custom_batching.custom_vmap
def row_gather(table, idx):
    """``table[idx]`` — [cap, R] table, integer idx of any shape, all
    entries in [0, cap)."""
    return table[idx]


@row_gather.def_vmap
def _row_gather_vmap(axis_size, in_batched, table, idx):
    table_batched, idx_batched = in_batched
    if not table_batched or not FLATTEN_BATCHED:
        # Shared table, or flattening disabled: the default lowering.
        # (custom_vmap passes batched args with the batch axis at 0.)
        if table_batched:
            out = jax.vmap(lambda t, i: t[i],
                           in_axes=(0, 0 if idx_batched else None))(table, idx)
        else:
            out = table[idx]  # shared table: idx batching is free
        return out, table_batched or idx_batched
    B = axis_size
    cap = table.shape[1]
    flat = table.reshape((B * cap,) + table.shape[2:])
    base = jnp.arange(B, dtype=jnp.int32) * jnp.int32(cap)
    if idx_batched:
        base = base.reshape((B,) + (1,) * (idx.ndim - 1))
        out = flat[idx + base]
    else:
        base = base.reshape((B,) + (1,) * idx.ndim)
        out = flat[idx[None] + base]
    return out, True
