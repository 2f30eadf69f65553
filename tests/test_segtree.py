"""Tests for the two-level segmented reduction (ops/segtree.py).

The r5 rewrite of ``voxel_downsample``'s reduction changes the f32
summation ORDER (in-row pairing + cross-row carry vs the flat doubling
tree), so these tests pin it against an order-free f64 NumPy oracle
segment-by-segment, pin integer-channel sums EXACTLY (integer-valued
f32 sums are rounding-free either way), and pin the bookkeeping
(first/pos/n_unique) against the flat recipe it replaced.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from toyslam_tpu.ops import segtree

INT_MAX = np.iinfo(np.int32).max


def _flat_reference(keys, vals):
    """The pre-r5 flat recipe's bookkeeping (NumPy)."""
    first = np.concatenate([[True], keys[1:] != keys[:-1]]) & (keys != INT_MAX)
    pos = np.cumsum(first.astype(np.int64)) - 1
    n_unique = max(int(pos[-1]) + 1, 0)
    return first, pos, n_unique


def _oracle_sums(keys, vals):
    """f64 per-segment sums at segment-first positions."""
    first, pos, n_unique = _flat_reference(keys, vals)
    out = np.zeros_like(vals, dtype=np.float64)
    for s in range(n_unique):
        sel = (pos == s) & (keys != INT_MAX)
        idx = np.flatnonzero(sel)
        out[:, idx[0]] = vals[:, idx].astype(np.float64).sum(axis=1)
    return out, first, pos, n_unique


def _random_case(rng, n, n_valid, max_run):
    """Sorted keys with random run lengths + INT_MAX tail."""
    keys = np.full(n, INT_MAX, np.int32)
    k, i = rng.integers(0, 50), 0
    while i < n_valid:
        run = int(rng.integers(1, max_run + 1))
        run = min(run, n_valid - i)
        keys[i:i + run] = k
        k += int(rng.integers(1, 5))
        i += run
    vals = rng.normal(0, 10.0, (4, n)).astype(np.float32)
    vals[:, n_valid:] = 0.0  # invalid lanes carry zeros (the contract)
    return keys, vals


@pytest.mark.parametrize("n,n_valid,max_run", [
    (1024, 1024, 3),       # many short segments
    (1024, 1000, 200),     # long segments spanning many 128-lane rows
    (1024, 900, 1),        # all singletons + tail
    (640, 513, 50),        # n a multiple of 128, partial tail row
    (100, 77, 10),         # n NOT a multiple of the lane width
    (128, 128, 128),       # one segment == one row exactly
    (4096, 4096, 4096),    # a single segment spanning everything
])
def test_seg_reduce_matches_oracle(rng, n, n_valid, max_run):
    keys, vals = _random_case(rng, n, n_valid, max_run)
    oracle, first_ref, pos_ref, nu_ref = _oracle_sums(keys, vals)

    sums, first, pos, nu = jax.jit(segtree.seg_reduce)(
        jnp.asarray(keys), jnp.asarray(vals))
    sums = np.asarray(sums)
    first = np.asarray(first)

    np.testing.assert_array_equal(first, first_ref)
    assert int(nu) == nu_ref
    # pos must agree wherever the callers consume it (at first positions
    # it keys the compaction; elsewhere both recipes only need a
    # consistent segment index for valid lanes).
    valid = keys != INT_MAX
    np.testing.assert_array_equal(np.asarray(pos)[valid],
                                  np.clip(pos_ref, 0, None)[valid])
    # Sums at first positions: f32-accumulation tolerance vs f64 oracle.
    at_first = first_ref
    np.testing.assert_allclose(sums[:, at_first], oracle[:, at_first],
                               rtol=2e-6, atol=1e-4)


def test_seg_reduce_integer_channel_exact(rng):
    """Counts (integer-valued f32) are exact regardless of sum order."""
    keys, _ = _random_case(rng, 2048, 1800, 300)
    w = (keys != INT_MAX).astype(np.float32)[None, :]
    oracle, first_ref, _, _ = _oracle_sums(keys, w)
    sums, first, _, _ = jax.jit(segtree.seg_reduce)(
        jnp.asarray(keys), jnp.asarray(w))
    np.testing.assert_array_equal(
        np.asarray(sums)[:, first_ref], oracle[:, first_ref])


def test_seg_reduce_all_invalid():
    keys = jnp.full((256,), INT_MAX, jnp.int32)
    vals = jnp.zeros((2, 256), jnp.float32)
    sums, first, pos, nu = jax.jit(segtree.seg_reduce)(keys, vals)
    assert int(nu) == 0
    assert not bool(np.asarray(first).any())
    assert np.asarray(sums).sum() == 0.0


@pytest.mark.parametrize("n,n_valid,max_run", [
    (1024, 1024, 3),
    (1024, 1000, 300),     # segments spanning several rows
    (640, 513, 50),
    (100, 77, 10),         # n not a multiple of the lane width
    (4096, 4096, 4096),    # one segment spanning everything
])
def test_seg_broadcast_matches_oracle(rng, n, n_valid, max_run):
    """Every element of a segment must receive its global-first
    element's value exactly (selection, no arithmetic)."""
    keys, _ = _random_case(rng, n, n_valid, max_run)
    first, pos, n_unique = _flat_reference(keys, None)
    vals = np.zeros((3, n), np.float32)
    anchor_vals = rng.normal(0, 5, (3, n_unique)).astype(np.float32)
    idx_first = np.flatnonzero(first)
    vals[:, idx_first] = anchor_vals
    # garbage at non-first positions must be ignored
    vals[:, ~first] = 777.0

    out = np.asarray(jax.jit(segtree.seg_broadcast)(
        jnp.asarray(keys), jnp.asarray(vals)))
    valid = keys != INT_MAX
    expect = anchor_vals[:, np.clip(pos, 0, None)]
    np.testing.assert_array_equal(out[:, valid], expect[:, valid])


def test_downsample_still_matches_pcl_semantics(rng):
    """End-to-end: voxel_downsample on the new reduction must produce
    the same voxel set and means (to f32 rounding) as a brute-force
    NumPy voxel grid — the same oracle test_pointcloud uses, re-pinned
    here against a cloud shaped to cross many 128-lane rows per voxel."""
    from toyslam_tpu.core import pointcloud as pc

    pts = np.repeat(rng.uniform(-8, 8, (700, 3)), 20, axis=0)
    pts += rng.normal(0, 0.02, pts.shape)
    rng.shuffle(pts)
    cloud = pc.from_numpy(
        np.concatenate([pts, np.ones((len(pts), 1))], 1).astype(np.float32),
        capacity=16384, dtype=jnp.float32)
    leaf = 1.0
    d = jax.jit(pc.voxel_downsample, static_argnums=(1, 2))(
        cloud, leaf, 8192)
    got_xyz = np.asarray(d.xyzi)[np.asarray(d.mask)][:, :3]

    mn = pts.min(axis=0)
    keys = np.floor(pts / leaf).astype(np.int64)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    means = np.zeros((len(uniq), 3))
    for i in range(len(uniq)):
        means[i] = pts[inv == i].mean(axis=0)
    assert len(got_xyz) == len(uniq)
    # Match by voxel key (output order is sorted linear id, oracle order
    # is np.unique's).
    got_keys = np.floor(got_xyz / leaf + 1e-6).astype(np.int64)
    order_got = np.lexsort(got_keys.T[::-1])
    order_ref = np.lexsort(uniq.T[::-1])
    np.testing.assert_allclose(got_xyz[order_got],
                               means[order_ref], atol=5e-4)
