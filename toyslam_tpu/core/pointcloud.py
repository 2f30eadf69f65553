"""Fixed-shape padded point-cloud representation and masked ops.

TPU-first design: every cloud is a ``[N, 4]`` float32 tensor (x, y, z,
intensity) plus a ``[N]`` bool validity mask, padded to a static capacity.
This mirrors the reference's own 4-padded SIMD layout
(``ndt_omp_impl.hpp:401``) and removes all dynamic shapes from the compiled
path. Invalid lanes carry a large sentinel coordinate so they fall outside
any voxel/neighbor query by construction.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# Sentinel coordinate for padded/invalid points: far outside any realistic map.
PAD_COORD = 1.0e9


class PointCloud(NamedTuple):
    """Padded point cloud: ``xyzi[N, 4]`` + ``mask[N]`` (+ true count)."""

    xyzi: jax.Array  # [N, 4] float
    mask: jax.Array  # [N] bool

    @property
    def capacity(self) -> int:
        return self.xyzi.shape[0]

    @property
    def count(self):
        return jnp.sum(self.mask.astype(jnp.int32))

    @property
    def xyz(self):
        return self.xyzi[..., :3]


def from_numpy(points: np.ndarray, capacity: int | None = None,
               dtype=jnp.float32) -> PointCloud:
    """Build a padded PointCloud from a [n, 3] or [n, 4] numpy array."""
    points = np.asarray(points)
    n = points.shape[0]
    if capacity is None:
        capacity = n
    if points.shape[1] == 3:
        points = np.concatenate([points, np.zeros((n, 1), points.dtype)], axis=1)
    finite = np.isfinite(points[:, :3]).all(axis=1)
    xyzi = np.full((capacity, 4), PAD_COORD, dtype=np.float64)
    xyzi[:, 3] = 0.0
    k = min(n, capacity)
    xyzi[:k] = points[:k]
    mask = np.zeros((capacity,), dtype=bool)
    mask[:k] = finite[:k]
    # Invalid (non-finite) points get the sentinel so they never hit a voxel.
    xyzi[:k][~finite[:k], :3] = PAD_COORD
    return PointCloud(jnp.asarray(xyzi, dtype=dtype), jnp.asarray(mask))


def pad_to(cloud: PointCloud, capacity: int) -> PointCloud:
    n = cloud.capacity
    if n == capacity:
        return cloud
    if n > capacity:
        return PointCloud(cloud.xyzi[:capacity], cloud.mask[:capacity])
    pad = jnp.full((capacity - n, 4), PAD_COORD, dtype=cloud.xyzi.dtype)
    pad = pad.at[:, 3].set(0.0)
    return PointCloud(
        jnp.concatenate([cloud.xyzi, pad], axis=0),
        jnp.concatenate([cloud.mask, jnp.zeros(capacity - n, dtype=bool)], axis=0),
    )


def shrink_to(cloud: PointCloud, capacity: int) -> PointCloud:
    """Slice to a smaller static capacity, assuming valid lanes come first.

    ``voxel_downsample`` emits valid lanes first (sorted voxel order), so
    after a downsample the cloud can usually drop to a much smaller static
    capacity — removing padded dead lanes from every downstream kernel.
    Valid points beyond ``capacity`` are lost (count is dynamic; callers
    choose a capacity with headroom).
    """
    return PointCloud(cloud.xyzi[:capacity], cloud.mask[:capacity])


def transform(cloud: PointCloud, T) -> PointCloud:
    """Rigid transform; padded lanes keep their sentinel (masked out)."""
    xyz = jnp.matmul(cloud.xyzi[:, :3], T[:3, :3].T,
                     precision=jax.lax.Precision.HIGHEST) + T[:3, 3]
    xyz = jnp.where(cloud.mask[:, None], xyz, cloud.xyzi[:, :3])
    return PointCloud(jnp.concatenate([xyz, cloud.xyzi[:, 3:4]], axis=1), cloud.mask)


def soa_channels(xyzi):
    """[N, 4] -> four lane-dense 1D channels via ONE transpose pass.

    Column slices of the (8, 128)-tiled ``[N, 4]`` layout each re-read
    the whole padded array (1 of 128 lanes useful), and elementwise math
    on ``[N, 3]`` minor-dim blocks runs over ~40x padding. Layout
    hygiene per TPU_NOTES "Memory & layout": the r5 A/B
    (benchmarks/profile_soa_ab.py, with a noop control) measured the SoA
    form NEUTRAL inside the composed downsample — XLA fuses the slices
    well there — but the padded-column form is the documented trap for
    any consumer XLA cannot fuse.
    """
    t = xyzi.T  # [4, N]
    return t[0], t[1], t[2], t[3]


def masked_min_max(cloud: PointCloud):
    """Min/max over valid points (reference: pcl::getMinMax3D in applyFilter).

    Transposes once and reduces each coordinate as a lane-dense 1D
    vector: an axis-0 reduction over the [N, 3] block is ~13x slower on
    TPU, and per-column slices of [N, 4] each re-read the whole padded
    array (see ``soa_channels``).
    """
    x, y, z, _ = soa_channels(cloud.xyzi)
    return _min_max_soa(x, y, z, cloud.mask, cloud.xyzi.dtype)


def _min_max_soa(x, y, z, mask, dtype):
    big = jnp.asarray(PAD_COORD, dtype)
    mins, maxs = [], []
    for c in (x, y, z):
        mins.append(jnp.min(jnp.where(mask, c, big)))
        maxs.append(jnp.max(jnp.where(mask, c, -big)))
    return jnp.stack(mins), jnp.stack(maxs)


def _voxel_ids_soa(x, y, z, mask, inv_leaf, min_b, div):
    """Linear voxel id per point from lane-dense 1D channels; invalid
    points get id = INT32_MAX."""
    ix = jnp.floor(x * inv_leaf).astype(jnp.int32) - min_b[0]
    iy = jnp.floor(y * inv_leaf).astype(jnp.int32) - min_b[1]
    iz = jnp.floor(z * inv_leaf).astype(jnp.int32) - min_b[2]
    return jnp.where(mask, ix + iy * div[0] + iz * (div[0] * div[1]),
                     jnp.iinfo(jnp.int32).max)


def voxel_ids(cloud: PointCloud, leaf_size: float):
    """Per-point linear voxel id over the cloud's dynamic bounding grid.

    Matches VoxelGrid's linearization (``voxel_grid_covariance_omp_impl.hpp:
    86-103,218-226``): ``ijk = floor(p/leaf) - floor(min/leaf)``, linear id =
    ``i + j*dx + k*dx*dy``. Bounds are dynamic *values* (fine under jit);
    shapes stay static. Runs on SoA channels (see ``soa_channels``).
    """
    dtype = cloud.xyzi.dtype
    inv_leaf = jnp.asarray(1.0 / leaf_size, dtype)
    x, y, z, _ = soa_channels(cloud.xyzi)
    mn, mx = _min_max_soa(x, y, z, cloud.mask, dtype)
    min_b = jnp.floor(mn * inv_leaf).astype(jnp.int32)
    max_b = jnp.floor(mx * inv_leaf).astype(jnp.int32)
    div = max_b - min_b + 1
    div_mul = jnp.stack([jnp.int32(1), div[0], div[0] * div[1]])
    vid = _voxel_ids_soa(x, y, z, cloud.mask, inv_leaf, min_b, div)
    return vid, min_b, div_mul


def unique_voxel_slots(vid, out_capacity: int | None = None):
    """Compact sorted unique voxel ids with static shapes.

    Returns (unique_ids[V] sorted with INT32_MAX padding,
             slot[N] per input point, n_unique), V = out_capacity or N.

    TPU notes: a key-value ``lax.sort`` is an order of magnitude faster than
    a single-operand sort at these sizes, and the sort permutation gives
    every element's slot directly — a ``searchsorted`` here would pay
    log2(N) rounds of slow 1D gathers. Scatters stay strictly IN-BOUNDS:
    out-of-range indices with mode="drop" hit a slow serialized XLA scatter
    path on TPU (measured ~3 ms vs ~free at 256k updates), so dropped
    entries contribute zero at index 0 (add-form compaction) instead.
    Points in voxels beyond the capacity get slot == V.
    """
    n = vid.shape[0]
    V = n if out_capacity is None else out_capacity
    order = jnp.arange(n, dtype=jnp.int32)
    sorted_vid, order = jax.lax.sort((vid, order), num_keys=1)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_vid[1:] != sorted_vid[:-1]]
    ) & (sorted_vid != jnp.iinfo(jnp.int32).max)
    pos = jnp.cumsum(first.astype(jnp.int32)) - 1
    n_unique = jnp.maximum(pos[-1] + 1, 0)
    # Add-form compaction: each kept slot receives exactly one non-zero
    # contribution (its first occurrence); everything else adds 0 at
    # index 0. Result is sorted by construction; pad with INT32_MAX.
    keep = first & (pos < V)
    summed = jnp.zeros((V,), jnp.int32).at[
        jnp.where(keep, pos, 0)
    ].add(jnp.where(keep, sorted_vid, 0))
    unique_ids = jnp.where(jnp.arange(V, dtype=jnp.int32)
                           < jnp.minimum(n_unique, V),
                           summed, jnp.iinfo(jnp.int32).max)
    # Per-point slot via the sort permutation (in-bounds: order is one)
    slot = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.clip(pos, 0, V), unique_indices=True)
    return unique_ids, slot, n_unique


def voxel_downsample(cloud: PointCloud, leaf_size: float,
                     capacity: int | None = None,
                     with_intensity: bool = True) -> PointCloud:
    """Centroid voxel downsample (pcl::VoxelGrid equivalent).

    Output capacity defaults to the input's; pass ``capacity`` to emit a
    smaller cloud directly (fusing the usual ``shrink_to``) — segment sums
    into a small table are far cheaper than full-capacity ones, and voxels
    beyond the capacity drop exactly as a post-hoc shrink would. Valid
    lanes = number of occupied voxels (sorted voxel order, valid-first),
    each holding the mean of its points (xyz and intensity).

    ``with_intensity=False`` drops the intensity channel from the sort
    payloads and segment reduction (~20% of their traffic) and emits
    intensity 0 — for consumers that never read it (NDT registration:
    poses are bit-identical either way). Mapping keeps the default True
    (the reference's global map averages intensity like any field).
    """
    V = cloud.capacity if capacity is None else capacity
    dtype = cloud.xyzi.dtype
    mask = cloud.mask
    # SoA channels once (see soa_channels): every downstream op — min/
    # max, voxel ids, payload masking — is a full-bandwidth 1D pass
    # instead of a padded column slice (measured 1.59 -> ~0.2 ms/scan at
    # 256k for this prologue, benchmarks/profile_ds_r5.py).
    x, y, z, inten = soa_channels(cloud.xyzi)
    n = x.shape[0]
    inv_leaf = jnp.asarray(1.0 / leaf_size, dtype)
    mn, mx = _min_max_soa(x, y, z, mask, dtype)
    min_b = jnp.floor(mn * inv_leaf).astype(jnp.int32)
    max_b = jnp.floor(mx * inv_leaf).astype(jnp.int32)
    div = max_b - min_b + 1
    vid = _voxel_ids_soa(x, y, z, mask, inv_leaf, min_b, div)
    # Sort the PAYLOAD columns along with the keys: XLA TPU scatters run
    # at a slow ~5-9 ns/update floor, so the former per-point slot scatter
    # and compaction scatter are replaced by one multi-operand kv sort
    # (measured ~0.2 ms at 256k for 2 operands) plus a single sorted-order
    # segment reduction.
    px = jnp.where(mask, x, 0.0)
    py = jnp.where(mask, y, 0.0)
    pz = jnp.where(mask, z, 0.0)
    if with_intensity:
        pi = jnp.where(mask, inten, 0.0)
        sorted_vid, sx, sy, sz, si = jax.lax.sort(
            (vid, px, py, pz, pi), num_keys=1)
    else:
        sorted_vid, sx, sy, sz = jax.lax.sort(
            (vid, px, py, pz), num_keys=1)
    # The weight channel is derived post-sort (masked points carry
    # INT32_MAX ids), so it does not ride the sort.
    w = (sorted_vid != jnp.iinfo(jnp.int32).max).astype(dtype)

    # Two-level segmented reduction over the SORTED runs (ops/segtree):
    # 7 in-row lane-shifted rounds + a tiny cross-row carry scan replace
    # the former flat 18-round doubling tree AND its full-length
    # cummax/cumsum bookkeeping (rounds with stride >= the longest
    # segment moved nothing but still paid full bandwidth). Replaces the
    # XLA scatter-add (a serialized ~9 ns/update path, measured 2.2 ms
    # at 256k updates) like the flat tree did, at ~40% of its round
    # count; summation order differs only at f32 rounding
    # (tests/test_segtree.py pins sums + bookkeeping).
    from toyslam_tpu.ops.segtree import seg_reduce

    chans = [w, sx * w, sy * w, sz * w]
    if with_intensity:
        chans.append(si * w)
    vals = jnp.stack(chans)  # [4 or 5, n]
    vals, first, pos, n_unique = seg_reduce(sorted_vid, vals)

    # Compact the per-segment sums (at first-of-segment positions) to the
    # leading V slots with one kv sort — first elements carry key = pos
    # (already sorted ascending), everything else sorts to the back.
    key2 = jnp.where(first & (pos < V), pos, jnp.iinfo(jnp.int32).max)
    compacted = jax.lax.sort((key2, *vals), num_keys=1)[1:]
    acc = jnp.stack(compacted, axis=1)
    if V <= n:
        acc = acc[:V]
    else:  # capacity exceeds the input point count: pad with empty slots
        acc = jnp.concatenate(
            [acc, jnp.zeros((V - n, acc.shape[1]), dtype)], axis=0)
    # Occupied slots are exactly the first min(n_unique, V) (sorted
    # compaction) — no unique-id table needed here.
    valid = jnp.arange(V, dtype=jnp.int32) < jnp.minimum(n_unique, V)
    centroid = acc[:, 1:] / jnp.maximum(acc[:, 0], 1.0)[:, None]
    if not with_intensity:
        centroid = jnp.concatenate(
            [centroid, jnp.zeros((V, 1), dtype)], axis=1)
    out = jnp.where(valid[:, None], centroid, PAD_COORD)
    out = out.at[:, 3].set(jnp.where(valid, centroid[:, 3], 0.0))
    return PointCloud(out, valid)
