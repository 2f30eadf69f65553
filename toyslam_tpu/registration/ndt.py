"""TPU-native Normal Distributions Transform registration.

Re-implements the behaviour of ``pclomp::NormalDistributionsTransform``
(reference: ``ndt_omp/include/pclomp/ndt_omp_impl.hpp``) as a single compiled
JAX program:

- The voxel-Gaussian target map (reference ``VoxelGridCovariance::applyFilter``,
  ``voxel_grid_covariance_omp_impl.hpp:48-370``) is built with segment
  reductions over a sorted spatial hash plus a batched closed-form 3x3
  eigensolver — no std::map, no KD-tree.
- DIRECT7/DIRECT1/DIRECT27 neighbor search (``:372-442``) is a static gather
  of precomputed offsets with bounds/occupancy masks.
- The Newton iteration with More-Thuente line search
  (``ndt_omp_impl.hpp:80-171,647-932``) runs inside ``lax.while_loop``; score,
  gradient and Hessian (Magnusson 2009 eqs. 6.9-6.13, 6.18-6.21) are fused
  einsum contractions over [points x neighbors] that map onto MXU/VPU.

Differences from the reference (deliberate):
- KDTREE search mode is dropped (DIRECT7 is the recommended default,
  ``ndt_omp/README.md:49``).
- The Hessian is computed on every derivative evaluation instead of the
  first-trial-only + serial recompute dance (``:835-837,925-929``) — on TPU
  the fused extra contractions are cheaper than a second pass.
- The float-path sign bug in the reference's ``h_ang`` row 6 (+sy at
  ``ndt_omp_impl.hpp:383`` vs the correct -sy in the double path ``:361``)
  is fixed here; our Hessian matches JAX autodiff of the score exactly.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from toyslam_tpu.core import se3
from toyslam_tpu.core.pointcloud import PointCloud
from toyslam_tpu.ops import gatherflat
from toyslam_tpu.ops.eigh3 import eigh3_soa

_HP = jax.lax.Precision.HIGHEST
_INT_MAX = jnp.iinfo(jnp.int32).max


class NDTConfig(NamedTuple):
    """Knobs mirroring the reference ctor defaults (``ndt_omp_impl.hpp:47-76``)."""

    resolution: float = 1.0
    step_size: float = 0.1
    outlier_ratio: float = 0.55
    transformation_epsilon: float = 0.1
    max_iterations: int = 35
    min_points_per_voxel: int = 6
    search_method: str = "DIRECT7"  # DIRECT7 | DIRECT1 | DIRECT27
    max_step_iterations: int = 10
    min_covar_eigvalue_mult: float = 0.01
    # Static capacity of the voxel-id -> slot lookup table. Addressed by
    # ``vid & (grid_capacity - 1)``: exact for grids that fit, aliased (with
    # id verification, so lookups stay correct but aliased voxels drop out
    # of the map) for larger ones. TPU gathers scan the table, so SMALL
    # tables are fast tables.
    grid_capacity: int = 1 << 16
    # Static number of voxel slots kept in the map (valid voxels are packed
    # first; excess voxels beyond this are dropped). Single scans at 1 m
    # resolution occupy a few thousand voxels.
    map_capacity: int = 16384
    # Fuse the post-gather derivative math into one Pallas kernel (the
    # voxel-table gather stays in XLA). Requires N divisible by 1024 (128
    # lanes x 8 sublanes per block) and f32. None = auto: on for the TPU
    # backend, off elsewhere (the jnp fallback also serves f64, autodiff
    # oracles and small clouds).
    use_pallas: bool | None = None
    # Repack the raw stats gather into the compact 10-channel form with
    # the single-pass Pallas kernel (ops/ndt_pallas.ndt_repack) instead
    # of ~3 XLA passes over the lane-padded buffer. Bit-identical output.
    # None = auto like use_pallas. The vmapped fleet pins this False: at
    # its 8192-point lanes the batched XLA unpack measured ~4% faster
    # than the batch-gridded kernel (single-sequence 256k: kernel wins
    # 133 -> 199 scans/s).
    repack_pallas: bool | None = None
    # Reuse the voxel neighborhood gathered at the Newton iterate for all
    # More-Thuente trial evaluations in that iteration. The table gathers
    # are ~80% of a derivative eval (hardware random-row floor), and trial
    # steps (<= step_size, typically 0.1 m) rarely move points across
    # resolution-sized voxels, so this cuts gathers from ~2.5x to 1x per
    # Newton iteration with a slightly stale line-search model. Off by
    # default: exact reference eval-per-trial semantics
    # (``computeStepLengthMT``, ``ndt_omp_impl.hpp:772-932``).
    frozen_linesearch: bool = False
    # Turbo (requires frozen_linesearch): gather the voxel neighborhood
    # only for the first N Newton iterations and carry the last one for
    # the rest of the align. Voxel assignments stop changing once the
    # pose is within a fraction of the resolution, so late iterations
    # solve the (identical-fixed-point) frozen objective. 1<<30 = always
    # regather (exact frozen_linesearch behavior).
    regather_iterations: int = 1 << 30


class NDTMap(NamedTuple):
    """Voxel-Gaussian map: fixed-capacity hash-addressed stats table.

    Hot-path layout (measured on v5e: random row gathers cost ~9-12 ns/row
    regardless of row width, and 1D gathers are ~2x slower than 16-wide row
    gathers, so the lookup is ONE row gather):
    - ``hash_table`` [grid_capacity, 16]: per-voxel stats row stored
      directly at slot ``vid & (grid_capacity - 1)`` — mean(3), icov
      sym(6), valid flag, voxel-id 16-bit halves (aliasing verification
      rides the same row fetch), padding;
    - ``table`` [V, 16]: the same rows packed valid-first (slot order) for
      compact consumers;
    - ``mean3``/``icov6``: SoA views for component-wise consumers.
    """

    unique_ids: jax.Array  # [V] int32, sorted, INT32_MAX padded
    valid: jax.Array  # [V] bool
    min_b: jax.Array  # [3] int32
    div: jax.Array  # [3] int32
    div_mul: jax.Array  # [3] int32
    hash_table: jax.Array  # [grid_capacity, 16] stats row at hash slot
    vid_of_slot: jax.Array  # [V] int32 linear voxel id per slot (verify)
    mean3: jax.Array  # [3, V]
    icov6: jax.Array  # [6, V] symmetric components xx, xy, xz, yy, yz, zz
    table: jax.Array  # [V, 16] packed stats rows

    @property
    def mean(self):
        """AoS view [V, 3] (test/debug convenience; materializes padding)."""
        return self.mean3.T

    @property
    def icov(self):
        """AoS view [V, 3, 3] (test/debug convenience)."""
        xx, xy, xz, yy, yz, zz = self.icov6
        return jnp.stack(
            [jnp.stack([xx, xy, xz], -1), jnp.stack([xy, yy, yz], -1),
             jnp.stack([xz, yz, zz], -1)], -2)


class NDTResult(NamedTuple):
    transform: jax.Array  # [4, 4]
    converged: jax.Array  # bool
    iterations: jax.Array  # int32
    trans_probability: jax.Array  # scalar
    pose6: jax.Array  # [6] final chart state
    # Work accounting (for utilization reporting + parity diagnostics):
    # derivative evaluations (1 init + first trial + extra More-Thuente
    # trials per Newton iteration — comparable to the golden oracle's
    # n_evals) and full [K*N, 16] stats-table gathers actually executed
    # (== evaluations in exact mode; 1 + min(it, regather_iterations)
    # under the frozen/turbo defaults).
    evaluations: jax.Array = 0
    gathers: jax.Array = 0


def gauss_coefficients(resolution, outlier_ratio, dtype=jnp.float32):
    """Gaussian mixture constants d1, d2, d3 (eq. 6.8 [Magnusson 2009];
    reference ``ndt_omp_impl.hpp:86-93``)."""
    c1 = 10.0 * (1.0 - outlier_ratio)
    c2 = outlier_ratio / resolution**3
    d3 = -math.log(c2)
    d1 = -math.log(c1 + c2) - d3
    d2 = -2.0 * math.log((-math.log(c1 * math.exp(-0.5) + c2) - d3) / d1)
    return (jnp.asarray(d1, dtype), jnp.asarray(d2, dtype), jnp.asarray(d3, dtype))


def _inverse3(M):
    """Closed-form 3x3 inverse (adjugate / det), batched."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / det
    adj = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), b * f - c * e], -1),
            jnp.stack([B, a * i - c * g, -(a * f - c * d)], -1),
            jnp.stack([C, -(a * h - b * g), a * e - b * d], -1),
        ],
        -2,
    )
    return adj * inv_det[..., None, None], det


def build_ndt_map(target: PointCloud, config: NDTConfig) -> NDTMap:
    """Build the searchable voxel-Gaussian map.

    Pass 1 of the reference (scatter-accumulate count/sum/outer-product,
    ``voxel_grid_covariance_omp_impl.hpp:206-264``) becomes two fused
    ``segment_sum`` calls keyed by sorted-unique voxel slot; pass 2
    (mean/covariance finalization + eigenvalue inflation + inverse,
    ``:266-367``) is batched dense algebra.
    """
    dtype = target.xyzi.dtype
    res = config.resolution
    inv_leaf = jnp.asarray(1.0 / res, dtype)
    mask = target.mask

    # SoA prologue (pointcloud.soa_channels): one transpose, then the
    # min/max + voxel-id math runs on lane-dense 1D channels instead of
    # padded [N, 3] column slices (the r5 downsample finding).
    from toyslam_tpu.core.pointcloud import (_min_max_soa, _voxel_ids_soa,
                                             soa_channels)

    px, py, pz, _ = soa_channels(target.xyzi)
    mn, mx = _min_max_soa(px, py, pz, mask, dtype)
    min_b = jnp.floor(mn * inv_leaf).astype(jnp.int32)
    max_b = jnp.floor(mx * inv_leaf).astype(jnp.int32)
    div = max_b - min_b + 1
    div_mul = jnp.stack([jnp.int32(1), div[0], div[0] * div[1]])

    vid = _voxel_ids_soa(px, py, pz, mask, inv_leaf, min_b, div)

    n = vid.shape[0]
    V = config.map_capacity
    # Sorted-order pass 1 (round 4): ride the coordinates through ONE kv
    # sort and do everything downstream in sorted segment order —
    # segmented doubling-tree reductions + one compaction sort — instead
    # of the former scatter pipeline (per-point slot scatter, compaction
    # scatter, unique-id verification gather, two segment_sum
    # scatter-adds: ~0.85 ms/scan of serialized ~8 ns/update scatters at
    # 24k points; the sorted-order version measures a fraction of that).
    sorted_vid, sx_, sy_, sz_ = jax.lax.sort(
        (vid, px, py, pz), num_keys=1)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_vid[1:] != sorted_vid[:-1]]
    ) & (sorted_vid != _INT_MAX)
    pos = jnp.cumsum(first.astype(jnp.int32)) - 1
    n_unique = jnp.maximum(pos[-1] + 1, 0)
    # Points in voxels beyond the slot capacity drop, exactly as the old
    # slot-clamp + id-verification path dropped them (unique ids are
    # strictly increasing, so an overflow point can never match slot V-1).
    in_map = (sorted_vid != _INT_MAX) & (pos < V)

    w = in_map.astype(dtype)
    # Two-pass centered covariance in voxel-corner coordinates. The
    # reference accumulates raw second moments in double
    # (``voxel_grid_covariance_omp_impl.hpp:233-237,329-330``); in f32 that
    # single-pass form cancels catastrophically for voxels tens of meters
    # from the origin, and a pure corner-centered single pass still loses
    # ~2 digits on near-degenerate (inflation-bound) voxels. So: pass 1
    # accumulates corner-relative sums (x' = x - corner, bounded by the
    # resolution); pass 2 broadcasts each segment's mean offset d =
    # mean - corner back to its points and accumulates exactly
    # mean-centered products (x' - d). Algebraically equal to the
    # reference's ((sum_pp - 2 sum_p mean^T)/n + mean mean^T) * (n-1)/n.
    res_t = jnp.asarray(res, dtype)
    # Voxel corner from the sorted id (identical int decode to the
    # per-point ijk for every real id; w gates the INT_MAX tail).
    pid = jnp.where(sorted_vid == _INT_MAX, 0, sorted_vid)
    pi_ = pid % jnp.maximum(div[0], 1)
    pj_ = (pid // jnp.maximum(div[0], 1)) % jnp.maximum(div[1], 1)
    pk_ = pid // jnp.maximum(div[0] * div[1], 1)
    cx = jnp.where(in_map, sx_ - (pi_ + min_b[0]) * res_t, 0.0)
    cy = jnp.where(in_map, sy_ - (pj_ + min_b[1]) * res_t, 0.0)
    cz = jnp.where(in_map, sz_ - (pk_ + min_b[2]) * res_t, 0.0)

    # Two-level segmented reduction (ops/segtree, r5): 7 in-row rounds +
    # a tiny cross-row carry replace the flat log2(n) doubling tree.
    # first/pos stay the flat recipe's (needed BEFORE the reduction for
    # the in_map gate); seg_reduce recomputes its own internally —
    # bit-equal bookkeeping, pinned by tests/test_segtree.py.
    from toyslam_tpu.ops.segtree import seg_broadcast, seg_reduce

    def seg_tree_sum(vals):
        return seg_reduce(sorted_vid, vals)[0]

    acc1 = seg_tree_sum(jnp.stack([w, cx, cy, cz]))  # sums at first pos
    cnt_pt = acc1[0]
    d_pt = acc1[1:] / jnp.maximum(cnt_pt, 1.0)[None, :]  # valid at first

    # Gather-free segment broadcast of d to every element (two-level
    # log-shift fill, ops/segtree.seg_broadcast — the flat bit-trick
    # confined to 128-lane rows plus a row-summary scan).
    d_pt = seg_broadcast(sorted_vid, d_pt)

    ex = jnp.where(in_map, cx - d_pt[0], 0.0)
    ey = jnp.where(in_map, cy - d_pt[1], 0.0)
    ez = jnp.where(in_map, cz - d_pt[2], 0.0)
    acc2_pt = seg_tree_sum(jnp.stack(
        [ex * ex, ex * ey, ex * ez, ey * ey, ey * ez, ez * ez]))

    # Compact (id, count, corner-relative sums, centered products) at the
    # segment-first positions to the leading V slots with one kv sort —
    # first elements carry key = pos (already ascending), the rest sort
    # to the back. Replaces the former compaction scatter + per-point
    # slot scatter + id-verification gather.
    key2 = jnp.where(first & (pos < V), pos, _INT_MAX)
    (_, c_vid, c_cnt, c_sx, c_sy, c_sz,
     c_xx, c_xy, c_xz, c_yy, c_yz, c_zz) = jax.lax.sort(
        (key2, sorted_vid, acc1[0], acc1[1], acc1[2], acc1[3],
         acc2_pt[0], acc2_pt[1], acc2_pt[2], acc2_pt[3], acc2_pt[4],
         acc2_pt[5]), num_keys=1)
    take_v = lambda a: (a[:V] if V <= n else jnp.concatenate(
        [a, jnp.zeros((V - n,), a.dtype)]))
    occupied = jnp.arange(V, dtype=jnp.int32) < jnp.minimum(n_unique, V)
    unique_ids = jnp.where(occupied, take_v(c_vid), _INT_MAX)
    cnt = jnp.where(occupied, take_v(c_cnt), 0.0)
    cnt_safe = jnp.maximum(cnt, 1.0)
    d_slot = jnp.stack(
        [take_v(c_sx), take_v(c_sy), take_v(c_sz)], 1) / cnt_safe[:, None]
    # Per-slot voxel corner from the (sorted unique) voxel id.
    sid = jnp.where(unique_ids == _INT_MAX, 0, unique_ids)
    si = sid % jnp.maximum(div[0], 1)
    sj = (sid // jnp.maximum(div[0], 1)) % jnp.maximum(div[1], 1)
    sk = sid // jnp.maximum(div[0] * div[1], 1)
    mean_x = (si + min_b[0]).astype(dtype) * res_t + d_slot[:, 0]
    mean_y = (sj + min_b[1]).astype(dtype) * res_t + d_slot[:, 1]
    mean_z = (sk + min_b[2]).astype(dtype) * res_t + d_slot[:, 2]
    corr = (cnt_safe - 1.0) / (cnt_safe * cnt_safe)
    v00 = take_v(c_xx) * corr
    v01 = take_v(c_xy) * corr
    v02 = take_v(c_xz) * corr
    v11 = take_v(c_yy) * corr
    v12 = take_v(c_yz) * corr
    v22 = take_v(c_zz) * corr

    (l0, l1, l2), vec = eigh3_soa(v00, v01, v02, v11, v12, v22)
    # cov is PSD by construction; small negative eigenvalues are pure f32
    # roundoff (the reference accumulates in double and checks >= 0 strictly,
    # ``voxel_grid_covariance_omp_impl.hpp:337-341``). Clamp roundoff-scale
    # negatives to zero, reject genuinely indefinite results.
    tol = 1e-5 * jnp.maximum(l2, 0.0)
    eig_ok = (l0 >= -tol) & (l1 >= -tol) & (l2 > 0)
    l0 = jnp.maximum(l0, 0.0)
    l1 = jnp.maximum(l1, 0.0)

    # Eq 6.11 inflation: eigenvalues below mult * lambda_max are raised,
    # covariance recomposed as V diag V^T (component form).
    min_ev = config.min_covar_eigvalue_mult * l2
    needs = l0 < min_ev
    li0 = jnp.maximum(l0, min_ev)
    li1 = jnp.maximum(l1, min_ev)

    def recompose(i, j):
        # sum_k lambda_k v_ik v_jk ; vec is row-major v[i*3+j] = V[i][j]
        return (li0 * vec[i * 3 + 0] * vec[j * 3 + 0]
                + li1 * vec[i * 3 + 1] * vec[j * 3 + 1]
                + l2 * vec[i * 3 + 2] * vec[j * 3 + 2])

    v00 = jnp.where(needs, recompose(0, 0), v00)
    v01 = jnp.where(needs, recompose(0, 1), v01)
    v02 = jnp.where(needs, recompose(0, 2), v02)
    v11 = jnp.where(needs, recompose(1, 1), v11)
    v12 = jnp.where(needs, recompose(1, 2), v12)
    v22 = jnp.where(needs, recompose(2, 2), v22)

    # Closed-form symmetric 3x3 inverse (adjugate / det).
    A = v11 * v22 - v12 * v12
    B = -(v01 * v22 - v12 * v02)
    C = v01 * v12 - v11 * v02
    det = v00 * A + v01 * B + v02 * C
    inv_det = jnp.where(det != 0, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)
    i00 = A * inv_det
    i01 = B * inv_det
    i02 = C * inv_det
    i11 = (v00 * v22 - v02 * v02) * inv_det
    i12 = -(v00 * v12 - v01 * v02) * inv_det
    i22 = (v00 * v11 - v01 * v01) * inv_det
    icov_fin = (jnp.isfinite(i00) & jnp.isfinite(i01) & jnp.isfinite(i02)
                & jnp.isfinite(i11) & jnp.isfinite(i12) & jnp.isfinite(i22))
    icov_ok = icov_fin & (jnp.abs(det) > 0)

    valid = (
        (cnt >= config.min_points_per_voxel)
        & (unique_ids != _INT_MAX)
        & eig_ok
        & icov_ok
    )
    vw = valid.astype(dtype)

    # Per-slot arrays are already [map_capacity]-sized by construction.
    icov6 = jnp.stack([i00 * vw, i01 * vw, i02 * vw,
                       i11 * vw, i12 * vw, i22 * vw])
    mean3 = jnp.stack([mean_x, mean_y, mean_z])
    zero = jnp.zeros_like(vw)
    # Channels 10/11 carry the voxel id split into exact-in-f32 16-bit
    # halves so lookup verification rides the same row gather (1D gathers
    # measured 2x slower than 16-wide row gathers on TPU).
    vid_lo = jnp.where(valid, unique_ids & 0xFFFF, -1).astype(dtype)
    vid_hi = jnp.where(valid, unique_ids >> 16, -1).astype(dtype)
    table = jnp.stack([
        mean_x, mean_y, mean_z,
        i00 * vw, i01 * vw, i02 * vw, i11 * vw, i12 * vw, i22 * vw,
        vw, vid_lo, vid_hi, zero, zero, zero, zero,
    ], axis=1)  # [V, 16]

    # Hash-addressed stats table: the packed row is scattered directly to
    # slot h = vid & (cap - 1), so a lookup is ONE row gather (the former
    # slot-LUT indirection cost a second NK-row gather per evaluation).
    # Exact when the grid fits in the capacity; otherwise aliased ids are
    # caught by the id halves in channels 10/11 (aliased losers simply
    # leave the map).
    cap = config.grid_capacity
    h = unique_ids & (cap - 1)
    ok_row = valid & (unique_ids != _INT_MAX)
    h_safe = jnp.where(ok_row, h, 0)
    # In-bounds add-form scatter (invalid rows add zeros at slot 0; OOB
    # drop-scatters hit the slow serialized TPU path). Two hash-aliased
    # valid voxels ADD their rows — the summed id halves then match neither
    # id, so both drop out of lookups (the set-form kept one; either way
    # aliasing losers leave the map). Empty slots keep all-zero rows: the
    # valid flag in channel 9 gates them out at lookup, so no -1 id fill
    # is needed.
    hash_table = jnp.zeros((cap, 16), dtype).at[h_safe].add(
        jnp.where(ok_row[:, None], table, 0.0))

    return NDTMap(
        unique_ids=unique_ids,
        valid=valid,
        min_b=min_b,
        div=div,
        div_mul=div_mul,
        hash_table=hash_table,
        vid_of_slot=jnp.where(valid, unique_ids, _INT_MAX),
        mean3=mean3,
        icov6=icov6,
        table=table,
    )


_OFFSETS = {
    "DIRECT1": [(0, 0, 0)],
    "DIRECT7": [(0, 0, 0), (1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0),
                (0, 0, 1), (0, 0, -1)],
    "DIRECT27": [
        (i, j, k) for i in (0, 1, -1) for j in (0, 1, -1) for k in (0, 1, -1)
    ],
}


def lookup_neighbors(ndt_map: NDTMap, query_xyz, resolution, offsets):
    """Gather neighbor voxel slots for each query point ([N, K] API).

    Equivalent of ``getNeighborhoodAtPoint{,7,1}``
    (``voxel_grid_covariance_omp_impl.hpp:372-442``). Debug/parity API, not
    the hot path (which reads stats rows directly from ``hash_table``):
    slots are resolved by binary search over the sorted unique ids.
    """
    ijk = jnp.floor(query_xyz * (1.0 / resolution)).astype(jnp.int32) \
        - ndt_map.min_b
    off = jnp.asarray(offsets, jnp.int32)  # [K, 3]
    nijk = ijk[:, None, :] + off[None, :, :]  # [N, K, 3]
    in_bounds = jnp.all((nijk >= 0) & (nijk < ndt_map.div), axis=-1)
    nvid = jnp.sum(nijk * ndt_map.div_mul, axis=-1)
    ok = in_bounds & (nvid >= 0)
    slot = jnp.searchsorted(ndt_map.unique_ids, nvid).astype(jnp.int32)
    slot = jnp.minimum(slot, ndt_map.unique_ids.shape[0] - 1)
    found = ok & (ndt_map.vid_of_slot[slot] == nvid)
    return slot, found


def _centroid_sqdist(ndt_map: NDTMap, query_xyz):
    """[Q, V] squared distances query -> valid voxel centroids (means).

    One MXU matmul (``|q|^2 + |c|^2 - 2 q.c``) replaces the reference's
    KD-tree over leaf centroids; invalid/padding slots are pushed to +inf
    so they sort last under ``top_k``.
    """
    mu = ndt_map.mean3  # [3, V]
    q = query_xyz
    qn = jnp.sum(q * q, axis=-1, keepdims=True)  # [Q, 1]
    cn = jnp.sum(mu * mu, axis=0)  # [V]
    cross = jnp.matmul(q, mu, precision=_HP)  # [Q, V]
    d2 = jnp.maximum(qn + cn[None, :] - 2.0 * cross, 0.0)
    big = jnp.asarray(jnp.finfo(d2.dtype).max, d2.dtype)
    return jnp.where(ndt_map.valid[None, :], d2, big)


def nearest_k_search(ndt_map: NDTMap, query_xyz, k: int):
    """k nearest valid voxels by centroid distance, per query point.

    Equivalent of ``VoxelGridCovariance::nearestKSearch``
    (``voxel_grid_covariance_omp.h:468-496``: KD-tree over leaf centroids,
    returns leaf pointers + squared distances). Here: one ``[Q, V]``
    distance matrix + ``top_k`` — no tree, MXU-shaped, jit/vmap-safe.

    Args:
      query_xyz: [Q, 3] query points.
      k: static neighbor count.

    Returns ``(idx, sqdist, found)``: [Q, k] int32 slot indices into the
    packed arrays (``table``/``mean3``/``icov6``), [Q, k] squared
    distances, and [Q, k] bool marking real results (False rows appear
    only when the map holds fewer than k valid voxels).
    """
    d2 = _centroid_sqdist(ndt_map, query_xyz)
    neg, idx = jax.lax.top_k(-d2, k)
    found = ndt_map.valid[idx]
    return idx.astype(jnp.int32), jnp.where(found, -neg, 0.0), found


def radius_search(ndt_map: NDTMap, query_xyz, radius, max_nn: int):
    """Valid voxels with centroid within ``radius``, nearest-first.

    Equivalent of ``VoxelGridCovariance::radiusSearch``
    (``voxel_grid_covariance_omp.h:498-525``). Fixed-shape: returns the
    up-to-``max_nn`` nearest in-radius voxels plus the TOTAL in-radius
    count, so callers can detect truncation (the reference's unbounded
    vector return has no static-shape analog).

    Returns ``(idx, sqdist, found, count)``: [Q, max_nn] slots/squared
    distances/hit mask and [Q] int32 total in-radius counts.
    """
    d2 = _centroid_sqdist(ndt_map, query_xyz)
    within = d2 <= jnp.asarray(radius, d2.dtype) ** 2
    count = jnp.sum(within, axis=-1).astype(jnp.int32)
    neg, idx = jax.lax.top_k(-d2, max_nn)
    found = jnp.take_along_axis(within, idx, axis=-1)
    return (idx.astype(jnp.int32), jnp.where(found, -neg, 0.0), found,
            count)


def _angle_tables(p, dtype):
    """Precomputed angular derivative tables (eqs. 6.19/6.21 [Magnusson 2009];
    reference ``computeAngleDerivatives``, ``ndt_omp_impl.hpp:287-395``)."""
    small = 10e-5

    def cs(a):
        c = jnp.where(jnp.abs(a) < small, 1.0, jnp.cos(a))
        s = jnp.where(jnp.abs(a) < small, 0.0, jnp.sin(a))
        return c, s

    cx, sx = cs(p[3])
    cy, sy = cs(p[4])
    cz, sz = cs(p[5])

    j = jnp.stack([
        jnp.stack([-sx * sz + cx * sy * cz, -sx * cz - cx * sy * sz, -cx * cy]),  # a
        jnp.stack([cx * sz + sx * sy * cz, cx * cz - sx * sy * sz, -sx * cy]),    # b
        jnp.stack([-sy * cz, sy * sz, cy]),                                        # c
        jnp.stack([sx * cy * cz, -sx * cy * sz, sx * sy]),                         # d
        jnp.stack([-cx * cy * cz, cx * cy * sz, -cx * sy]),                        # e
        jnp.stack([-cy * sz, -cy * cz, jnp.zeros_like(cx)]),                       # f
        jnp.stack([cx * cz - sx * sy * sz, -cx * sz - sx * sy * cz,
                   jnp.zeros_like(cx)]),                                           # g
        jnp.stack([sx * cz + cx * sy * sz, cx * sy * cz - sx * sz,
                   jnp.zeros_like(cx)]),                                           # h
    ]).astype(dtype)  # [8, 3]

    zero = jnp.zeros_like(cx)
    h = jnp.stack([
        jnp.stack([-cx * sz - sx * sy * cz, -cx * cz + sx * sy * sz, sx * cy]),   # a2
        jnp.stack([-sx * sz + cx * sy * cz, -cx * sy * sz - sx * cz, -cx * cy]),  # a3
        jnp.stack([cx * cy * cz, -cx * cy * sz, cx * sy]),                         # b2
        jnp.stack([sx * cy * cz, -sx * cy * sz, sx * sy]),                         # b3
        jnp.stack([-sx * cz - cx * sy * sz, sx * sz - cx * sy * cz, zero]),        # c2
        jnp.stack([cx * cz - sx * sy * sz, -sx * sy * cz - cx * sz, zero]),        # c3
        jnp.stack([-cy * cz, cy * sz, -sy]),                                       # d1 (sign fixed)
        jnp.stack([-sx * sy * cz, sx * sy * sz, sx * cy]),                         # d2
        jnp.stack([cx * sy * cz, -cx * sy * sz, -cx * cy]),                        # d3
        jnp.stack([sy * sz, sy * cz, zero]),                                       # e1
        jnp.stack([-sx * cy * sz, -sx * cy * cz, zero]),                           # e2
        jnp.stack([cx * cy * sz, cx * cy * cz, zero]),                             # e3
        jnp.stack([-cy * cz, cy * sz, zero]),                                      # f1
        jnp.stack([-cx * sz - sx * sy * cz, -cx * cz + sx * sy * sz, zero]),       # f2
        jnp.stack([-sx * sz + cx * sy * cz, -cx * sy * sz - sx * cz, zero]),       # f3
    ]).astype(dtype)  # [15, 3]
    return j, h


def _point_jacobians(src_xyz, j_tab):
    """Per-point rotation Jacobian block Jr [N, 3, 3] (eq. 6.18/6.19).

    Columns are d(T x)/d(roll, pitch, yaw); the translation block is identity
    and handled implicitly. Row layout mirrors ``computePointDerivatives``
    (``ndt_omp_impl.hpp:444-455``).
    """
    xj = jnp.einsum("ni,ki->nk", src_xyz, j_tab, precision=_HP)  # [N, 8]
    zero = jnp.zeros_like(xj[:, 0])
    col_roll = jnp.stack([zero, xj[:, 0], xj[:, 1]], -1)
    col_pitch = jnp.stack([xj[:, 2], xj[:, 3], xj[:, 4]], -1)
    col_yaw = jnp.stack([xj[:, 5], xj[:, 6], xj[:, 7]], -1)
    return jnp.stack([col_roll, col_pitch, col_yaw], -1)  # [N, 3, 3]


def _point_hessians(src_xyz, h_tab):
    """Per-point rotation Hessian blocks Hrr [N, 3, 3, 3] (eq. 6.20/6.21).

    Hrr[n, a, b] is the 3-vector second derivative of T(x_n) w.r.t. rotation
    params a, b. Mirrors the a..f vectors of ``computePointDerivatives``
    (``ndt_omp_impl.hpp:457-480``); symmetric in (a, b).
    """
    xh = jnp.einsum("ni,ki->nk", src_xyz, h_tab, precision=_HP)  # [N, 15]
    zero = jnp.zeros_like(xh[:, 0])
    a = jnp.stack([zero, xh[:, 0], xh[:, 1]], -1)
    b = jnp.stack([zero, xh[:, 2], xh[:, 3]], -1)
    c = jnp.stack([zero, xh[:, 4], xh[:, 5]], -1)
    d = jnp.stack([xh[:, 6], xh[:, 7], xh[:, 8]], -1)
    e = jnp.stack([xh[:, 9], xh[:, 10], xh[:, 11]], -1)
    f = jnp.stack([xh[:, 12], xh[:, 13], xh[:, 14]], -1)
    row0 = jnp.stack([a, b, c], -2)
    row1 = jnp.stack([b, d, e], -2)
    row2 = jnp.stack([c, e, f], -2)
    return jnp.stack([row0, row1, row2], -3)  # [N, 3(a), 3(b), 3(vec)]


class NeighborhoodStats(NamedTuple):
    """Per-(offset, point) voxel statistics gathered at one chart point.

    ``packed`` is a single [10, K*N] array in OFFSET-MAJOR order (all
    points' offset-0 rows, then offset-1, ...): rows 0-2 Gaussian mean,
    rows 3-8 inverse covariance (symmetric xx, xy, xz, yy, yz, zz), row 9
    the combined validity gate as 0/1 float (in-bounds, id-verified,
    occupied voxel, valid source point). The SoA properties are contiguous
    row views (free slices); the packed form feeds the Pallas kernel
    without further copies."""

    packed: jax.Array  # [10, K*N]

    @property
    def mx(self):
        return self.packed[0]

    @property
    def my(self):
        return self.packed[1]

    @property
    def mz(self):
        return self.packed[2]

    @property
    def cxx(self):
        return self.packed[3]

    @property
    def cxy(self):
        return self.packed[4]

    @property
    def cxz(self):
        return self.packed[5]

    @property
    def cyy(self):
        return self.packed[6]

    @property
    def cyz(self):
        return self.packed[7]

    @property
    def czz(self):
        return self.packed[8]

    @property
    def valid(self):
        return self.packed[9] > 0.5


def _expand(v, N, K):
    """[N] -> [K*N] offset-major (tile K times; pure broadcast)."""
    return jnp.broadcast_to(v[None, :], (K, N)).reshape(K * N)


def _neighbor_hash(ndt_map: NDTMap, src_xyz, p, resolution, offsets):
    """Transform points by p and compute, per (DIRECT offset, point):
    the hash slot ``h`` into the stats table, the expected voxel id
    ``nvid``, and the in-bounds flag ``ok`` (all [K*N], offset-major)."""
    dtype = src_xyz.dtype
    N = src_xyz.shape[0]
    K = len(offsets)
    NK = N * K

    T = se3.pose6_to_matrix(p)
    R, t = T[:3, :3], T[:3, 3]
    # One transpose instead of three padded column slices (each column
    # slice of the (8,128)-tiled [N,3] re-reads the whole padded array;
    # XLA CSEs the repeated transpose across hash/eval sites). [:3]
    # keeps [N,4] xyzi inputs working (direct-API callers pass them).
    sx, sy, sz = src_xyz.T[:3]
    tx = R[0, 0] * sx + R[0, 1] * sy + R[0, 2] * sz + t[0]
    ty = R[1, 0] * sx + R[1, 1] * sy + R[1, 2] * sz + t[1]
    tz = R[2, 0] * sx + R[2, 1] * sy + R[2, 2] * sz + t[2]

    inv_leaf = jnp.asarray(1.0 / resolution, dtype)
    ix = jnp.floor(tx * inv_leaf).astype(jnp.int32) - ndt_map.min_b[0]
    iy = jnp.floor(ty * inv_leaf).astype(jnp.int32) - ndt_map.min_b[1]
    iz = jnp.floor(tz * inv_leaf).astype(jnp.int32) - ndt_map.min_b[2]

    expand = lambda v: _expand(v, N, K)

    off = jnp.asarray(offsets, jnp.int32)  # [K, 3]
    ox = jnp.broadcast_to(off[:, 0][:, None], (K, N)).reshape(NK)
    oy = jnp.broadcast_to(off[:, 1][:, None], (K, N)).reshape(NK)
    oz = jnp.broadcast_to(off[:, 2][:, None], (K, N)).reshape(NK)

    nix = expand(ix) + ox
    niy = expand(iy) + oy
    niz = expand(iz) + oz
    div = ndt_map.div
    in_b = (
        (nix >= 0) & (nix < div[0]) & (niy >= 0) & (niy < div[1])
        & (niz >= 0) & (niz < div[2])
    )
    nvid = nix + niy * div[0] + niz * (div[0] * div[1])
    g_cap = ndt_map.hash_table.shape[0]
    ok = in_b & (nvid >= 0)
    h = jnp.where(ok, nvid & (g_cap - 1), 0)
    return h, nvid, ok


def _aux_channels(nvid, ok, src_mask, N, K, dtype):
    """[3, K*N/128, 128] aux channels for the raw-stats Pallas kernels:
    expected voxel id 16-bit halves + the in-bounds & source-mask flag."""
    okm = (ok & _expand(src_mask, N, K)).astype(dtype)
    return jnp.stack([
        (nvid & 0xFFFF).astype(dtype),
        (nvid >> 16).astype(dtype),
        okm,
    ]).reshape(3, (K * N) // 128, 128)


def gather_neighborhood_raw(ndt_map: NDTMap, src_xyz, src_mask, p,
                            resolution, offsets):
    """Stats gather for the raw-input Pallas kernel (``ndt_terms_raw``).

    Returns the UNTOUCHED [K*N, 16] row-gather output plus the compact
    [3, K*N/128, 128] aux channels (expected id halves + in-bounds/mask
    flag) the kernel needs for its in-register id-verification gate. No
    XLA pass ever re-reads the (8x lane-padded) gather buffer — measured
    ~3.5 ms/scan of slice/and-reduce/transpose traffic per exact-config
    256k odometry scan (benchmarks/profile_exact_trace.py, round 4)."""
    dtype = src_xyz.dtype
    N = src_xyz.shape[0]
    K = len(offsets)
    h, nvid, ok = _neighbor_hash(ndt_map, src_xyz, p, resolution, offsets)
    if gatherflat.FLATTEN_BATCHED:
        raw = gatherflat.row_gather(ndt_map.hash_table, h)
    else:
        raw = ndt_map.hash_table[h]
    return raw, _aux_channels(nvid, ok, src_mask, N, K, dtype)


def gather_neighborhood(ndt_map: NDTMap, src_xyz, src_mask, p,
                        resolution, offsets,
                        use_pallas: bool | None = None) -> NeighborhoodStats:
    """Voxel lookup + stats gather for every (DIRECT offset, source point).

    The gather half of the reference's ``computeDerivatives`` hot loop
    (``ndt_omp_impl.hpp:178-285``): transform points by p, find their
    neighbor voxels, and fetch each voxel's Gaussian as ONE [K*N, 16] row
    gather from the hash-addressed stats table (random row gathers run at
    a ~9-12 ns/row hardware floor — the dominant cost of an evaluation —
    so the former slot-LUT indirection, a second NK-row gather, is gone).
    Split out so a line search can reuse one neighborhood across trial
    steps (``NDTConfig.frozen_linesearch``)."""
    dtype = src_xyz.dtype
    N = src_xyz.shape[0]
    K = len(offsets)

    expand = lambda v: _expand(v, N, K)
    h, nvid, ok = _neighbor_hash(ndt_map, src_xyz, p, resolution, offsets)
    # [NK, 16] — THE row gather. Under the fleet's vmap this can lower as
    # one flattened single-level gather instead of a batched gather
    # (ops/gatherflat.py; bit-identical values). Trace-time gate: the
    # custom_vmap wrapper does not support reverse-mode autodiff, so the
    # default path must stay a plain gather for the jax.grad/jax.hessian
    # oracles.
    if gatherflat.FLATTEN_BATCHED:
        stats = gatherflat.row_gather(ndt_map.hash_table, h)
    else:
        stats = ndt_map.hash_table[h]
    # Compact repack: on TPU f32 the single-pass Pallas kernel replaces
    # the ~3 XLA passes over the 8x lane-padded gather buffer (column
    # slices for the id check, the gate and-reduce, the 9-channel
    # transpose copy). Bit-identical channels; the jnp path below serves
    # CPU / f64 / autodiff oracles.
    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu"
                      and dtype == jnp.float32)
    if use_pallas and N % 1024 == 0:
        from toyslam_tpu.ops import ndt_pallas

        aux = _aux_channels(nvid, ok, src_mask, N, K, dtype)
        packed = ndt_pallas.ndt_repack(aux, stats).reshape(10, K * N)
        return NeighborhoodStats(packed=packed)
    # Exactly-one-voxel gate: hash-colliding valid voxels ADD their rows
    # (see build_ndt_map), and the summed 16-bit id halves of two aliased
    # ids can coincidentally equal a third in-grid voxel id — the id check
    # alone would then accept a sum of two Gaussians. The valid channel of
    # such a row is 2.0, so requiring it to be exactly one voxel restores
    # the invariant that every id-verified row is an exact map row.
    vox_valid = (stats[:, 9] > 0.5) & (stats[:, 9] < 1.5)
    # Aliasing/occupancy verification via the id halves in the same row
    vid_match = (
        (stats[:, 10] == (nvid & 0xFFFF).astype(dtype))
        & (stats[:, 11] == (nvid >> 16).astype(dtype))
    )
    gate = (ok & vid_match & vox_valid & expand(src_mask)).astype(dtype)
    packed = jnp.concatenate([stats[:, :9].T, gate[None]], axis=0)
    return NeighborhoodStats(packed=packed)


def compute_derivatives(ndt_map: NDTMap, src_xyz, src_mask, p, d1, d2,
                        resolution, offsets, compute_hessian: bool = True,
                        use_pallas: bool | None = None,
                        stats: NeighborhoodStats | None = None,
                        axis_name: str | None = None):
    """Score, gradient and Hessian of the NDT objective at chart point p.

    Fused flat-layout equivalent of the reference's OpenMP hot loop
    (``computeDerivatives``, ``ndt_omp_impl.hpp:178-285`` +
    ``updateDerivatives`` ``:483-537``).

    TPU layout strategy:
    - per-point quantities are computed once on [N] lanes and expanded to
      [K*N] by broadcast-tile (contiguous, no random access);
    - ALL per-voxel statistics arrive via ONE [K*N, 16] row gather from the
      hash-addressed map table (XLA lowers many separate 1D gathers to
      repeated table scans — measured 77 GB of traffic/eval);
    - on TPU f32 the entire post-gather evaluation runs as ONE Pallas
      kernel fed by 3 per-point coordinate channels + the 10 packed stats
      channels; everything else (transform, angular projections, the 28
      score/grad/Hessian terms) is computed in-register (measured ~20x
      less HBM traffic than the XLA elementwise graph, which materializes
      ~36 K*N-sized channels). ``use_pallas=None`` auto-enables this on
      the TPU backend; the jnp fallback stacks the 28 terms into a single
      [C, K*N] tensor reduced in one pass (and supports f64 + autodiff).

    Pass ``stats`` (a prior ``gather_neighborhood`` result) to skip the
    gathers and evaluate against a frozen neighborhood.
    """
    dtype = src_xyz.dtype
    N = src_xyz.shape[0]
    K = len(offsets)

    T = se3.pose6_to_matrix(p)
    R, t = T[:3, :3], T[:3, 3]
    # One transpose instead of three padded column slices (each column
    # slice of the (8,128)-tiled [N,3] re-reads the whole padded array;
    # XLA CSEs the repeated transpose across hash/eval sites). [:3]
    # keeps [N,4] xyzi inputs working (direct-API callers pass them).
    sx, sy, sz = src_xyz.T[:3]

    expand = lambda v: _expand(v, N, K)

    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu"
                      and dtype == jnp.float32)
    if use_pallas and compute_hessian and N % 1024 == 0:
        # Fused post-gather Pallas kernel (see ops/ndt_pallas.py). With no
        # frozen stats, the raw-input variant feeds the kernel the gather
        # output directly (its single consumer); frozen/carried stats stay
        # in the compact 10-channel form (cheap to carry and to re-read
        # across line-search trials).
        from toyslam_tpu.ops import ndt_pallas

        j_tab, h_tab = _angle_tables(p, dtype)
        R_N = N // 128
        xyz3 = jnp.stack([sx, sy, sz]).reshape(3, R_N, 128)
        params = jnp.concatenate([
            jnp.stack([d1.astype(dtype), d2.astype(dtype)]),
            T[:3, :].reshape(-1),   # 12: rotation rows + translation col
            j_tab.reshape(-1),      # 24
            h_tab.reshape(-1),      # 45
        ]).reshape(1, 83)
        if stats is None:
            raw, aux = gather_neighborhood_raw(
                ndt_map, src_xyz, src_mask, p, resolution, offsets)
            sums = ndt_pallas.ndt_terms_raw(params, xyz3, aux, raw)
        else:
            stats10 = stats.packed.reshape(10, K * R_N, 128)
            sums = ndt_pallas.ndt_terms(params, xyz3, stats10)
        if axis_name is not None:
            sums = jax.lax.psum(sums, axis_name)
        score = sums[0]
        grad = sums[1:7]
        tri = sums[7:]
        rows, cols = jnp.triu_indices(6)
        hess = jnp.zeros((6, 6), dtype)
        hess = hess.at[rows, cols].set(tri)
        hess = hess.at[cols, rows].set(tri)
        return score, grad, hess

    if stats is None:
        stats = gather_neighborhood(ndt_map, src_xyz, src_mask, p,
                                    resolution, offsets,
                                    use_pallas=use_pallas)

    tx = R[0, 0] * sx + R[0, 1] * sy + R[0, 2] * sz + t[0]
    ty = R[1, 0] * sx + R[1, 1] * sy + R[1, 2] * sz + t[1]
    tz = R[2, 0] * sx + R[2, 1] * sy + R[2, 2] * sz + t[2]

    mx, my, mz = stats.mx, stats.my, stats.mz
    cxx, cxy, cxz = stats.cxx, stats.cxy, stats.cxz
    cyy, cyz, czz = stats.cyy, stats.cyz, stats.czz

    qx = expand(tx) - mx
    qy = expand(ty) - my
    qz = expand(tz) - mz

    Cqx = cxx * qx + cxy * qy + cxz * qz
    Cqy = cxy * qx + cyy * qy + cyz * qz
    Cqz = cxz * qx + cyz * qy + czz * qz
    qCq = qx * Cqx + qy * Cqy + qz * Cqz

    e = jnp.exp(-0.5 * d2 * qCq)
    e_x_cov_x = d2 * e
    # NaN/invalid guard (``ndt_omp_impl.hpp:506-507``)
    gate = (
        (e_x_cov_x <= 1.0) & (e_x_cov_x >= 0.0) & jnp.isfinite(e_x_cov_x)
        & stats.valid
    ).astype(dtype)

    factor = d1 * d2 * e * gate  # [NK]

    # Angular tables and per-point projections x . j_row (eq. 6.19)
    j_tab, h_tab = _angle_tables(p, dtype)
    xjf = [expand(j_tab[k, 0] * sx + j_tab[k, 1] * sy + j_tab[k, 2] * sz)
           for k in range(8)]

    # u = q^T C J over the 6 chart dims (J = [I | Jr]); Jr columns:
    # roll = (0, xj0, xj1), pitch = (xj2, xj3, xj4), yaw = (xj5, xj6, xj7).
    u = (
        Cqx,
        Cqy,
        Cqz,
        Cqy * xjf[0] + Cqz * xjf[1],
        Cqx * xjf[2] + Cqy * xjf[3] + Cqz * xjf[4],
        Cqx * xjf[5] + Cqy * xjf[6] + Cqz * xjf[7],
    )

    # ---- Single fused reduction over all score/grad/Hessian terms ----
    terms = [-d1 * e * gate]  # score
    terms += [factor * ui for ui in u]  # gradient (6)

    if compute_hessian:
        # C @ Jr columns (vec comp i, angle col m) — shared by tr/rr blocks.
        CJ = [
            [cxy * xjf[0] + cxz * xjf[1],
             cxx * xjf[2] + cxy * xjf[3] + cxz * xjf[4],
             cxx * xjf[5] + cxy * xjf[6] + cxz * xjf[7]],
            [cyy * xjf[0] + cyz * xjf[1],
             cxy * xjf[2] + cyy * xjf[3] + cyz * xjf[4],
             cxy * xjf[5] + cyy * xjf[6] + cyz * xjf[7]],
            [cyz * xjf[0] + czz * xjf[1],
             cxz * xjf[2] + cyz * xjf[3] + czz * xjf[4],
             cxz * xjf[5] + cyz * xjf[6] + czz * xjf[7]],
        ]
        C = [[cxx, cxy, cxz], [cxy, cyy, cyz], [cxz, cyz, czz]]

        def col_dot(a, v):
            if a == 0:
                return xjf[0] * v[1] + xjf[1] * v[2]
            if a == 1:
                return xjf[2] * v[0] + xjf[3] * v[1] + xjf[4] * v[2]
            return xjf[5] * v[0] + xjf[6] * v[1] + xjf[7] * v[2]

        xhf = [expand(h_tab[k, 0] * sx + h_tab[k, 1] * sy + h_tab[k, 2] * sz)
               for k in range(15)]
        Hv = {
            (0, 0): Cqy * xhf[0] + Cqz * xhf[1],
            (0, 1): Cqy * xhf[2] + Cqz * xhf[3],
            (0, 2): Cqy * xhf[4] + Cqz * xhf[5],
            (1, 1): Cqx * xhf[6] + Cqy * xhf[7] + Cqz * xhf[8],
            (1, 2): Cqx * xhf[9] + Cqy * xhf[10] + Cqz * xhf[11],
            (2, 2): Cqx * xhf[12] + Cqy * xhf[13] + Cqz * xhf[14],
        }

        for i in range(6):
            for j in range(i, 6):
                contrib = -d2 * factor * u[i] * u[j]
                if i < 3 and j < 3:
                    contrib = contrib + factor * C[i][j]
                elif i < 3 <= j:
                    contrib = contrib + factor * CJ[i][j - 3]
                else:
                    a_, b_ = i - 3, j - 3
                    contrib = contrib + factor * (
                        col_dot(a_, [CJ[0][b_], CJ[1][b_], CJ[2][b_]])
                        + Hv[(a_, b_)]
                    )
                terms.append(contrib)

    stacked = jnp.stack(terms)  # [C, NK]
    sums = jnp.sum(stacked, axis=1)  # [C]
    if axis_name is not None:
        # Point-sharded SPMD: every term is a plain sum over (point,
        # neighbor) pairs, so one [C]-vector psum over the mesh axis
        # completes the global derivatives (see parallel/batch.py).
        sums = jax.lax.psum(sums, axis_name)

    score = sums[0]
    grad = sums[1:7]
    if not compute_hessian:
        return score, grad, None

    tri = sums[7:]
    rows, cols = jnp.triu_indices(6)
    hess = jnp.zeros((6, 6), dtype)
    hess = hess.at[rows, cols].set(tri)
    hess = hess.at[cols, rows].set(tri)
    return score, grad, hess


# ----------------------------------------------------------------------------
# More-Thuente line search (More & Thuente 1994; reference
# ``ndt_omp_impl.hpp:647-932``) as branch-free jittable scalar logic.
# ----------------------------------------------------------------------------


def _trial_value_selection(a_l, f_l, g_l, a_u, f_u, g_u, a_t, f_t, g_t):
    """Four-case trial value selection (``trialValueSelectionMT``,
    ``ndt_omp_impl.hpp:689-769``), Sun & Yuan 2006 interpolants."""

    def cubic_min(a_lo, f_lo, g_lo, a_hi, f_hi, g_hi):
        z = 3.0 * (f_hi - f_lo) / _safe(a_hi - a_lo) - g_hi - g_lo
        w = jnp.sqrt(jnp.maximum(z * z - g_hi * g_lo, 0.0))
        return a_lo + (a_hi - a_lo) * (w - g_lo - z) / _safe(g_hi - g_lo + 2.0 * w)

    def _safe(x):
        return jnp.where(x == 0, jnp.finfo(x.dtype).tiny, x)

    # Case 1: f_t > f_l
    a_c1 = cubic_min(a_l, f_l, g_l, a_t, f_t, g_t)
    a_q = a_l - 0.5 * (a_l - a_t) * g_l / _safe(
        g_l - (f_l - f_t) / _safe(a_l - a_t)
    )
    case1 = jnp.where(
        jnp.abs(a_c1 - a_l) < jnp.abs(a_q - a_l), a_c1, 0.5 * (a_q + a_c1)
    )

    # Case 2: g_t * g_l < 0
    a_c2 = cubic_min(a_l, f_l, g_l, a_t, f_t, g_t)
    a_s = a_l - (a_l - a_t) / _safe(g_l - g_t) * g_l
    case2 = jnp.where(jnp.abs(a_c2 - a_t) >= jnp.abs(a_s - a_t), a_c2, a_s)

    # Case 3: |g_t| <= |g_l|
    a_c3 = cubic_min(a_l, f_l, g_l, a_t, f_t, g_t)
    a_t_next = jnp.where(jnp.abs(a_c3 - a_t) < jnp.abs(a_s - a_t), a_c3, a_s)
    case3 = jnp.where(
        a_t > a_l,
        jnp.minimum(a_t + 0.66 * (a_u - a_t), a_t_next),
        jnp.maximum(a_t + 0.66 * (a_u - a_t), a_t_next),
    )

    # Case 4: otherwise — cubic through (a_u, a_t)
    case4 = cubic_min(a_u, f_u, g_u, a_t, f_t, g_t)

    return jnp.where(
        f_t > f_l,
        case1,
        jnp.where(
            g_t * g_l < 0,
            case2,
            jnp.where(jnp.abs(g_t) <= jnp.abs(g_l), case3, case4),
        ),
    )


def _update_interval(a_l, f_l, g_l, a_u, f_u, g_u, a_t, f_t, g_t):
    """Interval update (``updateIntervalMT``, ``ndt_omp_impl.hpp:648-686``).
    Returns new endpoints + converged flag."""
    case_u1 = f_t > f_l
    case_u2 = (~case_u1) & (g_t * (a_l - a_t) > 0)
    case_u3 = (~case_u1) & (g_t * (a_l - a_t) < 0)
    converged = (~case_u1) & (~case_u2) & (~case_u3)

    new_a_u = jnp.where(case_u1, a_t, jnp.where(case_u3, a_l, a_u))
    new_f_u = jnp.where(case_u1, f_t, jnp.where(case_u3, f_l, f_u))
    new_g_u = jnp.where(case_u1, g_t, jnp.where(case_u3, g_l, g_u))
    move_l = case_u2 | case_u3
    new_a_l = jnp.where(move_l, a_t, a_l)
    new_f_l = jnp.where(move_l, f_t, f_l)
    new_g_l = jnp.where(move_l, g_t, g_l)
    return new_a_l, new_f_l, new_g_l, new_a_u, new_f_u, new_g_u, converged


def ndt_align(ndt_map: NDTMap, source: PointCloud, guess=None,
              config: NDTConfig = NDTConfig(),
              axis_name: str | None = None) -> NDTResult:
    """Align source to the map: Newton on the 6-dof Euler chart with
    More-Thuente step control, one compiled program.

    Mirrors ``computeTransformation`` (``ndt_omp_impl.hpp:80-171``) and
    ``computeStepLengthMT`` (``:772-932``).

    ``axis_name``: run point-sharded SPMD inside ``shard_map`` — this
    device holds a shard of the source points (map replicated), the
    per-evaluation derivative sums are ``psum``-ed over the mesh axis, and
    the (replicated) Newton/line-search scalar logic proceeds identically
    on every device. See ``parallel/batch.sharded_align``.
    """
    dtype = source.xyzi.dtype
    src_xyz = source.xyzi[:, :3]
    src_mask = source.mask
    n_src = jnp.sum(src_mask.astype(dtype))
    if axis_name is not None:
        n_src = jax.lax.psum(n_src, axis_name)
    n_src = jnp.maximum(n_src, 1.0)

    d1, d2, _d3 = gauss_coefficients(config.resolution, config.outlier_ratio, dtype)
    offsets = _OFFSETS[config.search_method]

    if guess is None:
        guess = jnp.eye(4, dtype=dtype)

    p0 = se3.matrix_to_pose6(guess.astype(dtype))

    def derivs(p):
        return compute_derivatives(
            ndt_map, src_xyz, src_mask, p, d1, d2, config.resolution, offsets,
            use_pallas=config.use_pallas, axis_name=axis_name,
        )

    step_max = jnp.asarray(config.step_size, dtype)
    step_min = jnp.asarray(config.transformation_epsilon / 2.0, dtype)
    mu = jnp.asarray(1.0e-4, dtype)
    nu = jnp.asarray(0.9, dtype)

    def line_search(p, step_dir, step_init, score, grad, hess,
                    ls_stats=None):
        """More-Thuente; returns (a_t, p_new, score, grad, hess)."""
        phi_0 = -score
        d_phi_0 = -jnp.dot(grad, step_dir)
        # Reverse direction if not a descent direction
        reverse = d_phi_0 > 0
        step_dir = jnp.where(reverse, -step_dir, step_dir)
        d_phi_0 = jnp.where(reverse, -d_phi_0, d_phi_0)
        zero_dir = d_phi_0 == 0

        def psi(a, phi_a):
            return phi_a - phi_0 - mu * d_phi_0 * a

        def dpsi(d_phi_a):
            return d_phi_a - mu * d_phi_0

        a_t0 = jnp.clip(step_init, step_min, step_max)
        p_t0 = p + step_dir * a_t0
        if config.frozen_linesearch:
            if ls_stats is None:
                # One gather at the first trial point; further trials reuse
                # it (first-trial-accepted iterations — the common case —
                # are exactly the reference evaluation).
                ls_stats = gather_neighborhood(
                    ndt_map, src_xyz, src_mask, p_t0, config.resolution,
                    offsets, use_pallas=config.repack_pallas)
            derivs_trial = lambda pt: compute_derivatives(
                ndt_map, src_xyz, src_mask, pt, d1, d2, config.resolution,
                offsets, use_pallas=config.use_pallas, stats=ls_stats,
                axis_name=axis_name)
            score_t, grad_t, hess_t = derivs_trial(p_t0)
        else:
            derivs_trial = derivs
            score_t, grad_t, hess_t = derivs(p_t0)
        phi_t = -score_t
        d_phi_t = -jnp.dot(grad_t, step_dir)
        psi_t = psi(a_t0, phi_t)
        d_psi_t = dpsi(d_phi_t)

        f_l0 = jnp.zeros((), dtype)  # psi(0) = 0
        g_l0 = (1.0 - mu) * d_phi_0  # dpsi(0) = d_phi_0 - mu*d_phi_0
        state0 = dict(
            a_l=jnp.zeros((), dtype), f_l=f_l0, g_l=g_l0,
            a_u=jnp.zeros((), dtype), f_u=f_l0, g_u=g_l0,
            a_t=a_t0, phi_t=phi_t, d_phi_t=d_phi_t, psi_t=psi_t,
            d_psi_t=d_psi_t, open=jnp.asarray(True),
            interval_converged=jnp.asarray(False),
            it=jnp.zeros((), jnp.int32),
            score=score_t, grad=grad_t, hess=hess_t,
        )

        def cond(s):
            sufficient = (s["psi_t"] <= 0) & (s["d_phi_t"] <= -nu * d_phi_0)
            return (
                (~s["interval_converged"])
                & (s["it"] < config.max_step_iterations)
                & (~sufficient)
                & (~zero_dir)
            )

        def body(s):
            f_t_sel = jnp.where(s["open"], s["psi_t"], s["phi_t"])
            g_t_sel = jnp.where(s["open"], s["d_psi_t"], s["d_phi_t"])
            a_t = _trial_value_selection(
                s["a_l"], s["f_l"], s["g_l"], s["a_u"], s["f_u"], s["g_u"],
                s["a_t"], f_t_sel, g_t_sel,
            )
            a_t = jnp.clip(a_t, step_min, step_max)
            p_t = p + step_dir * a_t
            score_t, grad_t, hess_t = derivs_trial(p_t)
            phi_t = -score_t
            d_phi_t = -jnp.dot(grad_t, step_dir)
            psi_t = psi(a_t, phi_t)
            d_psi_t = dpsi(d_phi_t)

            closing = s["open"] & (psi_t <= 0) & (d_psi_t >= 0)
            open_new = s["open"] & (~closing)
            # psi -> phi endpoint conversion on close (``:894-905``)
            f_l = jnp.where(closing, s["f_l"] + phi_0 - mu * d_phi_0 * s["a_l"], s["f_l"])
            g_l = jnp.where(closing, s["g_l"] + mu * d_phi_0, s["g_l"])
            f_u = jnp.where(closing, s["f_u"] + phi_0 - mu * d_phi_0 * s["a_u"], s["f_u"])
            g_u = jnp.where(closing, s["g_u"] + mu * d_phi_0, s["g_u"])

            f_t_upd = jnp.where(open_new, psi_t, phi_t)
            g_t_upd = jnp.where(open_new, d_psi_t, d_phi_t)
            a_l2, f_l2, g_l2, a_u2, f_u2, g_u2, iconv = _update_interval(
                s["a_l"], f_l, g_l, s["a_u"], f_u, g_u, a_t, f_t_upd, g_t_upd
            )
            return dict(
                a_l=a_l2, f_l=f_l2, g_l=g_l2, a_u=a_u2, f_u=f_u2, g_u=g_u2,
                a_t=a_t, phi_t=phi_t, d_phi_t=d_phi_t, psi_t=psi_t,
                d_psi_t=d_psi_t, open=open_new, interval_converged=iconv,
                it=s["it"] + 1, score=score_t, grad=grad_t, hess=hess_t,
            )

        s = jax.lax.while_loop(cond, body, state0)
        a_final = jnp.where(zero_dir, 0.0, s["a_t"])
        p_new = p + step_dir * a_final
        return (
            a_final,
            p_new,
            jnp.where(zero_dir, score, s["score"]),
            jnp.where(zero_dir, grad, s["grad"]),
            jnp.where(zero_dir, hess, s["hess"]),
            # evals this line search: the unconditional first-trial eval +
            # loop trials (the zero_dir guard discards values but the
            # traced first-trial evaluation still executes — count cost)
            1 + s["it"],
        )

    turbo = config.frozen_linesearch and config.regather_iterations < (1 << 29)
    if turbo:
        stats0 = gather_neighborhood(ndt_map, src_xyz, src_mask, p0,
                                     config.resolution, offsets,
                                     use_pallas=config.repack_pallas)
        score0, grad0, hess0 = compute_derivatives(
            ndt_map, src_xyz, src_mask, p0, d1, d2, config.resolution,
            offsets, use_pallas=config.use_pallas, stats=stats0,
            axis_name=axis_name)
    else:
        score0, grad0, hess0 = derivs(p0)

    def newton_cond(carry):
        return ~carry["converged"]

    def _make_newton_body(stats_mode, frozen_stats=None):
        """Newton body; ``stats_mode`` selects the line-search stats source:
        "exact" (fresh gathers inside line_search), "frozen" (the
        loop-invariant ``frozen_stats`` closure), or "gather" (regather at
        the predicted first trial point, stats kept in the carry)."""

        def newton_body(carry):
            p, score, grad, hess = (carry["p"], carry["score"],
                                    carry["grad"], carry["hess"])
            delta_p = se3.svd_solve(hess, -grad)
            norm = jnp.linalg.norm(delta_p)
            degenerate = (norm == 0) | ~jnp.isfinite(norm)

            step_dir = delta_p / jnp.where(degenerate, 1.0, norm)
            if stats_mode == "frozen":
                # The neighborhood is a loop-invariant closure — no stats
                # in the while carry (which would copy the multi-MB buffer
                # every iteration), no cond.
                a_t, p_new, score_n, grad_n, hess_n, n_ev = line_search(
                    p, step_dir, norm, score, grad, hess,
                    ls_stats=frozen_stats
                )
                ls_stats = None
            elif stats_mode == "gather":
                # Predict the first trial point (mirrors line_search's
                # descent reversal + clip) and regather there. The gather is
                # UNCONDITIONAL: this body only runs inside the bounded
                # regather loop below. (A per-iteration
                # lax.cond(it < regather_iterations, gather, carry) here
                # becomes a select under vmap — batched fleets then execute
                # the multi-million-row gather on EVERY lockstep Newton
                # iteration instead of the budgeted few; measured 7x on the
                # 64-way fleet.)
                d_phi_0 = -jnp.dot(grad, step_dir)
                dir_eff = jnp.where(d_phi_0 > 0, -step_dir, step_dir)
                p_t0 = p + dir_eff * jnp.clip(norm, step_min, step_max)
                ls_stats = gather_neighborhood(ndt_map, src_xyz, src_mask,
                                               p_t0, config.resolution,
                                               offsets,
                                               use_pallas=config.repack_pallas)
                a_t, p_new, score_n, grad_n, hess_n, n_ev = line_search(
                    p, step_dir, norm, score, grad, hess, ls_stats=ls_stats
                )
            else:
                ls_stats = None
                a_t, p_new, score_n, grad_n, hess_n, n_ev = line_search(
                    p, step_dir, norm, score, grad, hess
                )

            p_out = jnp.where(degenerate, p, p_new)
            score_out = jnp.where(degenerate, score, score_n)
            grad_out = jnp.where(degenerate, grad, grad_n)
            hess_out = jnp.where(degenerate, hess, hess_n)
            it = carry["it"]
            # Reference check order (``ndt_omp_impl.hpp:158-162``): with the
            # pre-increment count, so the eps test is skipped on iteration 0.
            converged = degenerate | (it > config.max_iterations) | (
                (it >= 1) & (jnp.abs(a_t) < config.transformation_epsilon)
            )
            # NaN norm means failure (reference returns converged_=false)
            failed = ~jnp.isfinite(norm)
            # Work accounting: evals = every derivative evaluation this
            # iteration; gathers = full stats-table gathers executed
            # (exact: one per eval; gather/turbo: the one regather;
            # frozen: none).
            n_gather = {"exact": n_ev, "gather": 1, "frozen": 0}[stats_mode]
            out = dict(
                p=p_out, score=score_out, grad=grad_out, hess=hess_out,
                it=it + 1, converged=converged,
                failed=carry["failed"] | failed,
                evals=carry["evals"] + n_ev,
                gathers=carry["gathers"] + n_gather,
            )
            if stats_mode == "gather":
                out["stats"] = ls_stats
            return out

        return newton_body

    carry0 = dict(
        p=p0, score=score0, grad=grad0, hess=hess0,
        it=jnp.zeros((), jnp.int32), converged=jnp.asarray(False),
        failed=jnp.asarray(False),
        # the init evaluation (and its gather, in every mode)
        evals=jnp.ones((), jnp.int32), gathers=jnp.ones((), jnp.int32),
    )
    if turbo and config.regather_iterations != 0:
        # Two-phase Newton: a bounded regather loop (fresh neighborhood at
        # the predicted trial point each iteration, stats in the carry),
        # then a frozen loop continuing from the LAST regathered stats as a
        # loop-invariant closure. Identical per-lane semantics to a single
        # loop with a regather cond, but vmap-efficient: the batched fleet
        # pays at most regather_iterations gather executions and never
        # copies the stats buffer in the steady-state loop.
        carry0["stats"] = stats0

        def regather_cond(carry):
            return (~carry["converged"]) & (
                carry["it"] < config.regather_iterations)

        carry1 = jax.lax.while_loop(
            regather_cond, _make_newton_body("gather"), carry0)
        stats_last = carry1["stats"]
        carry = jax.lax.while_loop(
            newton_cond, _make_newton_body("frozen", stats_last),
            {k: v for k, v in carry1.items() if k != "stats"})
    elif turbo:
        carry = jax.lax.while_loop(
            newton_cond, _make_newton_body("frozen", stats0), carry0)
    else:
        carry = jax.lax.while_loop(
            newton_cond, _make_newton_body("exact"), carry0)

    T = se3.pose6_to_matrix(carry["p"])
    return NDTResult(
        transform=T,
        converged=~carry["failed"],
        iterations=carry["it"],
        trans_probability=carry["score"] / n_src,
        pose6=carry["p"],
        evaluations=carry["evals"],
        gathers=carry["gathers"],
    )


def fitness_score(source: PointCloud, target: PointCloud, transform,
                  max_range: float = jnp.inf, chunk: int = 2048):
    """Mean squared nearest-neighbor distance (pcl::Registration::
    getFitnessScore semantics) via chunked brute-force distances on the MXU."""
    dtype = source.xyzi.dtype
    src = jnp.matmul(
        source.xyzi[:, :3], transform[:3, :3].T, precision=_HP
    ) + transform[:3, 3]
    tgt = target.xyzi[:, :3]
    tgt_sq = jnp.sum(tgt * tgt, axis=1)
    big = jnp.asarray(1e30, dtype)
    tgt_sq = jnp.where(target.mask, tgt_sq, big)

    n = src.shape[0]
    pad = (-n) % chunk
    src_p = jnp.pad(src, ((0, pad), (0, 0)))
    mask_p = jnp.pad(source.mask, (0, pad))

    def one_chunk(s):
        d = (
            jnp.sum(s * s, axis=1)[:, None]
            - 2.0 * jnp.matmul(s, tgt.T, precision=_HP)
            + tgt_sq[None, :]
        )
        return jnp.min(d, axis=1)

    dists = jax.lax.map(one_chunk, src_p.reshape(-1, chunk, 3)).reshape(-1)
    dists = jnp.maximum(dists, 0.0)
    use = mask_p & (dists <= max_range * max_range)
    cnt = jnp.maximum(jnp.sum(use.astype(dtype)), 1.0)
    return jnp.sum(jnp.where(use, dists, 0.0)) / cnt


def sample_display_cloud(ndt_map: NDTMap, key, points_per_voxel: int = 100):
    """Sample points from each voxel Gaussian for visualization.

    Port of ``VoxelGridCovariance::getDisplayCloud`` (``voxel_grid_
    covariance_omp_impl.hpp:446-483``): per-voxel Cholesky of the covariance
    drives Gaussian samples around the mean. Returns (xyz [V*P, 3],
    mask [V*P]).
    """
    V = ndt_map.valid.shape[0]
    dtype = ndt_map.mean3.dtype
    # Covariance = inverse of icov (closed form, symmetric)
    xx, xy, xz, yy, yz, zz = ndt_map.icov6
    A = yy * zz - yz * yz
    B = -(xy * zz - yz * xz)
    C = xy * yz - yy * xz
    det = xx * A + xy * B + xz * C
    safe = jnp.where(jnp.abs(det) > 1e-20, det, 1.0)
    c00 = A / safe
    c01 = B / safe
    c02 = C / safe
    c11 = (xx * zz - xz * xz) / safe
    c12 = -(xx * yz - xy * xz) / safe
    c22 = (xx * yy - xy * xy) / safe

    # Cholesky of the 3x3 covariance in closed form
    l00 = jnp.sqrt(jnp.maximum(c00, 1e-12))
    l10 = c01 / l00
    l20 = c02 / l00
    l11 = jnp.sqrt(jnp.maximum(c11 - l10 * l10, 1e-12))
    l21 = (c12 - l20 * l10) / l11
    l22 = jnp.sqrt(jnp.maximum(c22 - l20 * l20 - l21 * l21, 1e-12))

    z = jax.random.normal(key, (V, points_per_voxel, 3), dtype)
    sx = l00[:, None] * z[..., 0]
    sy = l10[:, None] * z[..., 0] + l11[:, None] * z[..., 1]
    sz_ = (l20[:, None] * z[..., 0] + l21[:, None] * z[..., 1]
           + l22[:, None] * z[..., 2])
    mean = ndt_map.mean3.T  # [V, 3]
    pts = mean[:, None, :] + jnp.stack([sx, sy, sz_], -1)
    mask = jnp.broadcast_to(ndt_map.valid[:, None], (V, points_per_voxel))
    return pts.reshape(-1, 3), mask.reshape(-1)
