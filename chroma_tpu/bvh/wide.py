"""Wide BVH: the TPU-native acceleration structure.

Motivation (measured on TPU v5e): a random gather costs ~20 ns per row
*independent of row width up to ~1 KB*, while dense VPU math on the
fetched row is essentially free. A classic binary/ternary BVH therefore
wastes the machine: ~100 node visits/ray x several 16-byte gathers each.
This structure instead makes every fetched row fat and every visit test an
entire child block densely:

  * up to F=32 children per node, tested in one vectorized slab sweep;
  * leaves are blocks of up to K=16 pre-assembled triangles (v0, e1, e2 in
    one fat row) tested in one Moller-Trumbore sweep;
  * children of a node are stored contiguously; the node row carries the
    absolute row index of its first child, so traversal state is a node
    row index plus a (sibling-base, pending-mask) stack of depth <= ~6.

Construction is pure numpy and mirrors the reference's recursive-grid
Morton-prefix grouping (reference: chroma/bvh/grid.py:11-95, coding as in
chroma/cuda/bvh.cu:148-203): triangles are Morton-sorted, grouped into
prefix-local blocks (tight boxes, unlike fixed-size runs), and levels are
built bottom-up the same way. Build time is seconds for millions of
triangles.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from chroma_tpu.bvh.build import morton_codes_3d

FANOUT = 16
LEAF_SIZE = 8
MAX_DEPTH = 16


@struct.dataclass
class WideBVH:
    # unified fat-row f32 table so each traversal iteration issues exactly
    # ONE gather.
    #   internal rows (indices < leaf_base):
    #     [lo_x*F, lo_y*F, lo_z*F, hi_x*F, hi_y*F, hi_z*F,
    #      first_child_row (bitcast i32), pad...]
    #     padding children have NaN bounds (slab test rejects NaN);
    #   leaf rows (indices >= leaf_base):
    #     [v0(3), e1(3), e2(3), tri_index (bitcast i32)] x K, pad tri -1.
    rows: jnp.ndarray
    leaf_base: int = struct.field(pytree_node=False)
    max_depth: int = struct.field(pytree_node=False)
    fanout: int = struct.field(pytree_node=False)
    leaf_size: int = struct.field(pytree_node=False)
    n_leaves: int = struct.field(pytree_node=False)


def _prefix_groups(codes, max_size, target_mean):
    """Group a Morton-sorted code array into runs of equal (shifted) codes
    with at most max_size elements (reference: chroma/bvh/grid.py:32-76).
    Returns (first, count, parent_codes)."""
    codes = codes.copy()
    n = len(codes)
    nunique = int((np.ediff1d(codes) > 0).sum()) + 1
    while nunique > 1 and n / nunique < target_mean:
        codes >>= np.uint64(1)
        nunique = int((np.ediff1d(codes) > 0).sum()) + 1

    change = np.ediff1d(codes, to_begin=np.uint64(1)).astype(np.uint64) > 0
    first = np.flatnonzero(change).astype(np.int64)
    count = np.ediff1d(first, to_end=n - first[-1]).astype(np.int64)
    group_codes = codes[first]

    oversized = count > max_size
    if oversized.any():
        nsplits = np.where(oversized, -(-count // max_size), 1)
        new_first = np.repeat(first, nsplits)
        ends = np.cumsum(nsplits)
        intra = np.arange(ends[-1]) - np.repeat(ends - nsplits, nsplits)
        first = new_first + intra * max_size
        group_codes = np.repeat(group_codes, nsplits)
        count = np.ediff1d(first, to_end=n - first[-1]).astype(np.int64)
    return first, count, group_codes


def build_wide_bvh(mesh, fanout=FANOUT, leaf_size=LEAF_SIZE,
                   internal_target_mean=None):
    """Build a WideBVH from a host Mesh (numpy in, device arrays out).

    internal_target_mean controls how aggressively Morton prefixes are
    coarsened when grouping internal levels (default: the fanout) — larger
    means shallower trees with fuller nodes."""
    if internal_target_mean is None:
        internal_target_mean = max(fanout // 2, 4)
    vertices = mesh.vertices.astype(np.float32)
    triangles = mesh.triangles.astype(np.int64)
    tri = vertices[triangles]  # (T,3,3)
    ntri = len(triangles)

    # Morton-order triangles by quantized centroid (reference coding)
    world_origin = vertices.min(axis=0)
    world_scale = max(float((vertices.max(axis=0) - world_origin).max())
                      / (2 ** 16 - 2), 1e-12)
    from chroma_tpu import native
    codes = native.morton_codes(tri, world_origin, world_scale) \
        if ntri > 100000 else None
    if codes is None:
        centroid = tri.mean(axis=1)
        q = ((centroid - world_origin) / world_scale).astype(np.uint32)
        codes = morton_codes_3d(q)
    order = native.argsort_u64(codes) if ntri > 100000 else None
    if order is None:
        order = np.argsort(codes)
    tri = tri[order]
    tri_index = order.astype(np.int32)
    codes = codes[order]

    tri_lo = tri.min(axis=1)
    tri_hi = tri.max(axis=1)

    # --- leaf blocks: prefix-local groups of <= leaf_size triangles ---
    first, count, group_codes = _prefix_groups(codes, leaf_size,
                                               target_mean=leaf_size)
    nblocks = len(first)
    leaf_rows = np.zeros((nblocks, leaf_size, 10), dtype=np.float32)
    leaf_rows[:, :, 9] = np.float32(np.int32(-1).view(np.float32))
    block_lo = np.full((nblocks, 3), np.inf, np.float32)
    block_hi = np.full((nblocks, 3), -np.inf, np.float32)

    # scatter triangles into (block, slot) positions, vectorized
    slot = np.arange(ntri) - np.repeat(first, count)
    block = np.repeat(np.arange(nblocks), count)
    leaf_rows[block, slot, 0:3] = tri[:, 0]
    leaf_rows[block, slot, 3:6] = tri[:, 1] - tri[:, 0]
    leaf_rows[block, slot, 6:9] = tri[:, 2] - tri[:, 0]
    leaf_rows[block, slot, 9] = tri_index.view(np.float32)
    # groups are contiguous runs, so reduceat (fast) replaces ufunc.at
    starts = first.astype(np.intp)
    block_lo = np.minimum.reduceat(tri_lo, starts, axis=0)
    block_hi = np.maximum.reduceat(tri_hi, starts, axis=0)

    # --- internal levels bottom-up ---
    levels = []  # list of (first_child_local, count, lo, hi), leaf-parents
    child_lo, child_hi, child_codes = block_lo, block_hi, group_codes
    depth_guard = 0
    while len(child_lo) > 1:
        first, count, child_codes = _prefix_groups(
            child_codes, fanout, target_mean=internal_target_mean)
        nparent = len(first)
        starts = first.astype(np.intp)
        lo = np.minimum.reduceat(child_lo, starts, axis=0)
        hi = np.maximum.reduceat(child_hi, starts, axis=0)
        levels.append((first, count, lo, hi))
        child_lo, child_hi = lo, hi
        depth_guard += 1
        if depth_guard > MAX_DEPTH:
            raise RuntimeError('wide BVH build did not converge')

    levels.reverse()  # root level first
    n_internal = sum(len(lv[0]) for lv in levels)
    width = max(6 * fanout + 2, 10 * leaf_size)

    rows = np.zeros((n_internal + nblocks, width), dtype=np.float32)
    rows[:n_internal, :6 * fanout] = np.nan
    leaf_base = n_internal

    # lay levels out top-down; level i's rows start at level_start[i]
    level_start = np.cumsum([0] + [len(lv[0]) for lv in levels])
    for i, (first, count, lo, hi) in enumerate(levels):
        base = level_start[i]
        npar = len(first)
        # absolute row index of each node's first child
        child_base = (level_start[i + 1] if i + 1 < len(levels)
                      else leaf_base)
        r = rows[base:base + npar]
        # bounds of actual children
        child_slot = np.arange(count.sum()) - np.repeat(
            np.cumsum(count) - count, count)
        parent_of = np.repeat(np.arange(npar), count)
        if i + 1 < len(levels):
            clo, chi = levels[i + 1][2], levels[i + 1][3]
        else:
            clo, chi = block_lo, block_hi
        for ax in range(3):
            r[parent_of, ax * fanout + child_slot] = clo[:, ax]
            r[parent_of, (3 + ax) * fanout + child_slot] = chi[:, ax]
        r[:, 6 * fanout] = (child_base
                            + first).astype(np.int32).view(np.float32)

    rows[leaf_base:, :10 * leaf_size] = leaf_rows.reshape(nblocks, -1)

    return WideBVH(
        rows=jnp.asarray(rows),
        leaf_base=int(leaf_base),
        max_depth=len(levels) + 1,
        fanout=fanout,
        leaf_size=leaf_size,
        n_leaves=int(nblocks),
    )
