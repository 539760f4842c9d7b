"""Wide-BVH traversal: one fat-row gather + dense child sweep per visit.

The hot loop of the framework. Per iteration and per photon lane:

  * ONE ~400-800 B gather of a unified table row — either a node row (up
    to F children's AABBs + first-child pointer) or a leaf row (up to K
    pre-assembled triangles). Gathers on TPU cost ~8-20 ns/row nearly
    independent of width, so fat rows amortize the fetch;
  * a dense slab sweep of all F children / Moller-Trumbore sweep of all K
    triangles on the VPU (cheap next to the gather);
  * register-resident traversal state: current row index plus a
    (sibling-base, pending-bitmask) stack whose depth is the (shallow)
    tree height.

Descent is nearest-child-first for early pruning.

Tail divergence: traversal lengths are heavy-tailed (mean ~12-35 visits,
max ~80+), and a lockstep loop pays max-visits gathers for every lane. So
the query runs in two phases inside one jit: a fixed number of full-batch
iterations, then a device-side compaction (stable argsort) that packs the
surviving minority into a static 1/4-size slice for the remainder, with a
full-size fallback loop for rare overflow. No host synchronization.

This replaces both the reference's per-thread stack walk
(chroma/cuda/mesh.h:45-126) and this framework's escape-pointer DFS
(chroma_tpu.ops.mesh) on the hot path; the DFS version remains as the
cross-checking reference implementation.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

EPSILON = 1e-6
FLT_EPSILON = 1.19209290e-07

# two-phase tuning: full-batch iterations before compacting the active
# tail into a 1/COMPACT_DIVISOR slice
PHASE1_ITERS = 28
COMPACT_DIVISOR = 4
MIN_TWO_PHASE = 4096


def _ctz32(m):
    "Index of the lowest set bit of a uint32 (32 for m == 0)."
    low = m & (~m + jnp.uint32(1))
    return jnp.where(
        m == 0, 32,
        jax.lax.population_count(low - jnp.uint32(1)).astype(jnp.int32))


def _make_body(wide, rays):
    """Build the per-iteration visit function for a ray bundle.
    rays = (origin, direction, inv_dir, neg_org, finite, last_hit)."""
    origin, direction, inv_dir, neg_org, finite, last_hit = rays
    n = origin.shape[0]
    f = wide.fanout
    k = wide.leaf_size
    depth_max = wide.max_depth
    leaf_base = wide.leaf_base

    def child_hitmask(rows, best_d, active):
        """Dense slab test of all F children in a fetched node row.
        Returns (hit bitmask (N,) u32, nearest hit child (N,) i32)."""
        r = rows[:, :6 * f].reshape(n, 6, f)
        lo = r[:, 0:3]                  # (N,3,F)
        hi = r[:, 3:6]
        t0 = lo * inv_dir[:, :, None] + neg_org[:, :, None]
        t1 = hi * inv_dir[:, :, None] + neg_org[:, :, None]
        tsmall = jnp.where(finite[:, :, None], jnp.minimum(t0, t1),
                           -jnp.inf)
        tbig = jnp.where(finite[:, :, None], jnp.maximum(t0, t1), jnp.inf)
        tmin = jnp.maximum(jnp.max(tsmall, axis=1), 0.0)   # (N,F)
        tmax = jnp.min(tbig, axis=1)
        # padding children carry NaN bounds; reject explicitly rather than
        # relying on NaN propagation through the reductions
        valid = lo[:, 0] == lo[:, 0]
        hit = ((tmin <= tmax) & (tmin <= best_d[:, None]) & valid
               & active[:, None])
        bits = jnp.where(hit, jnp.uint32(1), jnp.uint32(0)) \
            << jnp.arange(f, dtype=jnp.uint32)[None, :]
        hitmask = jnp.sum(bits, axis=1, dtype=jnp.uint32)
        # descend nearest-first: maximizes early pruning of the rest
        nearest = jnp.argmin(jnp.where(hit, tmin, jnp.inf),
                             axis=1).astype(jnp.int32)
        return hitmask, nearest

    def leaf_update(rows, active, best_tri, best_d):
        "Dense Moller-Trumbore over all K triangles in a leaf block."
        r = rows[:, :10 * k].reshape(n, k, 10)
        v0 = r[:, :, 0:3]
        e1 = r[:, :, 3:6]
        e2 = r[:, :, 6:9]
        tri_idx = jax.lax.bitcast_convert_type(r[:, :, 9], jnp.int32)

        dirn = direction[:, None, :]
        h = jnp.cross(dirn, e2)
        a = jnp.sum(e1 * h, axis=-1)
        parallel = jnp.abs(a) <= FLT_EPSILON
        finv = 1.0 / jnp.where(parallel, 1.0, a)
        s = origin[:, None, :] - v0
        u = finv * jnp.sum(s * h, axis=-1)
        q = jnp.cross(s, e1)
        v = finv * jnp.sum(dirn * q, axis=-1)
        t = finv * jnp.sum(e2 * q, axis=-1)

        ok = (~parallel
              & (u >= -EPSILON) & (u <= 1.0 + EPSILON)
              & (v >= -EPSILON) & (u + v <= 1.0 + EPSILON)
              & (t > EPSILON) & jnp.isfinite(t)
              & (tri_idx >= 0)
              & (tri_idx != last_hit[:, None])
              & active[:, None])
        t = jnp.where(ok, t, jnp.inf)
        # min + masked select instead of argmin-indexing: per-lane fancy
        # indexing would lower to another (slow) gather
        tbest = jnp.min(t, axis=1)
        at_min = t <= tbest[:, None]
        tri_min = jnp.max(jnp.where(at_min & ok, tri_idx, -1), axis=1)
        closer = tbest < best_d
        best_d = jnp.where(closer, tbest, best_d)
        best_tri = jnp.where(closer, tri_min, best_tri)
        return best_tri, best_d

    def stack_get(arr, idx):
        "arr[:, idx] with a per-lane dynamic slot (static unroll)."
        out = jnp.zeros(n, dtype=arr.dtype)
        for d in range(depth_max):
            out = jnp.where(idx == d, arr[:, d], out)
        return out

    def stack_set(arr, idx, value, pred):
        cols = []
        for d in range(depth_max):
            sel = pred & (idx == d)
            cols.append(jnp.where(sel, value, arr[:, d]))
        return jnp.stack(cols, axis=1)

    def body(state):
        cur, depth, bases, masks, best_tri, best_d = state
        active = cur >= 0
        at_leaf = active & (cur >= leaf_base)
        internal = active & ~at_leaf

        rows = wide.rows[jnp.where(active, cur, 0)]  # the ONE gather

        hitmask, nearest = child_hitmask(rows, best_d, internal)
        best_tri, best_d = leaf_update(rows, at_leaf, best_tri, best_d)

        first_child = jax.lax.bitcast_convert_type(rows[:, 6 * f],
                                                   jnp.int32)

        # descend into the nearest hit child, saving the sibling group
        # (base + remaining mask) on the stack
        will_descend = internal & (hitmask != 0)
        rest = hitmask & ~(jnp.uint32(1) << nearest.astype(jnp.uint32))
        bases = stack_set(bases, depth, first_child, will_descend)
        masks = stack_set(masks, depth, rest, will_descend)
        cur = jnp.where(will_descend, first_child + nearest, cur)
        depth = jnp.where(will_descend, depth + 1, depth)

        # pop: jump straight to the highest pending sibling group (one
        # masked max + one dynamic-column read/write instead of a
        # slot-by-slot walk, which unrolled quadratically)
        need = active & ~will_descend
        slots = jnp.arange(depth_max, dtype=jnp.int32)
        pending = (masks != jnp.uint32(0)) & (slots[None, :]
                                              < depth[:, None])
        top = jnp.max(jnp.where(pending, slots[None, :], -1), axis=1)
        found = need & (top >= 0)
        pm = stack_get(masks, top)
        masks = stack_set(masks, top, pm & (pm - jnp.uint32(1)), found)
        cur = jnp.where(found, stack_get(bases, top) + _ctz32(pm),
                        jnp.where(need & (top < 0), -1, cur))
        depth = jnp.where(found, top + 1, depth)

        return cur, depth, bases, masks, best_tri, best_d

    return body


def _any_active(state):
    return jnp.any(state[0] >= 0)


def intersect_mesh_wide(origin, direction, wide, last_hit_triangle=None,
                        mask=None, best_limit=None, two_phase=True):
    """Nearest-triangle query against a WideBVH.

    origin/direction: (N,3) f32, direction normalized.
    last_hit_triangle: (N,) i32 excluded triangle (or None).
    mask: (N,) bool lanes to trace (or None).
    best_limit: (N,) f32 optional initial upper bound on the hit distance.

    Returns (triangle (N,) i32, distance (N,) f32) with -1/+inf misses.
    """
    from chroma_tpu.bvh.wide import InstancedBVH
    if isinstance(wide, InstancedBVH):
        return intersect_mesh_instanced(origin, direction, wide,
                                        last_hit_triangle, mask,
                                        best_limit, two_phase)
    n = origin.shape[0]
    depth_max = wide.max_depth

    if last_hit_triangle is None:
        last_hit_triangle = jnp.full(n, -1, jnp.int32)

    inv_dir = 1.0 / direction                       # (N,3)
    neg_org = -origin * inv_dir
    finite = jnp.isfinite(inv_dir)
    rays = (origin, direction, inv_dir, neg_org, finite,
            last_hit_triangle)

    izero = (origin[:, 0] * 0).astype(jnp.int32)
    fzero = origin[:, 0] * 0

    cur0 = izero                 # start at the root row
    depth0 = izero
    # derived from izero so the carry inherits shard_map varying axes
    bases0 = jnp.zeros((n, depth_max), dtype=jnp.int32) + izero[:, None]
    masks0 = jnp.zeros((n, depth_max), dtype=jnp.uint32) \
        + izero[:, None].astype(jnp.uint32)
    best_tri0 = izero - 1
    best_d0 = fzero + jnp.inf
    if best_limit is not None:
        best_d0 = best_limit
    if mask is not None:
        cur0 = jnp.where(mask, cur0, -1)

    state = (cur0, depth0, bases0, masks0, best_tri0, best_d0)

    if not two_phase or n < MIN_TWO_PHASE:
        body = _make_body(wide, rays)
        state = jax.lax.while_loop(_any_active, body, state)
        return state[4], state[5]

    state = _staged_query(_make_body, wide, rays, state,
                          _traversal_stages())
    return state[4], state[5]


# ---------------------------------------------------------------------------
# Instanced (TLAS/BLAS) traversal
#
# Same machine as above — one fat-row gather per visit, bitmask stack,
# nearest-first descent, two-phase tail compaction — over the tagged
# two-level table of chroma_tpu.bvh.wide.build_instanced_bvh. Rays carry a
# second register set (the current instance's local frame); visiting an
# instance row rotates the world ray into the local frame and jumps to the
# shared BLAS root, and popping back above the instance's depth restores the
# world registers. Hit distances are frame-invariant (placements are rigid),
# so best-hit pruning works across instances, and triangle ids are
# re-based to the flattened soup (instance tri_base + local index).
# ---------------------------------------------------------------------------

IBIG = 127  # d_inst sentinel: lane is in the world frame


def _make_body_inst(inst, rays):
    """Per-iteration visit function for the instanced table.
    rays = (origin, direction, inv_dir, neg_org, finite, last_hit), all in
    the WORLD frame; local-frame registers ride in the loop state."""
    from chroma_tpu.bvh.wide import TAG_INTERNAL, TAG_LEAF, TAG_INSTANCE

    origin, direction, inv_dir, neg_org, finite, last_hit = rays
    n = origin.shape[0]
    f = inst.fanout
    k = inst.leaf_size
    depth_max = inst.max_depth
    width = inst.rows.shape[1]

    def child_hitmask(rows, best_d, active, inv_l, neg_l, fin_l):
        r = rows[:, :6 * f].reshape(n, 6, f)
        lo = r[:, 0:3]
        hi = r[:, 3:6]
        t0 = lo * inv_l[:, :, None] + neg_l[:, :, None]
        t1 = hi * inv_l[:, :, None] + neg_l[:, :, None]
        tsmall = jnp.where(fin_l[:, :, None], jnp.minimum(t0, t1),
                           -jnp.inf)
        tbig = jnp.where(fin_l[:, :, None], jnp.maximum(t0, t1), jnp.inf)
        tmin = jnp.maximum(jnp.max(tsmall, axis=1), 0.0)
        tmax = jnp.min(tbig, axis=1)
        valid = lo[:, 0] == lo[:, 0]
        hit = ((tmin <= tmax) & (tmin <= best_d[:, None]) & valid
               & active[:, None])
        bits = jnp.where(hit, jnp.uint32(1), jnp.uint32(0)) \
            << jnp.arange(f, dtype=jnp.uint32)[None, :]
        hitmask = jnp.sum(bits, axis=1, dtype=jnp.uint32)
        nearest = jnp.argmin(jnp.where(hit, tmin, jnp.inf),
                             axis=1).astype(jnp.int32)
        return hitmask, nearest

    def leaf_update(rows, active, best_tri, best_d, o_l, d_l, tbase):
        r = rows[:, :10 * k].reshape(n, k, 10)
        v0 = r[:, :, 0:3]
        e1 = r[:, :, 3:6]
        e2 = r[:, :, 6:9]
        tri_idx = jax.lax.bitcast_convert_type(r[:, :, 9], jnp.int32)
        tri_global = tri_idx + tbase[:, None]

        dirn = d_l[:, None, :]
        h = jnp.cross(dirn, e2)
        a = jnp.sum(e1 * h, axis=-1)
        parallel = jnp.abs(a) <= FLT_EPSILON
        finv = 1.0 / jnp.where(parallel, 1.0, a)
        s = o_l[:, None, :] - v0
        u = finv * jnp.sum(s * h, axis=-1)
        q = jnp.cross(s, e1)
        v = finv * jnp.sum(dirn * q, axis=-1)
        t = finv * jnp.sum(e2 * q, axis=-1)

        ok = (~parallel
              & (u >= -EPSILON) & (u <= 1.0 + EPSILON)
              & (v >= -EPSILON) & (u + v <= 1.0 + EPSILON)
              & (t > EPSILON) & jnp.isfinite(t)
              & (tri_idx >= 0)
              & (tri_global != last_hit[:, None])
              & active[:, None])
        t = jnp.where(ok, t, jnp.inf)
        tbest = jnp.min(t, axis=1)
        at_min = t <= tbest[:, None]
        tri_min = jnp.max(jnp.where(at_min & ok, tri_global, -1), axis=1)
        closer = tbest < best_d
        best_d = jnp.where(closer, tbest, best_d)
        best_tri = jnp.where(closer, tri_min, best_tri)
        return best_tri, best_d

    def stack_get(arr, idx):
        out = jnp.zeros(n, dtype=arr.dtype)
        for d in range(depth_max):
            out = jnp.where(idx == d, arr[:, d], out)
        return out

    def stack_set(arr, idx, value, pred):
        cols = []
        for d in range(depth_max):
            sel = pred & (idx == d)
            cols.append(jnp.where(sel, value, arr[:, d]))
        return jnp.stack(cols, axis=1)

    def body(state):
        (cur, depth, bases, masks, best_tri, best_d,
         o_l, d_l, inv_l, neg_l, fin_l, d_inst, tbase) = state
        active = cur >= 0

        rows = inst.rows[jnp.where(active, cur, 0)]  # the ONE gather
        tag = jax.lax.bitcast_convert_type(rows[:, width - 1], jnp.int32)
        internal = active & (tag == TAG_INTERNAL)
        at_leaf = active & (tag == TAG_LEAF)
        is_inst = active & (tag == TAG_INSTANCE)

        hitmask, nearest = child_hitmask(rows, best_d, internal,
                                         inv_l, neg_l, fin_l)
        best_tri, best_d = leaf_update(rows, at_leaf, best_tri, best_d,
                                       o_l, d_l, tbase)

        first_child = jax.lax.bitcast_convert_type(rows[:, 6 * f],
                                                   jnp.int32)

        # instance entry: rotate the WORLD ray into the instance frame
        rmat = rows[:, 0:9].reshape(n, 3, 3)
        disp = rows[:, 9:12]
        o_li = jnp.einsum('nij,nj->ni', rmat, origin - disp)
        d_li = jnp.einsum('nij,nj->ni', rmat, direction)
        inv_li = 1.0 / d_li
        neg_li = -o_li * inv_li
        fin_li = jnp.isfinite(inv_li)
        sel = is_inst[:, None]
        o_l = jnp.where(sel, o_li, o_l)
        d_l = jnp.where(sel, d_li, d_l)
        inv_l = jnp.where(sel, inv_li, inv_l)
        neg_l = jnp.where(sel, neg_li, neg_l)
        fin_l = jnp.where(sel, fin_li, fin_l)
        d_inst = jnp.where(is_inst, depth, d_inst)
        tbase = jnp.where(is_inst,
                          jax.lax.bitcast_convert_type(rows[:, 13],
                                                       jnp.int32), tbase)
        blas_root = jax.lax.bitcast_convert_type(rows[:, 12], jnp.int32)

        # descend: internal -> nearest hit child; instance -> BLAS root
        desc_int = internal & (hitmask != 0)
        will = desc_int | is_inst
        rest = jnp.where(
            desc_int,
            hitmask & ~(jnp.uint32(1) << nearest.astype(jnp.uint32)),
            jnp.uint32(0))
        bases = stack_set(bases, depth,
                          jnp.where(is_inst, blas_root, first_child), will)
        masks = stack_set(masks, depth, rest, will)
        cur = jnp.where(is_inst, blas_root,
                        jnp.where(desc_int, first_child + nearest, cur))
        depth = jnp.where(will, depth + 1, depth)

        # pop: jump straight to the highest pending sibling group
        need = active & ~will
        slots = jnp.arange(depth_max, dtype=jnp.int32)
        pending = (masks != jnp.uint32(0)) & (slots[None, :]
                                              < depth[:, None])
        top = jnp.max(jnp.where(pending, slots[None, :], -1), axis=1)
        found = need & (top >= 0)
        pm = stack_get(masks, top)
        masks = stack_set(masks, top, pm & (pm - jnp.uint32(1)), found)
        cur = jnp.where(found, stack_get(bases, top) + _ctz32(pm),
                        jnp.where(need & (top < 0), -1, cur))
        depth = jnp.where(found, top + 1, depth)

        # leaving the instance: restore the world-frame registers
        leaving = (d_inst != IBIG) & (depth <= d_inst)
        ls = leaving[:, None]
        o_l = jnp.where(ls, origin, o_l)
        d_l = jnp.where(ls, direction, d_l)
        inv_l = jnp.where(ls, inv_dir, inv_l)
        neg_l = jnp.where(ls, neg_org, neg_l)
        fin_l = jnp.where(ls, finite, fin_l)
        tbase = jnp.where(leaving, 0, tbase)
        d_inst = jnp.where(leaving, IBIG, d_inst)

        return (cur, depth, bases, masks, best_tri, best_d,
                o_l, d_l, inv_l, neg_l, fin_l, d_inst, tbase)

    return body


def intersect_mesh_instanced(origin, direction, inst,
                             last_hit_triangle=None, mask=None,
                             best_limit=None, two_phase=True):
    """Nearest-triangle query against an InstancedBVH. Same contract as
    intersect_mesh_wide; returned triangle ids index the flattened soup."""
    n = origin.shape[0]
    depth_max = inst.max_depth

    if last_hit_triangle is None:
        last_hit_triangle = jnp.full(n, -1, jnp.int32)

    inv_dir = 1.0 / direction
    neg_org = -origin * inv_dir
    finite = jnp.isfinite(inv_dir)
    rays = (origin, direction, inv_dir, neg_org, finite,
            last_hit_triangle)

    izero = (origin[:, 0] * 0).astype(jnp.int32)
    fzero = origin[:, 0] * 0

    cur0 = izero
    depth0 = izero
    bases0 = jnp.zeros((n, depth_max), dtype=jnp.int32) + izero[:, None]
    masks0 = jnp.zeros((n, depth_max), dtype=jnp.uint32) \
        + izero[:, None].astype(jnp.uint32)
    best_tri0 = izero - 1
    best_d0 = fzero + jnp.inf
    if best_limit is not None:
        best_d0 = best_limit
    if mask is not None:
        cur0 = jnp.where(mask, cur0, -1)

    state = (cur0, depth0, bases0, masks0, best_tri0, best_d0,
             origin, direction, inv_dir, neg_org, finite,
             izero + IBIG, izero)

    if not two_phase or n < MIN_TWO_PHASE:
        body = _make_body_inst(inst, rays)
        state = jax.lax.while_loop(_any_active, body, state)
        return state[4], state[5]

    state = _staged_query(_make_body_inst, inst, rays, state,
                          _traversal_stages())
    return state[4], state[5]


def _traversal_stages():
    """Compaction pyramid: (bounded iterations, width divisor) per stage.
    Traversal lengths are heavy-tailed (p50 ~11 visits, p99 ~25), so a
    lockstep loop run to completion pays max-visits gathers for every
    lane; each stage stops early and packs the surviving minority into a
    static prefix slice (cumsum + scatter, no host sync) before
    continuing. Tunable via CHROMA_TRAV_STAGES='14:2,8:4,8:4'."""
    spec = os.environ.get('CHROMA_TRAV_STAGES')
    if spec:
        return tuple(tuple(int(x) for x in part.split(':'))
                     for part in spec.split(','))
    return ((PHASE1_ITERS, COMPACT_DIVISOR),)


def _compact_perm(active):
    """Stable front-packing permutation of the active lanes, as a
    (dest, perm) pair: dest[i] is lane i's packed slot, perm[j] is the
    source lane of slot j — so packing AND unpacking are both gathers.
    O(N): two cumsums and one iota scatter (no sort)."""
    act = active.astype(jnp.int32)
    n_act = jnp.sum(act)
    fwd = jnp.cumsum(act) - 1
    bwd = n_act + jnp.cumsum(1 - act) - 1
    dest = jnp.where(active, fwd, bwd)
    perm = jnp.zeros_like(dest).at[dest].set(
        jnp.arange(dest.shape[0], dtype=dest.dtype))
    return dest, perm


def _staged_query(body_factory, accel, rays, state, stages):
    """Run a traversal to completion with a pyramid of bounded lockstep
    phases, compacting survivors into a static prefix slice between
    phases (all device-side). Returns the final state, lane-aligned with
    the inputs."""
    if not stages:
        body = body_factory(accel, rays)
        return jax.lax.while_loop(_any_active, body, state)

    n = rays[0].shape[0]
    iters, div = stages[0]
    body = body_factory(accel, rays)

    def cond1(carry):
        i, st = carry
        return (i < iters) & _any_active(st)

    def body1(carry):
        i, st = carry
        return i + 1, body(st)

    _, state = jax.lax.while_loop(cond1, body1, (0, state))

    m = n // div
    if m < MIN_TWO_PHASE // COMPACT_DIVISOR:
        body = body_factory(accel, rays)
        return jax.lax.while_loop(_any_active, body, state)

    dest, perm = _compact_perm(state[0] >= 0)

    def permute(tree):
        return jax.tree_util.tree_map(lambda a: a[perm], tree)

    rays_p = permute(rays)
    state_p = permute(state)

    rays_s = jax.tree_util.tree_map(lambda a: a[:m], rays_p)
    state_s = jax.tree_util.tree_map(lambda a: a[:m], state_p)

    state_s = _staged_query(body_factory, accel, rays_s, state_s,
                            stages[1:])

    state_p = jax.tree_util.tree_map(
        lambda full, part: jax.lax.dynamic_update_slice_in_dim(
            full, part, 0, axis=0),
        state_p, state_s)

    # overflow fallback: survivors beyond the slice (rare) finish at
    # this stage's full width
    body_p = body_factory(accel, rays_p)
    state_p = jax.lax.while_loop(_any_active, body_p, state_p)

    # un-permute back to the caller's lane order (also a gather)
    return jax.tree_util.tree_map(lambda a: a[dest], state_p)
