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


def _stage_min():
    """Minimum lane count for restart staging (below this the
    loop-iteration floor dominates and in-traversal compaction cannot
    pay). Read per trace so tests can override it after import."""
    return int(os.environ.get('CHROMA_TRAV_STAGE_MIN', '65536'))

# visits per while_loop iteration: >1 amortizes the measured
# ~0.5-2 ms/iteration loop overhead (nearly width-independent on this
# runtime, so small widths get deeper unrolls), at the cost of up to
# (unroll-1) wasted visits per lane once it finishes.
# CHROMA_TRAV_UNROLL forces a fixed value.
TRAV_UNROLL = os.environ.get('CHROMA_TRAV_UNROLL', 'auto')

# Independent interleaved traversal chains per loop (instanced path) —
# MEASURED DEAD END, default 1 (off); kept env-gated with bitwise
# equivalence tests. The hypothesis: a per-visit row gather with RANDOM
# indices is latency-bound (~12.5 ms for 1M rows at ANY width 16..128
# f32 on v5e), and on a toy gather+kernel chain two independent
# interleaved chains ran at 0.27-0.32x the serial cost of two — XLA
# hides one chain's DMA stalls under the other's work, inside
# while_loops too. On the REAL traversal it does NOTHING: headline
# full-traversal 164/165/164 ms at chains=1/2/4, with or without kernel
# buffer aliasing, Pallas kernel or jnp body. The real gather's indices
# are COHERENT (lanes start together and diverge gradually; dead lanes
# clamp to row 0), measured ~2.7 ns/row at 1M lanes — already fully
# pipelined, no stalls for a second chain to fill. Worse, chains=2 cost
# the fused bomb 3.7x at headline scale (345k vs 1.29M photons/s) from
# doubled per-op overheads across the many small compaction buckets.
def _chains_for(n):
    "Chain count for an n-lane traversal (env read per trace: testable)."
    try:
        c = int(os.environ.get('CHROMA_TRAV_CHAINS', '1'))
    except ValueError:
        c = 1
    if c <= 1:
        return 1
    if n % (c * 256) or n // c < 1024:
        return 1
    return c


def _unroll_for(n):
    # measured: unroll 2 wins ~1.6x end-to-end; deeper width-adaptive
    # unrolls (4/8 at small widths) lost it back to wasted visits and
    # blow up CPU compile times under shard_map
    if TRAV_UNROLL != 'auto':
        return max(1, int(TRAV_UNROLL))
    return 2


def _unrolled(body, n, unroll=None):
    "Compose `body` with itself (visit-loop unrolling, width-adaptive)."
    unroll = _unroll_for(n) if unroll is None else unroll
    if unroll <= 1:
        return body

    def run(state):
        for _ in range(unroll):
            state = body(state)
        return state
    return run


def _ctz32(m):
    "Index of the lowest set bit of a uint32 (32 for m == 0)."
    low = m & (~m + jnp.uint32(1))
    return jnp.where(
        m == 0, 32,
        jax.lax.population_count(low - jnp.uint32(1)).astype(jnp.int32))


def safe_inv(direction):
    """1/direction with exactly-zero components nudged to 1e-25 first,
    so the inverse is finite (1e25) on every axis and the slab test
    needs no zero-direction containment fallback (see _child_sweep).
    The nudge scale keeps every intermediate (|bound|,|origin| <= ~1e5
    detector mm) below f32 overflow, so no inf-inf NaNs appear in the
    fma slab form."""
    return 1.0 / jnp.where(direction == 0.0, jnp.float32(1e-25),
                           direction)


def _ctz32_i32(m):
    """int32 variant (32 for m == 0). Two's-complement wrap keeps bit 31
    usable for fanout-32 masks: for m = INT_MIN, -m wraps back to INT_MIN
    and low - 1 to INT_MAX (popcount 31). The instanced state carries
    masks as i32 so they cross the Pallas kernel boundary with no
    bitcast buffer copies."""
    low = m & (-m)
    return jnp.where(
        m == 0, 32,
        jax.lax.population_count(low - 1).astype(jnp.int32))


def _child_sweep(gT, f, ray_cols, best_d, active, packed=False, b0=0,
                 fmt=None):
    """Slab test of all F children of a fetched node row, in column form:
    every operand is a fully lane-packed (N,) vector (the (N, 3, F)
    formulation left the 128-lane VPU at ~5% utilization and dominated
    the visit cost). gT is the transposed row block (W, N), so a column
    of the table is a contiguous (N,) row here. The sweep runs as a
    lax.fori_loop — a static unroll of F copies of this body inside the
    traversal while_loop was more than the TPU compiler could digest.

    fmt ('f32' | 'bf16' | 'q8', see bvh.wide) selects the bounds decode:
    bf16 pairs put child c in the low (c < F/2) or high half of word
    c mod F/2 (empty slots decode NaN and fail every comparison like the
    f32 NaN padding); q8 bytes decode via a per-VISIT hoisted affine
    transform — t = q * (scale*inv) + (anchor*inv + neg_org) — so the
    per-child cost is one fma per bound after the byte extract, matching
    bf16 (empty slots encode an inverted byte interval).

    inv (ix, iy, iz) MUST be finite: callers nudge exactly-zero
    direction components to +-1e-25 (safe_inv) so every axis runs the
    plain slab arithmetic — the nudged inverse (1e25) turns the slab
    test into a sign test on (bound - origin) whose only error is f32
    cancellation fuzz around the box face, orders of magnitude below
    the bf16/q8 bound padding. The previous per-axis containment
    fallback cost ~18 ops per child to serve the ~1e-6 of photons with
    an exactly-zero component. Returns (hit bitmask (N,) u32, nearest
    hit child (N,) i32)."""
    (ox, oy, oz), (ix, iy, iz), (nx, ny, nz), _ = ray_cols
    if fmt is None:
        fmt = 'bf16' if packed else 'f32'
    pw = f // 2
    qw = f // 4

    if fmt == 'q8':
        # per-visit q8 hoists: t-space affine per axis
        anc = [gT[b0 + ax] for ax in range(3)]
        scl = [gT[b0 + 3 + ax] for ax in range(3)]
        q_S = [s * i for s, i in zip(scl, (ix, iy, iz))]
        q_A = [a * i + ng for a, i, ng in zip(anc, (ix, iy, iz),
                                              (nx, ny, nz))]

    def body(c, carry):
        hitmask, nearest, tnear = carry
        valid = None
        if fmt == 'q8':
            word_i = c // 4
            shift = (c % 4) * 8

            def qbyte(g):
                word = jax.lax.dynamic_slice_in_dim(
                    gT, b0 + 6 + g * qw + word_i, 1, axis=0)[0]
                u = jax.lax.bitcast_convert_type(word, jnp.int32)
                return ((u >> shift) & jnp.int32(0xFF)).astype(jnp.float32)

            qb = [qbyte(g) for g in range(6)]
            valid = qb[0] <= qb[3]
            t0x = qb[0] * q_S[0] + q_A[0]
            t0y = qb[1] * q_S[1] + q_A[1]
            t0z = qb[2] * q_S[2] + q_A[2]
            t1x = qb[3] * q_S[0] + q_A[0]
            t1y = qb[4] * q_S[1] + q_A[1]
            t1z = qb[5] * q_S[2] + q_A[2]
        else:
            if fmt == 'bf16':
                low = c < pw
                w = jnp.where(low, c, c - pw)

                def col(k):
                    word = jax.lax.dynamic_slice_in_dim(
                        gT, b0 + w + k * pw, 1, axis=0)[0]
                    u = jax.lax.bitcast_convert_type(word, jnp.int32)
                    lov = jax.lax.bitcast_convert_type(u << 16, jnp.float32)
                    hiv = jax.lax.bitcast_convert_type(
                        u & jnp.int32(-65536), jnp.float32)
                    return jnp.where(low, lov, hiv)
            else:
                def col(k):
                    return jax.lax.dynamic_slice_in_dim(
                        gT, b0 + c + k * f, 1, axis=0)[0]
            lox, loy, loz = col(0), col(1), col(2)
            hix, hiy, hiz = col(3), col(4), col(5)
            t0x = lox * ix + nx
            t1x = hix * ix + nx
            t0y = loy * iy + ny
            t1y = hiy * iy + ny
            t0z = loz * iz + nz
            t1z = hiz * iz + nz
        smx = jnp.minimum(t0x, t1x)
        bgx = jnp.maximum(t0x, t1x)
        smy = jnp.minimum(t0y, t1y)
        bgy = jnp.maximum(t0y, t1y)
        smz = jnp.minimum(t0z, t1z)
        bgz = jnp.maximum(t0z, t1z)
        tmin = jnp.maximum(jnp.maximum(smx, smy),
                           jnp.maximum(smz, 0.0))
        tmax = jnp.minimum(jnp.minimum(bgx, bgy), bgz)
        # padding children carry NaN bounds (f32/bf16): NaN propagates
        # through min/max here and the comparisons below are all False
        hit = (tmin <= tmax) & (tmin <= best_d) & active
        if valid is not None:
            hit = hit & valid
        hitmask = hitmask | jnp.where(hit,
                                      jnp.uint32(1) << c.astype(jnp.uint32),
                                      jnp.uint32(0))
        # descend nearest-first: maximizes early pruning of the rest
        better = hit & (tmin < tnear)
        tnear = jnp.where(better, tmin, tnear)
        nearest = jnp.where(better, c, nearest)
        return hitmask, nearest, tnear

    hitmask0 = jnp.zeros_like(best_d, dtype=jnp.uint32)
    nearest0 = jnp.zeros_like(best_d, dtype=jnp.int32)
    tnear0 = jnp.full_like(best_d, jnp.inf)
    hitmask, nearest, _ = jax.lax.fori_loop(
        0, f, body, (hitmask0, nearest0, tnear0))
    return hitmask, nearest


def _leaf_sweep(gT, k, origin_cols, dir_cols, last_hit, active, hits,
                tri_base=None, iid=None):
    """Moller-Trumbore over all K triangles of a leaf row, in column form
    ((N,) vectors only, fori_loop — same rationale as _child_sweep).
    tri_base optionally re-bases triangle ids (instanced BLAS leaves).

    hits carries the winning hit's full context — (best_tri, best_d,
    best_code, bnx, bny, bnz[, best_iid]) — so no per-photon code/normal
    gathers are needed after traversal: the packed material code rides in
    the leaf row (chroma_tpu.bvh.wide LEAF_STRIDE layout) and the
    geometric normal is cross(e1, e2) at the winning slot (frame of the
    leaf row: local for instanced BLASes, rotated by the caller). `iid`
    is the lane's current instance register (instanced tables only)."""
    ox, oy, oz = origin_cols
    dx, dy, dz = dir_cols
    from chroma_tpu.bvh.wide import LEAF_STRIDE

    def body(ti, carry):
        best_tri, best_d, best_code, bnx, bny, bnz = carry[:6]
        blk = jax.lax.dynamic_slice_in_dim(gT, LEAF_STRIDE * ti,
                                           LEAF_STRIDE, axis=0)
        v0x, v0y, v0z = blk[0], blk[1], blk[2]
        e1x, e1y, e1z = blk[3], blk[4], blk[5]
        e2x, e2y, e2z = blk[6], blk[7], blk[8]
        tri = jax.lax.bitcast_convert_type(blk[9], jnp.int32)
        code = jax.lax.bitcast_convert_type(blk[10], jnp.int32)
        tri_g = tri if tri_base is None else tri + tri_base
        hx = dy * e2z - dz * e2y
        hy = dz * e2x - dx * e2z
        hz = dx * e2y - dy * e2x
        a = e1x * hx + e1y * hy + e1z * hz
        parallel = jnp.abs(a) <= FLT_EPSILON
        finv = 1.0 / jnp.where(parallel, 1.0, a)
        sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
        u = finv * (sx * hx + sy * hy + sz * hz)
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v = finv * (dx * qx + dy * qy + dz * qz)
        t = finv * (e2x * qx + e2y * qy + e2z * qz)
        ok = (~parallel
              & (u >= -EPSILON) & (u <= 1.0 + EPSILON)
              & (v >= -EPSILON) & (u + v <= 1.0 + EPSILON)
              & (t > EPSILON) & jnp.isfinite(t)
              & (tri >= 0)
              & (tri_g != last_hit)
              & active)
        closer = ok & (t < best_d)
        best_d = jnp.where(closer, t, best_d)
        best_tri = jnp.where(closer, tri_g, best_tri)
        best_code = jnp.where(closer, code, best_code)
        bnx = jnp.where(closer, e1y * e2z - e1z * e2y, bnx)
        bny = jnp.where(closer, e1z * e2x - e1x * e2z, bny)
        bnz = jnp.where(closer, e1x * e2y - e1y * e2x, bnz)
        out = (best_tri, best_d, best_code, bnx, bny, bnz)
        if len(carry) == 7:
            out = out + (jnp.where(closer, iid, carry[6]),)
        return out

    return jax.lax.fori_loop(0, k, body, hits)


def _ray_cols(origin, direction, inv_dir, neg_org, finite):
    "Split the (N,3) ray registers into lane-packed (N,) columns."
    inv = (inv_dir[:, 0], inv_dir[:, 1], inv_dir[:, 2])
    neg = (neg_org[:, 0], neg_org[:, 1], neg_org[:, 2])
    fin = (finite[:, 0], finite[:, 1], finite[:, 2])
    org = (origin[:, 0], origin[:, 1], origin[:, 2])
    dcol = (direction[:, 0], direction[:, 1], direction[:, 2])
    return org, dcol, inv, neg, fin


# The traversal stacks are carried DEPTH-MAJOR, (D, N): with N on the lane
# axis every per-slot op below is a fully packed (N,) vector op, and the
# physical carry is 8x smaller than the lane-padded (N, D) layout —
# measured ~1.5 ms/iteration of loop-carry cost at N=1M for a (N, 9) pair
# vs ~zero for (9, N).

def _stack_get(arr, idx, depth_max):
    "arr[idx[lane], lane] via a static unroll over the (few) slots."
    out = jnp.zeros(arr.shape[1], dtype=arr.dtype)
    for d in range(depth_max):
        out = jnp.where(idx == d, arr[d], out)
    return out


def _stack_set(arr, idx, value, pred, depth_max):
    rows = []
    for d in range(depth_max):
        rows.append(jnp.where(pred & (idx == d), value, arr[d]))
    return jnp.stack(rows, axis=0)


def _top_pending(masks, depth, depth_max):
    "Highest stack slot below `depth` with a pending sibling mask (-1: none)."
    top = jnp.full(masks.shape[1], -1, jnp.int32)
    for d in range(depth_max):
        top = jnp.where((masks[d] != 0) & (d < depth), d, top)
    return top


def _make_body(wide, rays):
    """Build the per-iteration visit function for a ray bundle.
    rays = (origin, direction, inv_dir, neg_org, finite, last_hit)."""
    origin, direction, inv_dir, neg_org, finite, last_hit = rays
    n = origin.shape[0]
    f = wide.fanout
    k = wide.leaf_size
    depth_max = wide.max_depth
    leaf_base = wide.leaf_base
    org_c, dir_c, inv_c, neg_c, fin_c = _ray_cols(origin, direction,
                                                  inv_dir, neg_org, finite)

    def body(state):
        cur, depth, bases, masks, best_tri, best_d, hctx = state
        active = cur >= 0
        at_leaf = active & (cur >= leaf_base)
        internal = active & ~at_leaf

        rows = wide.rows[jnp.where(active, cur, 0)]  # the ONE gather
        gT = rows.T     # (W, N): every table column a lane-packed row

        hitmask, nearest = _child_sweep(gT, f, (org_c, inv_c, neg_c, fin_c),
                                        best_d, internal)
        best_tri, best_d, *hctx = _leaf_sweep(
            gT, k, org_c, dir_c, last_hit, at_leaf,
            (best_tri, best_d) + tuple(hctx))
        hctx = tuple(hctx)

        first_child = jax.lax.bitcast_convert_type(gT[6 * f], jnp.int32)

        # descend into the nearest hit child, saving the sibling group
        # (base + remaining mask) on the stack
        will_descend = internal & (hitmask != 0)
        rest = hitmask & ~(jnp.uint32(1) << nearest.astype(jnp.uint32))
        bases = _stack_set(bases, depth, first_child, will_descend,
                           depth_max)
        masks = _stack_set(masks, depth, rest, will_descend, depth_max)
        cur = jnp.where(will_descend, first_child + nearest, cur)
        depth = jnp.where(will_descend, depth + 1, depth)

        # pop: jump straight to the highest pending sibling group
        need = active & ~will_descend
        top = _top_pending(masks, depth, depth_max)
        found = need & (top >= 0)
        pm = _stack_get(masks, top, depth_max)
        masks = _stack_set(masks, top, pm & (pm - jnp.uint32(1)), found,
                           depth_max)
        cur = jnp.where(found, _stack_get(bases, top, depth_max)
                        + _ctz32(pm),
                        jnp.where(need & (top < 0), -1, cur))
        depth = jnp.where(found, top + 1, depth)

        return cur, depth, bases, masks, best_tri, best_d, hctx

    return body


def _any_active(state):
    return jnp.any(state[0] >= 0)


def _context_result(best_tri, best_d, hctx, iid=None):
    """Assemble the want_context return: (tri, dist, code (N,) u32,
    normal (N,3) unnormalized, iid (N,) i32)."""
    code = jax.lax.bitcast_convert_type(hctx[0], jnp.uint32)
    normal = jnp.stack(hctx[1:4], axis=1)
    if iid is None:
        iid = jnp.zeros_like(best_tri)
    return best_tri, best_d, code, normal, iid


def intersect_mesh_wide(origin, direction, wide, last_hit_triangle=None,
                        mask=None, best_limit=None, two_phase=True,
                        want_context=False, stages=None):
    """Nearest-triangle query against a WideBVH.

    origin/direction: (N,3) f32, direction normalized.
    last_hit_triangle: (N,) i32 excluded triangle (or None).
    mask: (N,) bool lanes to trace (or None).
    best_limit: (N,) f32 optional initial upper bound on the hit distance.

    Returns (triangle (N,) i32, distance (N,) f32) with -1/+inf misses.
    With want_context=True additionally returns the winning hit's packed
    material code ((N,) u32), UNNORMALIZED geometric normal ((N,3), in
    the leaf row's frame — local for instanced tables) and owning
    instance id ((N,) i32, 0 for monolithic tables) — all read from the
    traversal state, no follow-up gathers.
    """
    from chroma_tpu.bvh.wide import InstancedBVH
    if isinstance(wide, InstancedBVH):
        return intersect_mesh_instanced(origin, direction, wide,
                                        last_hit_triangle, mask,
                                        best_limit, two_phase,
                                        want_context, stages)
    n = origin.shape[0]
    depth_max = wide.max_depth

    if last_hit_triangle is None:
        last_hit_triangle = jnp.full(n, -1, jnp.int32)

    inv_dir = safe_inv(direction)                       # (N,3)
    neg_org = -origin * inv_dir
    finite = jnp.isfinite(inv_dir)
    rays = (origin, direction, inv_dir, neg_org, finite,
            last_hit_triangle)

    izero = (origin[:, 0] * 0).astype(jnp.int32)
    fzero = origin[:, 0] * 0

    cur0 = izero                 # start at the root row
    depth0 = izero
    # depth-major stacks; derived from izero so the carry inherits
    # shard_map varying axes
    bases0 = jnp.zeros((depth_max, n), dtype=jnp.int32) + izero[None, :]
    masks0 = jnp.zeros((depth_max, n), dtype=jnp.uint32) \
        + izero[None, :].astype(jnp.uint32)
    best_tri0 = izero - 1
    best_d0 = fzero + jnp.inf
    if best_limit is not None:
        best_d0 = best_limit
    if mask is not None:
        cur0 = jnp.where(mask, cur0, -1)

    hctx0 = (izero, fzero, fzero, fzero)     # code, normal xyz
    state = (cur0, depth0, bases0, masks0, best_tri0, best_d0, hctx0)

    if not two_phase or n < MIN_TWO_PHASE:
        body = _unrolled(_make_body(wide, rays), n)
        state = jax.lax.while_loop(_any_active, body, state)
    else:
        state = _staged_query(_make_body, wide, rays, state,
                              _traversal_stages())
    if want_context:
        return _context_result(state[4], state[5], state[6])
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
    from chroma_tpu.bvh.wide import (TAG_INTERNAL, TAG_LEAF, TAG_INSTANCE,
                                     INST_B0, bounds_cols, fmt_of)

    origin, direction, inv_dir, neg_org, finite, last_hit = rays
    n = origin.shape[0]
    f = inst.fanout
    k = inst.leaf_size
    depth_max = inst.max_depth
    width = inst.rows.shape[1]
    fmt = fmt_of(inst)
    fc_col = INST_B0 + bounds_cols(fmt, f)
    org_c, dir_c, inv_c, neg_c, fin_c = _ray_cols(origin, direction,
                                                  inv_dir, neg_org, finite)
    # the carried local-frame registers are origin+direction ONLY (6
    # lane-packed rows); 1/d, -o/d and finiteness are re-derived per
    # visit in registers — the visit is HBM-stream bound, so trading 9
    # VPU ops for 18 carried row streams wins
    world_loc = org_c + dir_c

    from chroma_tpu.ops import visit_kernel
    # int32 bitmask arithmetic in the kernel wraps two's-complement, so
    # fanouts up to 32 (full-word masks) are supported
    if visit_kernel.enabled(n) and f <= 32:
        return _make_body_inst_pallas(inst, rays, world_loc)

    def body(state):
        (cur, depth, bases, masks, best_tri, best_d, loc, d_inst,
         tbase, iid, hctx) = state
        # loc: the local-frame ray registers as 6 lane-packed (N,)
        # vectors (ox,oy,oz, dx,dy,dz); derived registers recomputed
        active = cur >= 0

        rows = inst.rows[jnp.where(active, cur, 0)]  # the ONE gather
        gT = rows.T     # (W, N): every table column a lane-packed row
        tag = jax.lax.bitcast_convert_type(gT[width - 1], jnp.int32)
        internal = active & (tag == TAG_INTERNAL)
        at_leaf = active & (tag == TAG_LEAF)
        is_inst = active & (tag == TAG_INSTANCE)

        # instance entry: rotate the WORLD ray into the instance frame
        # (column form: nine (N,) fma chains instead of an (N,3,3)
        # einsum). The entered registers feed THIS visit's sweep — the
        # instance row embeds its BLAS root's child bounds (bvh.wide
        # v4 layout), so entry + root sweep happen in one visit.
        px = org_c[0] - gT[9]
        py = org_c[1] - gT[10]
        pz = org_c[2] - gT[11]
        o_li = (gT[0] * px + gT[1] * py + gT[2] * pz,
                gT[3] * px + gT[4] * py + gT[5] * pz,
                gT[6] * px + gT[7] * py + gT[8] * pz)
        d_li = (gT[0] * dir_c[0] + gT[1] * dir_c[1] + gT[2] * dir_c[2],
                gT[3] * dir_c[0] + gT[4] * dir_c[1] + gT[5] * dir_c[2],
                gT[6] * dir_c[0] + gT[7] * dir_c[1] + gT[8] * dir_c[2])
        entered = o_li + d_li
        sweep_loc = tuple(jnp.where(is_inst, e, l)
                          for e, l in zip(entered, loc))

        o_cc, d_cc = sweep_loc[0:3], sweep_loc[3:6]
        # rotation into the instance frame can mint NEW exact zeros, so
        # the nudge applies to the frame-local direction here
        inv_cc = tuple(safe_inv(d) for d in d_cc)
        neg_cc = tuple(-o * i for o, i in zip(o_cc, inv_cc))

        sweeping = internal | is_inst
        hitmask, nearest = _child_sweep(gT, f,
                                        (o_cc, inv_cc, neg_cc, None),
                                        best_d, sweeping,
                                        fmt=fmt, b0=INST_B0)
        hitmask = jax.lax.bitcast_convert_type(hitmask, jnp.int32)
        best_tri, best_d, *hctx = _leaf_sweep(
            gT, k, o_cc, d_cc, last_hit, at_leaf,
            (best_tri, best_d) + tuple(hctx), tri_base=tbase, iid=iid)
        hctx = tuple(hctx)

        first_child = jax.lax.bitcast_convert_type(gT[fc_col], jnp.int32)

        # descend to the nearest hit child (masks are i32 with
        # two's-complement wrap, matching the Pallas kernel's state
        # layout — no bitcast at the kernel boundary). Instance-frame
        # registers commit only when the entry actually descends; a
        # culled entry (no child hit) pops with its world registers.
        will = sweeping & (hitmask != 0)
        ei = is_inst & will
        loc = tuple(jnp.where(ei, e, l) for e, l in zip(entered, loc))
        d_inst = jnp.where(ei, depth, d_inst)
        tbase = jnp.where(ei,
                          jax.lax.bitcast_convert_type(gT[12], jnp.int32),
                          tbase)
        iid = jnp.where(ei,
                        jax.lax.bitcast_convert_type(gT[13], jnp.int32),
                        iid)
        rest = jnp.where(will,
                         hitmask & ~(jnp.int32(1) << nearest),
                         jnp.int32(0))
        bases = _stack_set(bases, depth, first_child, will, depth_max)
        masks = _stack_set(masks, depth, rest, will, depth_max)
        cur = jnp.where(will, first_child + nearest, cur)
        depth = jnp.where(will, depth + 1, depth)

        # pop: jump straight to the highest pending sibling group
        need = active & ~will
        top = _top_pending(masks, depth, depth_max)
        found = need & (top >= 0)
        pm = _stack_get(masks, top, depth_max)
        masks = _stack_set(masks, top, pm & (pm - 1), found, depth_max)
        cur = jnp.where(found, _stack_get(bases, top, depth_max)
                        + _ctz32_i32(pm),
                        jnp.where(need & (top < 0), -1, cur))
        depth = jnp.where(found, top + 1, depth)

        # leaving the instance: restore the world-frame registers
        leaving = (d_inst != IBIG) & (depth <= d_inst)
        loc = tuple(jnp.where(leaving, w, l)
                    for w, l in zip(world_loc, loc))
        tbase = jnp.where(leaving, 0, tbase)
        d_inst = jnp.where(leaving, IBIG, d_inst)

        return (cur, depth, bases, masks, best_tri, best_d, loc, d_inst,
                tbase, iid, hctx)

    return body


def _make_body_inst_pallas(inst, rays, world_loc):
    """Pallas-backed visit body: the row gather stays XLA (Mosaic has no
    per-lane random gather over a multi-MB table); the fetched rows enter
    the kernel UNTRANSPOSED as (TB, 128, W) blocks and are transposed
    in-VMEM — measured ~1.3 ms/visit cheaper at 1M lanes than the XLA
    (N, W) -> (W, N) HBM transpose. The whole per-visit computation runs
    as one fused Mosaic kernel (chroma_tpu.ops.visit_kernel). State
    pytree matches _make_body_inst."""
    from chroma_tpu.bvh.wide import (TAG_INTERNAL, TAG_LEAF, TAG_INSTANCE,
                                     INST_B0, fmt_of)
    from chroma_tpu.ops.visit_kernel import visit_inst

    origin, direction, inv_dir, neg_org, finite, last_hit = rays
    n = origin.shape[0]
    nb = n // 128
    f = inst.fanout
    k = inst.leaf_size
    depth_max = inst.max_depth
    width = inst.rows.shape[1]
    tags = (TAG_INTERNAL, TAG_LEAF, TAG_INSTANCE, IBIG)

    from chroma_tpu.ops.visit_kernel import interpret_mode
    interp = interpret_mode()

    rays_pack = jnp.stack(world_loc).reshape(6, nb, 128)
    last_t = last_hit.reshape(nb, 128)

    def r2(a):
        return a.reshape(nb, 128)

    def body(state):
        # state layout matches the kernel exactly (i32 masks, 6-row
        # origin+direction ray registers), so every per-visit conversion
        # below is a FREE row-major reshape — no cast materializes a
        # buffer
        (cur, depth, bases, masks, best_tri, best_d, loc, d_inst,
         tbase, iid, hctx) = state
        active = cur >= 0
        rows = inst.rows[jnp.where(active, cur, 0)]  # the ONE gather
        rows_t = rows.reshape(nb, 128, width)        # free reshape

        loc_t = tuple(r2(l) for l in loc)
        hctx_t = (r2(hctx[0]), r2(hctx[1]), r2(hctx[2]), r2(hctx[3]),
                  r2(hctx[4]))
        (cur, depth, best_tri, d_inst, tbase, iid_t, bases_t, masks_t,
         bd_t, hctx_t, loc_t) = visit_inst(
            rows_t, r2(cur), r2(depth), r2(best_tri), r2(d_inst),
            r2(tbase), r2(iid),
            bases.reshape(depth_max, nb, 128),
            masks.reshape(depth_max, nb, 128),
            r2(best_d), hctx_t, loc_t, rays_pack, last_t,
            width, f, k, depth_max, tags, interpret=interp,
            fmt=fmt_of(inst), b0=INST_B0)

        loc_out = tuple(loc_t[i].reshape(n) for i in range(6))
        hctx_out = tuple(h.reshape(n) for h in hctx_t)
        return (cur.reshape(n), depth.reshape(n),
                bases_t.reshape(depth_max, n),
                masks_t.reshape(depth_max, n),
                best_tri.reshape(n), bd_t.reshape(n), loc_out,
                d_inst.reshape(n), tbase.reshape(n), iid_t.reshape(n),
                hctx_out)

    return body


def _split_lanes(tree, n, c):
    "Split every leaf's lane axis into c equal contiguous groups."
    per = n // c
    return [jax.tree_util.tree_map(
        lambda a, i=i: (a[i * per:(i + 1) * per]
                        if _lane_axis(a, n) == 0
                        else a[:, i * per:(i + 1) * per]), tree)
        for i in range(c)]


def _concat_lanes(trees, per):
    "Inverse of _split_lanes (`per` = lanes per group)."
    return jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=_lane_axis(xs[0], per)),
        *trees)


def _run_chained(inst, rays, state, limit=None, unroll=None):
    """Run the instanced traversal loop — bounded to `limit` visits or to
    completion — with the batch split into _chains_for(n) INDEPENDENT
    lane groups stepping in lockstep inside one while_loop. Each group
    has its own row gather and visit-kernel launch; since the groups
    share no data, the XLA scheduler overlaps one group's latency-bound
    gather with the others' kernels (measured: two interleaved chains
    run at 0.32x the serial cost of two). Bitwise identical to the
    single-chain loop. Returns the final state (same lane order)."""
    n = rays[0].shape[0]
    c = _chains_for(n)
    unroll = _unroll_for(n) if unroll is None else unroll

    if c == 1:
        body = _unrolled(_make_body_inst(inst, rays), n, unroll)
        if limit is None:
            return jax.lax.while_loop(_any_active, body, state)

        def cond1(carry):
            i, st = carry
            return (i < limit) & _any_active(st)

        def body1(carry):
            i, st = carry
            return i + unroll, body(st)

        return jax.lax.while_loop(cond1, body1, (0, state))[1]

    rays_h = _split_lanes(rays, n, c)
    state_h = tuple(_split_lanes(state, n, c))
    bodies = [_unrolled(_make_body_inst(inst, r), n // c, unroll)
              for r in rays_h]

    def any_h(sts):
        alive = sts[0][0] >= 0
        out = jnp.any(alive)
        for st in sts[1:]:
            out = out | jnp.any(st[0] >= 0)
        return out

    def bodyc(carry):
        i, sts = carry
        return i + unroll, tuple(b(st) for b, st in zip(bodies, sts))

    if limit is None:
        def condc(carry):
            return any_h(carry[1])
    else:
        def condc(carry):
            i, sts = carry
            return (i < limit) & any_h(sts)

    _, state_h = jax.lax.while_loop(condc, bodyc, (0, state_h))
    return _concat_lanes(state_h, n // c)


def _init_inst(inst, origin, direction, last_hit_triangle, mask,
               best_limit):
    "Fresh root-descent (rays, state) for the instanced traversal."
    n = origin.shape[0]
    depth_max = inst.max_depth

    if last_hit_triangle is None:
        last_hit_triangle = jnp.full(n, -1, jnp.int32)

    inv_dir = safe_inv(direction)
    neg_org = -origin * inv_dir
    finite = jnp.isfinite(inv_dir)
    rays = (origin, direction, inv_dir, neg_org, finite,
            last_hit_triangle)

    izero = (origin[:, 0] * 0).astype(jnp.int32)
    fzero = origin[:, 0] * 0

    cur0 = izero
    depth0 = izero
    bases0 = jnp.zeros((depth_max, n), dtype=jnp.int32) + izero[None, :]
    # masks carried i32 (kernel state layout; see _ctz32_i32)
    masks0 = jnp.zeros((depth_max, n), dtype=jnp.int32) + izero[None, :]
    best_tri0 = izero - 1
    best_d0 = fzero + jnp.inf
    if best_limit is not None:
        best_d0 = best_limit
    if mask is not None:
        cur0 = jnp.where(mask, cur0, -1)

    cols = _ray_cols(origin, direction, inv_dir, neg_org, finite)
    # origin+direction only (kernel state layout; derived regs in-kernel)
    loc0 = cols[0] + cols[1]
    hctx0 = (izero, fzero, fzero, fzero, izero)   # code, normal, iid
    state = (cur0, depth0, bases0, masks0, best_tri0, best_d0,
             loc0, izero + IBIG, izero, izero, hctx0)
    return rays, state


def _staged_inst(inst, rays, state, stages):
    """Instanced traversal with CARRIED-STATE tail compaction.

    The lockstep loop pays the MAX visit count over the batch, but the
    distribution is heavy-tailed (headline detector, mid-propagation
    steps: mean 24-36 visits, p99 45-76, max 140-205 — a 4-6x waste at
    full width). Each stage runs the loop for a bounded number of
    visits, then front-packs the still-walking minority — rays, stacks,
    local-frame registers, everything — into a static 1/div prefix
    slice and continues there. The whole move is ONE fat-row gather of
    a stack-major-packed (N, C) matrix (~4 ns/row) plus seven result
    scatters on the way back; per-leaf 1-D moves measure 8-15 ns/row
    PER ARRAY and would cost more than the tail itself.

    The alternative RESTART staging (re-walk from the root with carried
    best_d, no state movement) measured 2.1x WORSE end-to-end at
    headline scale: the tail lanes are exactly the ones with weak
    best_d bounds, so the pruned re-walk costs nearly a full walk.

    Analog of the reference's persistent-threads work queue
    (reference: chroma/cuda/mesh.h:45-126 walks per-thread and pays no
    convergence tax; a vector machine has to compact instead)."""
    n = rays[0].shape[0]

    if not stages:
        return _run_chained(inst, rays, state)

    visits, div = stages[0]

    state = _run_chained(inst, rays, state, limit=visits)

    m = n // div
    if m < MIN_TWO_PHASE // COMPACT_DIVISOR or m % 256:
        return _run_chained(inst, rays, state)

    origin, direction, _inv, _neg, _fin, last_hit = rays

    def boundary(state):
        cur = state[0]
        _, perm = _compact_perm(cur >= 0)
        sel = perm[:m]

        # one packed fat-row move for rays + full traversal state
        # (derived ray registers are recomputed at width m, not moved)
        moved = _take_lanes((origin, direction, last_hit, state),
                            sel, n)
        o_s, d_s, last_s, state_s = moved
        inv_s = safe_inv(d_s)
        rays_s = (o_s, d_s, inv_s, -o_s * inv_s, jnp.isfinite(inv_s),
                  last_s)
        state_s = _staged_inst(inst, rays_s, state_s, stages[1:])

        # merge: only the RESULT registers come back (the moved lanes
        # are done; sel is a permutation slice so indices are unique —
        # lanes moved while already finished rewrite their registers
        # unchanged)
        best_tri = state[4].at[sel].set(state_s[4])
        best_d = state[5].at[sel].set(state_s[5])
        hctx_m = tuple(h.at[sel].set(hs)
                       for h, hs in zip(state[10], state_s[10]))
        cur = cur.at[sel].set(-1)
        return (cur, state[1], state[2], state[3], best_tri, best_d,
                state[6], state[7], state[8], state[9], hctx_m)

    # traversals whose visit distribution has no deep tail finish inside
    # the bounded loop; the cond skips the whole boundary (pack, gather
    # and sub-query) at runtime in that case, so generous stage specs
    # cost nothing where they don't pay
    state = jax.lax.cond(_any_active(state), boundary, lambda s: s, state)

    # overflow lanes (survivors beyond the slice — rare by construction):
    # running them at FULL width was the catastrophic path that forced
    # STAGE_MARGIN=2 on the spec picker (a too-tight spec measured
    # 4-20x slower). Instead, when any lane overflows, front-pack the
    # overflow into the same m-lane slice and finish there (the
    # lax.cond makes this free when absent); the final full-width loop
    # only serves > m simultaneous overflow lanes (~never).
    def overflow(state):
        cur = state[0]
        _, perm = _compact_perm(cur >= 0)
        sel = perm[:m]
        moved = _take_lanes((origin, direction, last_hit, state), sel, n)
        o_s, d_s, last_s, state_s = moved
        inv_s = safe_inv(d_s)
        rays_s = (o_s, d_s, inv_s, -o_s * inv_s, jnp.isfinite(inv_s),
                  last_s)
        state_s = _run_chained(inst, rays_s, state_s)
        best_tri = state[4].at[sel].set(state_s[4])
        best_d = state[5].at[sel].set(state_s[5])
        hctx_m = tuple(h.at[sel].set(hs)
                       for h, hs in zip(state[10], state_s[10]))
        cur = cur.at[sel].set(-1)
        return (cur, state[1], state[2], state[3], best_tri, best_d,
                state[6], state[7], state[8], state[9], hctx_m)

    state = jax.lax.cond(_any_active(state), overflow, lambda s: s, state)
    return _run_chained(inst, rays, state)


def intersect_mesh_instanced(origin, direction, inst,
                             last_hit_triangle=None, mask=None,
                             best_limit=None, two_phase=True,
                             want_context=False, stages=None):
    """Nearest-triangle query against an InstancedBVH. Same contract as
    intersect_mesh_wide; returned triangle ids index the flattened soup.
    The want_context normal is in the winning instance's LOCAL frame.

    `stages`: carried-state staging spec ((visits, divisor), ...) —
    explicit (probe-tuned by chroma_tpu.ops.propagate) or, when None,
    the CHROMA_TRAV_STAGES env spec gated to widths where per-iteration
    cost still scales with lane count (below ~64k lanes the while_loop
    iteration floor dominates and compaction cannot reduce the
    iteration count — the tail lane still walks)."""
    n = origin.shape[0]
    rays, state = _init_inst(inst, origin, direction, last_hit_triangle,
                             mask, best_limit)

    if stages is None:
        stages = _traversal_stages() if (two_phase
                                         and n >= _stage_min()) else ()
    if not two_phase or n < MIN_TWO_PHASE or not stages:
        state = _run_chained(inst, rays, state)
    else:
        state = _staged_inst(inst, rays, state, stages)
    if want_context:
        return _context_result(state[4], state[5], state[10][:4],
                               state[10][4])
    return state[4], state[5]


def traversal_visits(origin, direction, wide, last_hit_triangle=None,
                     mask=None, best_limit=None):
    """Per-lane traversal visit counts (diagnostic, not the hot path).

    Runs the single-phase lockstep loop carrying a visit counter; returns
    (visits (N,) i32, triangle (N,) i32, distance (N,) f32). The analog of
    the reference's device profiling counters
    (reference: cuda/profile.h, gpu/profiler.py device_fetch)."""
    from chroma_tpu.bvh.wide import InstancedBVH
    n = origin.shape[0]
    if last_hit_triangle is None:
        last_hit_triangle = jnp.full(n, -1, jnp.int32)
    inv_dir = safe_inv(direction)
    neg_org = -origin * inv_dir
    finite = jnp.isfinite(inv_dir)
    rays = (origin, direction, inv_dir, neg_org, finite,
            last_hit_triangle)

    izero = (origin[:, 0] * 0).astype(jnp.int32)
    fzero = origin[:, 0] * 0
    depth_max = wide.max_depth
    cur0 = izero if mask is None else jnp.where(mask, izero, -1)
    bases0 = jnp.zeros((depth_max, n), dtype=jnp.int32)
    best_d0 = fzero + jnp.inf if best_limit is None else best_limit
    if isinstance(wide, InstancedBVH):
        # instanced state layout: i32 masks, 6-row ray registers
        masks0 = jnp.zeros((depth_max, n), dtype=jnp.int32)
        cols = _ray_cols(origin, direction, inv_dir, neg_org, finite)
        loc0 = cols[0] + cols[1]
        state = (cur0, izero, bases0, masks0, izero - 1, best_d0,
                 loc0, izero + IBIG, izero, izero,
                 (izero, fzero, fzero, fzero, izero))
        body = _make_body_inst(wide, rays)
    else:
        masks0 = jnp.zeros((depth_max, n), dtype=jnp.uint32)
        state = (cur0, izero, bases0, masks0, izero - 1, best_d0,
                 (izero, fzero, fzero, fzero))
        body = _make_body(wide, rays)

    def counted_body(carry):
        visits, st = carry
        return visits + (st[0] >= 0).astype(jnp.int32), body(st)

    def counted_cond(carry):
        return _any_active(carry[1])

    visits, state = jax.lax.while_loop(counted_cond, counted_body,
                                       (izero, state))
    return visits, state[4], state[5]


def _traversal_stages():
    """Compaction pyramid: (bounded iterations, width divisor) per stage.
    Tunable via CHROMA_TRAV_STAGES='14:2,8:4'; default NO staging.

    Measured on v5e (round 3): with per-leaf lane movement a stage
    boundary cost ~0.5 s at 1M lanes and staging was a ~2.7x loss; the
    packed fat-row boundaries (_pack_lanes) brought that to ~10-30 ms,
    making staging cost-NEUTRAL (±1% end-to-end, e.g. '12:4,12:4' at
    2.02M vs 2.00M photons/s unstaged on the quick detector) — the
    step-level fused compaction schedule already absorbs the traversal
    tail, so the default stays unstaged."""
    spec = os.environ.get('CHROMA_TRAV_STAGES')
    if spec:
        if spec in ('none', 'off', '0'):
            return ()
        return tuple(tuple(int(x) for x in part.split(':'))
                     for part in spec.split(','))
    return ()


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


def _lane_axis(a, n):
    """Which axis of a state/ray leaf is the lane axis. Stacks are carried
    depth-major (D, N); everything else is lane-major."""
    return 0 if a.shape[0] == n else 1


# Lane movement at stage boundaries goes through ONE packed (N, C) f32
# matrix: per-leaf gathers are latency-bound at ~14-23 ns/row per LEAF
# (independent of row width and index locality), and the traversal state
# has ~45-60 leaf columns — moving them individually cost ~0.5 s at 1M
# lanes (the round-3 "staging is a 2.7x loss" measurement), while the
# packed relayout + one fat-row gather costs ~10-30 ms.

def _pack_lanes(tree, n):
    """Tree -> ((N, C) f32 matrix, leaf prototypes, treedef).

    Assembled MAJOR-axis first — (N,) leaves reshape to (1, N) for free,
    (D, N) stacks concatenate as-is — then transposed ONCE. The previous
    minor-axis concat of (N, 1) slices materialized lane-padded (N, 128)
    tiles per leaf under rematerialization inside step loops: 512 MB per
    leaf at 1M lanes, an instant OOM at headline scale."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    blocks = []
    for a in leaves:
        if a.ndim == 1:
            b = a.reshape(1, n)
        elif _lane_axis(a, n) == 0:
            b = a.T
        else:
            b = a
        if b.dtype == jnp.bool_:
            b = b.astype(jnp.float32)
        elif b.dtype != jnp.float32:
            b = jax.lax.bitcast_convert_type(b, jnp.float32)
        blocks.append(b)
    return jnp.concatenate(blocks, axis=0).T, leaves, treedef


def _unpack_lanes(mat, leaves, treedef, n):
    "Inverse of _pack_lanes at a (possibly smaller) lane count."
    matT = mat.T
    out = []
    c = 0
    for a in leaves:
        w = 1 if a.ndim == 1 else a.shape[1 - _lane_axis(a, n)]
        sl = matT[c:c + w]
        c += w
        if a.dtype == jnp.bool_:
            sl = sl > 0.5
        elif a.dtype != jnp.float32:
            sl = jax.lax.bitcast_convert_type(sl, a.dtype)
        if a.ndim == 1:
            sl = sl[0]
        elif _lane_axis(a, n) == 0:
            sl = sl.T
        out.append(sl)
    return jax.tree_util.tree_unflatten(treedef, out)


def _take_lanes(tree, idx, n):
    "Gather lanes of every leaf, moved as one packed fat-row matrix."
    mat, leaves, treedef = _pack_lanes(tree, n)
    return _unpack_lanes(mat[idx], leaves, treedef, n)


def _slice_lanes(tree, m, n):
    "First m lanes of every leaf."
    return jax.tree_util.tree_map(
        lambda a: a[:m] if _lane_axis(a, n) == 0 else a[:, :m], tree)


def _update_lanes(tree, part, n):
    "Write the m-lane `part` back into the first m lanes of `tree`."
    return jax.tree_util.tree_map(
        lambda full, p: jax.lax.dynamic_update_slice_in_dim(
            full, p, 0, axis=_lane_axis(full, n)),
        tree, part)


def _staged_query(body_factory, accel, rays, state, stages):
    """Run a traversal to completion with a pyramid of bounded lockstep
    phases, compacting survivors into a static prefix slice between
    phases (all device-side). Returns the final state, lane-aligned with
    the inputs."""
    n = rays[0].shape[0]
    if not stages:
        body = _unrolled(body_factory(accel, rays), n)
        return jax.lax.while_loop(_any_active, body, state)

    iters, div = stages[0]
    unroll = _unroll_for(n)
    body = _unrolled(body_factory(accel, rays), n, unroll)

    def cond1(carry):
        i, st = carry
        return (i < iters) & _any_active(st)

    def body1(carry):
        i, st = carry
        return i + unroll, body(st)

    _, state = jax.lax.while_loop(cond1, body1, (0, state))

    m = n // div
    if m < MIN_TWO_PHASE // COMPACT_DIVISOR:
        body = _unrolled(body_factory(accel, rays), n)
        return jax.lax.while_loop(_any_active, body, state)

    dest, perm = _compact_perm(state[0] >= 0)

    # one packed gather moves rays and state together
    rays_p, state_p = _take_lanes((rays, state), perm, n)

    rays_s = _slice_lanes(rays_p, m, n)
    state_s = _slice_lanes(state_p, m, n)

    state_s = _staged_query(body_factory, accel, rays_s, state_s,
                            stages[1:])

    state_p = _update_lanes(state_p, state_s, n)

    # overflow fallback: survivors beyond the slice (rare) finish at
    # this stage's full width
    body_p = _unrolled(body_factory(accel, rays_p), n)
    state_p = jax.lax.while_loop(_any_active, body_p, state_p)

    # un-permute back to the caller's lane order (also a gather)
    return _take_lanes(state_p, dest, n)
