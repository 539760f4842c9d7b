"""Pallas TPU kernel for one wide-BVH traversal visit.

The pure-XLA visit body (chroma_tpu.ops.mesh_wide._make_body_inst) lowers
to ~hundreds of separate (N,) vector ops, each streaming its operands
through HBM — measured ~20 ms per visit at 1M lanes, ~10x the cost of the
row gather itself. This kernel runs the ENTIRE visit (child slab sweep,
Moller-Trumbore leaf sweep, instance-frame rotation, stack push/pop) as
one fused Mosaic program over (TB, 128)-lane tiles: operands are read
from HBM once, all intermediates live in VMEM/vregs.

The row gather and its transpose stay in XLA (Mosaic has no efficient
per-lane random gather over a multi-MB table); the traversal while_loop
alternates gather -> this kernel.

Layout contract: N must be a multiple of TB*128; every per-lane array is
reshaped to (..., N // 128, 128) outside. Booleans travel as f32 0/1.
"""
from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPSILON = 1e-6
FLT_EPSILON = 1.19209290e-07

# sublane-tile rows per grid step (TB*128 lanes). Bigger tiles amortize
# the per-grid-step pipeline overhead; VMEM per step is ~(W + ~40 state
# rows) * TB * 128 * 4 B * 2 (double buffering) — TB=32 uses ~9 MB.
TB = int(os.environ.get('CHROMA_PALLAS_TB', '32'))

# enabled on TPU-like backends unless overridden; tests on CPU exercise it
# through interpret mode via the correctness test
PALLAS_VISIT = os.environ.get('CHROMA_PALLAS_VISIT', 'auto')


def tile_rows(n):
    """Sublane-tile rows for an n-lane batch: the largest tb <= TB that
    divides n/128 AND is a multiple of 8 (Mosaic requires the
    second-minor block dim divisible by 8 unless the block spans the
    whole array). Odd row counts (non-power-of-two restart-staging
    slices) fall back to ONE whole-array block — enabled() rejects that
    fallback when it would exceed VMEM. Keeps the kernel enabled for the
    small compaction buckets the fused driver spends the survival TAIL
    in (a 2k-lane bucket would otherwise fall back to the
    ~200-HBM-stream jnp body for ~50 steps x ~30 visits)."""
    nb = max(n // 128, 1)
    tb = min(TB, nb)
    while tb >= 8 and nb % tb != 0:
        tb //= 2
    if tb >= 8:
        return tb
    return nb   # single whole-array block


def enabled(n):
    if PALLAS_VISIT == '0':
        return False
    if n % 128 != 0:
        return False
    nb = n // 128
    tb = tile_rows(n)
    # whole-array fallback blocks only fit VMEM while small
    if tb == nb and (tb % 8 != 0 or nb > TB) and nb > 128:
        return False
    if nb % tb != 0:
        return False
    if PALLAS_VISIT in ('1', 'force'):
        return True
    try:
        plat = jax.default_backend()
    except Exception:
        return False
    return plat in ('tpu', 'axon')


def interpret_mode():
    "Interpret the kernel off-TPU (CHROMA_PALLAS_VISIT=force on CPU tests)."
    try:
        return jax.default_backend() not in ('tpu', 'axon')
    except Exception:
        return True


def _bitcast_i32(x):
    return pltpu.bitcast(x, jnp.int32)


def _bitcast_f32(x):
    return pltpu.bitcast(x, jnp.float32)


def _ctz32(m):
    """Index of the lowest set bit of an int32 bitmask (32 for m == 0),
    via the float-exponent trick (no popcount needed; isolated low bits
    are exact powers of two up to bit 31 in f32). The & 0xFF drops the
    sign bits an arithmetic shift drags in when bit 31 is set (fanout-32
    masks use the full word)."""
    low = m & (-m)
    e = ((_bitcast_i32(low.astype(jnp.float32)) >> 23) & 0xFF) - 127
    return jnp.where(m == 0, 32, e)


def _visit_kernel_inst(*refs, W, F, K, D, TAG_INTERNAL, TAG_LEAF,
                       TAG_INSTANCE, IBIG, FMT='f32', B0=0):
    """One traversal visit for a (TB, 128) tile of lanes (instanced
    table). refs: rows (TB, 128, W), cur, depth, best_tri, d_inst, tbase,
    iid, bases, masks, bd, bcode, bn x3, biid, loc x6, rays, last |
    outputs cur, depth, best_tri, d_inst, tbase, iid, bases, masks, bd,
    bcode, bn x3, biid, loc x6 (same order).

    The fetched rows arrive UNTRANSPOSED and are transposed here, in
    VMEM/vregs — measured ~1.3 ms/visit cheaper at 1M lanes than the XLA
    HBM transpose the previous layout paid per visit.

    The kernel is HBM-STREAM bound (~200 (N,) state rows in+out per
    visit), so the carried ray registers hold only origin+direction (6
    rows); 1/d, -o/d and the finite flags are re-derived in vregs each
    visit — 9 fused VPU ops versus 18 HBM row streams."""
    (rows_ref, cur_ref, depth_ref, btri_ref, dinst_ref, tbase_ref,
     iid_ref, bases_ref, masks_ref, bd_ref, bcode_ref, bnx_ref, bny_ref,
     bnz_ref, biid_ref) = refs[0:15]
    loc_refs = refs[15:21]
    rays_ref, last_ref = refs[21], refs[22]
    (ocur_ref, odepth_ref, obtri_ref, odinst_ref, otbase_ref, oiid_ref,
     obases_ref, omasks_ref, obd_ref, obcode_ref, obnx_ref, obny_ref,
     obnz_ref, obiid_ref) = refs[23:37]
    oloc_refs = refs[37:43]

    gT = jnp.transpose(rows_ref[:], (2, 0, 1))   # in-VMEM transpose

    cur = cur_ref[:]
    depth = depth_ref[:]
    best_tri = btri_ref[:]
    d_inst = dinst_ref[:]
    tbase = tbase_ref[:]
    iid = iid_ref[:]
    best_d = bd_ref[:]
    best_code = bcode_ref[:]
    bnx = bnx_ref[:]
    bny = bny_ref[:]
    bnz = bnz_ref[:]
    best_iid = biid_ref[:]
    last_hit = last_ref[:]

    active = cur >= 0
    tag = _bitcast_i32(gT[W - 1])
    internal = active & (tag == TAG_INTERNAL)
    at_leaf = active & (tag == TAG_LEAF)
    is_inst = active & (tag == TAG_INSTANCE)

    loc = [loc_refs[i][:] for i in range(6)]

    # --- instance entry: rotate the world ray into the instance frame
    # (v4 layout: the instance row EMBEDS its BLAS root's child bounds,
    # so entry and root sweep happen in THIS visit — one gather+kernel
    # launch per instance entry instead of two) ---
    rays = [rays_ref[i] for i in range(6)]
    w_org, w_dir = rays[0:3], rays[3:6]
    px = w_org[0] - gT[9]
    py = w_org[1] - gT[10]
    pz = w_org[2] - gT[11]
    o_li = (gT[0] * px + gT[1] * py + gT[2] * pz,
            gT[3] * px + gT[4] * py + gT[5] * pz,
            gT[6] * px + gT[7] * py + gT[8] * pz)
    d_li = (gT[0] * w_dir[0] + gT[1] * w_dir[1]
            + gT[2] * w_dir[2],
            gT[3] * w_dir[0] + gT[4] * w_dir[1]
            + gT[5] * w_dir[2],
            gT[6] * w_dir[0] + gT[7] * w_dir[1]
            + gT[8] * w_dir[2])
    entered = o_li + d_li
    sweep_loc = [jnp.where(is_inst, e, l) for e, l in zip(entered, loc)]
    o_cc, d_cc = sweep_loc[0:3], sweep_loc[3:6]
    # derived ray registers live in vregs, never in HBM. Exactly-zero
    # direction components (the world sampler mints ~1e-6/photon and
    # the instance rotation can mint new ones) are nudged to 1e-25 so
    # the inverse is finite on every axis — the slab sweep then needs
    # no per-child containment fallback (see ops.mesh_wide.safe_inv)
    inv_cc = [1.0 / jnp.where(d == 0.0, jnp.float32(1e-25), d)
              for d in d_cc]
    neg_cc = [-o * i for o, i in zip(o_cc, inv_cc)]

    # --- child slab sweep (unrolled; everything stays in vregs). The
    # nudged inverse is finite on every axis (see inv_cc above), so the
    # sweep is the PLAIN slab arithmetic: no zero-direction containment
    # fallback (it cost ~18 ops per child, ~45% of the sweep). ---
    hitmask = jnp.zeros_like(cur)
    nearest = jnp.zeros_like(cur)
    tnear = jnp.full_like(best_d, jnp.inf)
    PW = F // 2
    QW = F // 4
    sweeping = internal | is_inst

    if FMT == 'q8':
        # per-VISIT hoisted q8 affine: t = q * (scale*inv) + (anchor*inv
        # + neg_org) — one fma per bound per child after the byte
        # extract, same arithmetic depth as bf16.
        q_anc = [gT[B0 + ax] for ax in range(3)]
        q_scl = [gT[B0 + 3 + ax] for ax in range(3)]
        q_S = [s * i for s, i in zip(q_scl, inv_cc)]
        q_A = [a * i + ng for a, i, ng in zip(q_anc, inv_cc, neg_cc)]

    def _bound(g, c):
        """Bound group g (0..5 = lo_x..hi_z) of child c, at the B0
        offset. bf16 rows hold pairs: child c in the low (c < F/2) or
        high half of word c mod F/2 (bvh.wide._pack_bounds_words), empty
        slots decode NaN."""
        if FMT == 'bf16':
            u = _bitcast_i32(gT[B0 + g * PW + (c % PW)])
            if c < PW:
                return _bitcast_f32(u << 16)
            return _bitcast_f32(u & jnp.int32(-65536))
        return gT[B0 + g * F + c]

    def _qbyte(g, c):
        "q8 byte (as f32) of bound group g, child c."
        u = _bitcast_i32(gT[B0 + 6 + g * QW + (c >> 2)])
        return (((u >> ((c & 3) * 8)) & 0xFF)).astype(jnp.float32)

    for c in range(F):
        q_ok = None
        if FMT == 'q8':
            qb = [_qbyte(g, c) for g in range(6)]
            q_ok = qb[0] <= qb[3]
            t0x = qb[0] * q_S[0] + q_A[0]
            t0y = qb[1] * q_S[1] + q_A[1]
            t0z = qb[2] * q_S[2] + q_A[2]
            t1x = qb[3] * q_S[0] + q_A[0]
            t1y = qb[4] * q_S[1] + q_A[1]
            t1z = qb[5] * q_S[2] + q_A[2]
        else:
            lox, loy, loz = _bound(0, c), _bound(1, c), _bound(2, c)
            hix, hiy, hiz = _bound(3, c), _bound(4, c), _bound(5, c)
            t0x = lox * inv_cc[0] + neg_cc[0]
            t1x = hix * inv_cc[0] + neg_cc[0]
            t0y = loy * inv_cc[1] + neg_cc[1]
            t1y = hiy * inv_cc[1] + neg_cc[1]
            t0z = loz * inv_cc[2] + neg_cc[2]
            t1z = hiz * inv_cc[2] + neg_cc[2]
        smx = jnp.minimum(t0x, t1x)
        bgx = jnp.maximum(t0x, t1x)
        smy = jnp.minimum(t0y, t1y)
        bgy = jnp.maximum(t0y, t1y)
        smz = jnp.minimum(t0z, t1z)
        bgz = jnp.maximum(t0z, t1z)
        tmin = jnp.maximum(jnp.maximum(smx, smy), jnp.maximum(smz, 0.0))
        tmax = jnp.minimum(jnp.minimum(bgx, bgy), bgz)
        # padding children carry NaN bounds (f32/bf16): NaN propagates
        # through min/max and the comparisons below are all False
        hit = (tmin <= tmax) & (tmin <= best_d) & sweeping
        if q_ok is not None:
            hit = hit & q_ok
        # two's-complement wrap keeps bit 31 usable for fanout-32 masks
        bit = int(np.uint32(1 << c).view(np.int32))
        hitmask = hitmask | jnp.where(hit, jnp.int32(bit), jnp.int32(0))
        better = hit & (tmin < tnear)
        tnear = jnp.where(better, tmin, tnear)
        nearest = jnp.where(better, c, nearest)

    # --- Moller-Trumbore leaf sweep (unrolled) ---
    for ti in range(K):
        b = 11 * ti                               # LEAF_STRIDE
        v0x, v0y, v0z = gT[b], gT[b + 1], gT[b + 2]
        e1x, e1y, e1z = gT[b + 3], gT[b + 4], gT[b + 5]
        e2x, e2y, e2z = gT[b + 6], gT[b + 7], gT[b + 8]
        tri = _bitcast_i32(gT[b + 9])
        code = _bitcast_i32(gT[b + 10])
        tri_g = tri + tbase
        hx = d_cc[1] * e2z - d_cc[2] * e2y
        hy = d_cc[2] * e2x - d_cc[0] * e2z
        hz = d_cc[0] * e2y - d_cc[1] * e2x
        a = e1x * hx + e1y * hy + e1z * hz
        parallel = jnp.abs(a) <= FLT_EPSILON
        finv = 1.0 / jnp.where(parallel, 1.0, a)
        sx, sy, sz = o_cc[0] - v0x, o_cc[1] - v0y, o_cc[2] - v0z
        u = finv * (sx * hx + sy * hy + sz * hz)
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v = finv * (d_cc[0] * qx + d_cc[1] * qy + d_cc[2] * qz)
        t = finv * (e2x * qx + e2y * qy + e2z * qz)
        ok = (~parallel
              & (u >= -EPSILON) & (u <= 1.0 + EPSILON)
              & (v >= -EPSILON) & (u + v <= 1.0 + EPSILON)
              & (t > EPSILON) & jnp.isfinite(t)
              & (tri >= 0)
              & (tri_g != last_hit)
              & at_leaf)
        closer = ok & (t < best_d)
        best_d = jnp.where(closer, t, best_d)
        best_tri = jnp.where(closer, tri_g, best_tri)
        best_code = jnp.where(closer, code, best_code)
        bnx = jnp.where(closer, e1y * e2z - e1z * e2y, bnx)
        bny = jnp.where(closer, e1z * e2x - e1x * e2z, bny)
        bnz = jnp.where(closer, e1x * e2y - e1y * e2x, bnz)
        best_iid = jnp.where(closer, iid, best_iid)

    FC = {'q8': 6 + 6 * QW, 'bf16': 3 * F, 'f32': 6 * F}[FMT]
    first_child = _bitcast_i32(gT[B0 + FC])

    # --- descend to the nearest hit child. Instance-frame registers
    # commit only when the entry actually descends; a culled entry (no
    # child hit) pops with its world registers intact. ---
    will = sweeping & (hitmask != 0)
    ei = is_inst & will
    loc = [jnp.where(ei, e, l) for e, l in zip(entered, loc)]
    d_inst = jnp.where(ei, depth, d_inst)
    tbase = jnp.where(ei, _bitcast_i32(gT[12]), tbase)
    iid = jnp.where(ei, _bitcast_i32(gT[13]), iid)
    rest = jnp.where(will, hitmask & ~(jnp.int32(1) << nearest),
                     jnp.int32(0))
    new_bases = []
    new_masks = []
    for d in range(D):
        sel = will & (depth == d)
        new_bases.append(jnp.where(sel, first_child, bases_ref[d]))
        new_masks.append(jnp.where(sel, rest, masks_ref[d]))
    cur = jnp.where(will, first_child + nearest, cur)
    depth = jnp.where(will, depth + 1, depth)

    # --- pop: highest pending sibling group ---
    need = active & ~will
    top = jnp.full_like(cur, -1)
    for d in range(D):
        top = jnp.where((new_masks[d] != 0) & (d < depth), d, top)
    found = need & (top >= 0)
    pm = jnp.zeros_like(cur)
    for d in range(D):
        pm = jnp.where(top == d, new_masks[d], pm)
    popped = pm & (pm - 1)
    for d in range(D):
        new_masks[d] = jnp.where(found & (top == d), popped, new_masks[d])
    base_at_top = jnp.zeros_like(cur)
    for d in range(D):
        base_at_top = jnp.where(top == d, new_bases[d], base_at_top)
    cur = jnp.where(found, base_at_top + _ctz32(pm),
                    jnp.where(need & (top < 0), -1, cur))
    depth = jnp.where(found, top + 1, depth)

    # --- leaving the instance: restore world-frame registers ---
    leaving = (d_inst != IBIG) & (depth <= d_inst)
    loc = [jnp.where(leaving, w, l) for w, l in zip(rays, loc)]
    tbase = jnp.where(leaving, 0, tbase)
    d_inst = jnp.where(leaving, IBIG, d_inst)

    ocur_ref[:] = cur
    odepth_ref[:] = depth
    obtri_ref[:] = best_tri
    odinst_ref[:] = d_inst
    otbase_ref[:] = tbase
    oiid_ref[:] = iid
    for d in range(D):
        obases_ref[d] = new_bases[d]
        omasks_ref[d] = new_masks[d]
    obd_ref[:] = best_d
    obcode_ref[:] = best_code
    obnx_ref[:] = bnx
    obny_ref[:] = bny
    obnz_ref[:] = bnz
    obiid_ref[:] = best_iid
    for i in range(6):
        oloc_refs[i][:] = loc[i]


@functools.partial(jax.jit, static_argnames=('W', 'F', 'K', 'D', 'tags',
                                             'interpret', 'fmt', 'b0'))
def visit_inst(rows, cur, depth, btri, d_inst, tbase, iid, bases, masks,
               bd, hctx, loc, rays, last, W, F, K, D, tags,
               interpret=False, fmt='f32', b0=0):
    """Run one instanced-table visit on all lanes.

    rows: (NB, 128, W) f32 gathered rows (UNTRANSPOSED; the kernel
    transposes in VMEM); cur/depth/btri/d_inst/tbase/iid/last:
    (NB, 128) i32; bases/masks: (D, NB, 128) i32; bd: (NB, 128) f32;
    hctx: (bcode i32, bnx, bny, bnz f32, biid i32) each (NB, 128); loc:
    (origin, direction) as 6 (NB, 128) f32 rows (derived registers are
    recomputed in-kernel); rays: (6, NB, 128) f32 (constant).
    Returns (cur', depth', btri', d_inst', tbase', iid', bases', masks',
    bd', hctx', loc')."""
    TAG_INTERNAL, TAG_LEAF, TAG_INSTANCE, IBIG = tags
    nb = rows.shape[0]
    tb = tile_rows(nb * 128)
    kern = functools.partial(_visit_kernel_inst, W=W, F=F, K=K, D=D,
                             TAG_INTERNAL=TAG_INTERNAL, TAG_LEAF=TAG_LEAF,
                             TAG_INSTANCE=TAG_INSTANCE, IBIG=IBIG,
                             FMT=fmt, B0=b0)

    def spec(lead=None):
        if lead is None:
            return pl.BlockSpec((tb, 128), lambda g: (g, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((lead, tb, 128), lambda g: (0, g, 0),
                            memory_space=pltpu.VMEM)

    rows_spec = pl.BlockSpec((tb, 128, W), lambda g: (g, 0, 0),
                             memory_space=pltpu.VMEM)
    flat = spec()
    # under shard_map the per-shard operands carry varying-mesh-axes
    # metadata; pallas_call outputs must declare the same vma or the
    # check_vma pass rejects the program (first hit by the multichip
    # dryrun once it forced the kernel path — the single-chip jit sees
    # an empty vma and is unaffected)
    vma = jax.typeof(cur).vma
    i32 = jax.ShapeDtypeStruct((nb, 128), jnp.int32, vma=vma)
    f32 = jax.ShapeDtypeStruct((nb, 128), jnp.float32, vma=vma)
    out = pl.pallas_call(
        kern,
        grid=(nb // tb,),
        in_specs=[rows_spec, flat, flat, flat, flat, flat, flat,
                  spec(D), spec(D), flat]
                 + [flat] * 5 + [flat] * 6 + [spec(6), flat],
        out_specs=tuple([flat] * 6 + [spec(D), spec(D), flat]
                        + [flat] * 5 + [flat] * 6),
        out_shape=tuple(
            [i32] * 6
            + [jax.ShapeDtypeStruct((D, nb, 128), jnp.int32, vma=vma)] * 2
            + [f32] + [i32, f32, f32, f32, i32] + [f32] * 6),
        # every state operand is a pure in->out pair consumed exactly
        # once by the traversal while_loop carry: alias them so Mosaic
        # updates the buffers in place instead of allocating + copying
        # ~20 fresh (N,)-row outputs per visit (inputs 1..20 line up
        # with outputs 0..19; input 0 is the gathered rows, 21/22 the
        # constant ray registers / last-hit exclusion).
        # CHROMA_PALLAS_ALIAS=0 disables (scheduling experiments).
        input_output_aliases=(
            {i: i - 1 for i in range(1, 21)}
            if os.environ.get('CHROMA_PALLAS_ALIAS', '1') != '0'
            else {}),
        interpret=interpret,
    )(rows, cur, depth, btri, d_inst, tbase, iid, bases, masks, bd,
      *hctx, *loc, rays, last)
    return (out[0], out[1], out[2], out[3], out[4], out[5], out[6],
            out[7], out[8], tuple(out[9:14]), tuple(out[14:20]))
