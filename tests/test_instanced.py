"""Instanced (TLAS/BLAS) wide BVH: agreement with the monolithic
structure, mesh sharing, non-rigid baking, and staged-compaction
equivalence (reference has no instancing — parity target is the
monolithic result)."""
import os

import numpy as np
import jax.numpy as jnp

from chroma_tpu.geometry import Geometry, Solid, vacuum
from chroma_tpu.demo.optics import water
from chroma_tpu.make import box, sphere
from chroma_tpu.transform import make_rotation_matrix
from chroma_tpu.ops.types import build_geometry_arrays
from chroma_tpu.bvh.wide import TAG_LEAF
from chroma_tpu.ops.mesh_wide import intersect_mesh_wide
from chroma_tpu.bvh.wide import InstancedBVH, WideBVH
import pytest


def _pmt_array_geometry(n=6):
    "A shared box mesh placed n times inside a container sphere."
    geo = Geometry(vacuum)
    geo.add_solid(Solid(sphere(1200.0, nsteps=24), water, vacuum))
    unit = Solid(box(120.0, 80.0, 60.0), water, water)
    for i in range(n):
        rot = make_rotation_matrix(0.5 * i, [0, 0, 1])
        geo.add_solid(unit, rot, np.array([500.0 * np.cos(i),
                                           500.0 * np.sin(i),
                                           150.0 * (i - n / 2)]))
    geo.flatten()
    return geo


def _random_rays(n, seed=0, extent=900.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-extent, extent, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_instanced_matches_monolithic():
    geo = _pmt_array_geometry()
    ga_i = build_geometry_arrays(geo)
    ga_m = build_geometry_arrays(geo, use_instancing=False)
    assert isinstance(ga_i.wide, InstancedBVH)
    # the monolithic fallback is ONE identity instance over the soup, so
    # the hot path (Pallas kernel, baked hit context) stays uniform
    assert isinstance(ga_m.wide, InstancedBVH)
    assert ga_m.wide.n_instances == 1
    # 6 placements share ONE BLAS: fewer triangle-leaf rows than the
    # monolithic soup, which stores every placement's triangles
    assert ga_i.wide.n_instances == 7

    def leaf_rows(ga):
        tags = np.asarray(ga.wide.rows)[:, -1].view(np.int32)
        return int((tags == TAG_LEAF).sum())

    assert leaf_rows(ga_i) < leaf_rows(ga_m)

    o, d = _random_rays(2000)
    t_i, d_i = intersect_mesh_wide(o, d, ga_i.wide)
    t_m, d_m = intersect_mesh_wide(o, d, ga_m.wide)
    t_i, t_m = np.asarray(t_i), np.asarray(t_m)
    assert (t_i == t_m).all()
    hit = t_m >= 0
    assert np.allclose(np.asarray(d_i)[hit], np.asarray(d_m)[hit],
                       rtol=1e-4, atol=1e-2)


def test_instanced_last_hit_exclusion():
    geo = _pmt_array_geometry()
    ga = build_geometry_arrays(geo)
    o, d = _random_rays(500, seed=3)
    t1, _ = intersect_mesh_wide(o, d, ga.wide)
    t2, _ = intersect_mesh_wide(o, d, ga.wide, last_hit_triangle=t1)
    t1, t2 = np.asarray(t1), np.asarray(t2)
    hit = t1 >= 0
    assert not (t2[hit] == t1[hit]).any()


def test_non_rigid_placement_is_baked():
    "A scaled placement cannot share a local-frame BLAS; it gets baked."
    geo = Geometry(vacuum)
    unit = Solid(box(100.0, 100.0, 100.0), water, vacuum)
    geo.add_solid(unit)
    geo.add_solid(unit, rotation=2.0 * np.identity(3),
                  displacement=np.array([400.0, 0.0, 0.0]))
    geo.flatten()
    ga_i = build_geometry_arrays(geo)
    ga_m = build_geometry_arrays(geo, use_instancing=False)
    o, d = _random_rays(1000, extent=500.0)
    t_i, _ = intersect_mesh_wide(o, d, ga_i.wide)
    t_m, _ = intersect_mesh_wide(o, d, ga_m.wide)
    assert (np.asarray(t_i) == np.asarray(t_m)).all()


@pytest.mark.slow
def test_staged_compaction_equivalence():
    "Multi-stage tail compaction returns identical hits (N > threshold)."
    geo = _pmt_array_geometry()
    ga = build_geometry_arrays(geo)
    o, d = _random_rays(8192, seed=7)
    ref = np.asarray(intersect_mesh_wide(o, d, ga.wide,
                                         two_phase=False)[0])
    old = os.environ.get('CHROMA_TRAV_STAGES')
    old_min = os.environ.get('CHROMA_TRAV_STAGE_MIN')
    try:
        os.environ['CHROMA_TRAV_STAGE_MIN'] = '4096'
        for spec in ('4:2,4:4,4:4', '28:4'):
            os.environ['CHROMA_TRAV_STAGES'] = spec
            got = np.asarray(intersect_mesh_wide(o, d, ga.wide)[0])
            assert (got == ref).all(), spec
    finally:
        if old is None:
            os.environ.pop('CHROMA_TRAV_STAGES', None)
        else:
            os.environ['CHROMA_TRAV_STAGES'] = old
        if old_min is None:
            os.environ.pop('CHROMA_TRAV_STAGE_MIN', None)
        else:
            os.environ['CHROMA_TRAV_STAGE_MIN'] = old_min


def test_axis_aligned_rays_terminate_and_hit():
    """Rays with exact zero direction components (1/d = +-inf) must use
    the exact origin-containment slab test on those axes. The always-hit
    fallback made an axis-aligned ray from the detector center visit
    every node overlapping its 1-D slab — ~100k visits at detector scale,
    which blew through the device watchdog (round-3 headline crash)."""
    from chroma_tpu.ops.mesh_wide import traversal_visits

    geo = _pmt_array_geometry(12)
    ga = build_geometry_arrays(geo)
    axes = np.array([[0., 0., 1.], [0., 0., -1.], [-0., -0., 1.],
                     [1., 0., 0.], [0., -1., 0.], [0., 1., 0.],
                     [0., 0., 1.], [0., 0., 1.]], np.float32)
    o = jnp.zeros((len(axes), 3), jnp.float32)
    d = jnp.asarray(axes)
    visits, tri, dist = traversal_visits(o, d, ga.wide)
    visits = np.asarray(visits)
    tri = np.asarray(tri)
    dist = np.asarray(dist)
    # every ray must hit the container sphere (r=1200) from the center
    assert (tri >= 0).all()
    assert np.allclose(dist, 1200.0, rtol=0.05)
    # and do so in a shallow, pruned traversal, not an exhaustive sweep
    assert visits.max() < 120, visits

    # brute-force cross-check against every triangle (exact distances)
    from chroma_tpu.ops.intersect import intersect_triangle
    v = np.asarray(geo.mesh.vertices)[np.asarray(geo.mesh.triangles)]
    for i in range(len(axes)):
        hit, t = intersect_triangle(
            jnp.asarray(np.zeros((len(v), 3), np.float32)),
            jnp.asarray(np.broadcast_to(axes[i], (len(v), 3)).copy()),
            jnp.asarray(v[:, 0]), jnp.asarray(v[:, 1]),
            jnp.asarray(v[:, 2]))
        t = np.asarray(jnp.where(hit, t, jnp.inf))
        assert abs(t.min() - dist[i]) < 1e-3


def test_ctz32_i32_full_word():
    "i32 ctz must handle bit 31 (fanout-32 masks) via two's-complement."
    from chroma_tpu.ops.mesh_wide import _ctz32_i32, _ctz32
    vals = np.array([0, 1, 2, 3, 8, 0x80000000, 0xFFFFFFFF, 0x80000001,
                     0x40000000], dtype=np.uint32)
    got = np.asarray(_ctz32_i32(jnp.asarray(vals.view(np.int32))))
    ref = np.asarray(_ctz32(jnp.asarray(vals)))
    assert (got == ref).all(), (got, ref)
    assert got[0] == 32 and got[5] == 31 and got[6] == 0


def test_packed_bounds_match_f32():
    """bf16-pair packed internal rows (the default) find the SAME nearest
    triangles as the f32 f16-fanout build: directed rounding only grows
    the boxes, so culling stays conservative and the exact leaf test
    picks the identical winner."""
    from chroma_tpu.bvh.wide import build_instanced_bvh

    geo = _pmt_array_geometry(9)
    tri_base = np.cumsum([0] + [len(s.mesh.triangles) for s in geo.solids])
    instances = [(s.mesh, geo.solid_rotations[i],
                  geo.solid_displacements[i], int(tri_base[i]))
                 for i, s in enumerate(geo.solids)]
    bp = build_instanced_bvh(instances, bounds_fmt='bf16')
    bf = build_instanced_bvh(instances, fanout=16)
    assert bp.packed and not bf.packed
    assert bp.rows.shape[1] == bf.rows.shape[1]   # same gather bytes
    o, d = _random_rays(4000, seed=11)
    tp, dp = intersect_mesh_wide(o, d, bp)
    tf, df = intersect_mesh_wide(o, d, bf)
    assert (np.asarray(tp) == np.asarray(tf)).all()
    hit = np.asarray(tf) >= 0
    assert np.allclose(np.asarray(dp)[hit], np.asarray(df)[hit],
                       rtol=1e-5, atol=1e-3)


def test_q8_bounds_match_f32():
    """Byte-quantized bounds (the default fmt) find the SAME nearest
    triangles as f32 and bf16 tables: quantization rounds lo down / hi
    up against per-node anchors, so boxes only grow, culling stays
    conservative and the exact leaf test picks the identical winner —
    in a 16-column narrower row."""
    from chroma_tpu.bvh.wide import build_instanced_bvh, fmt_of

    geo = _pmt_array_geometry(9)
    tri_base = np.cumsum([0] + [len(s.mesh.triangles) for s in geo.solids])
    instances = [(s.mesh, geo.solid_rotations[i],
                  geo.solid_displacements[i], int(tri_base[i]))
                 for i, s in enumerate(geo.solids)]
    bq = build_instanced_bvh(instances, bounds_fmt='q8')
    bb = build_instanced_bvh(instances, bounds_fmt='bf16')
    assert fmt_of(bq) == 'q8' and bq.rows.shape[1] == 96
    assert bb.rows.shape[1] == 112
    o, d = _random_rays(4000, seed=12)
    tq, dq = intersect_mesh_wide(o, d, bq)
    tb, db = intersect_mesh_wide(o, d, bb)
    assert (np.asarray(tq) == np.asarray(tb)).all()
    hit = np.asarray(tb) >= 0
    assert hit.sum() > 500
    assert np.allclose(np.asarray(dq)[hit], np.asarray(db)[hit],
                       rtol=1e-5, atol=1e-3)
    # axis-aligned rays exercise the zero-direction nudge (safe_inv);
    # the symmetric array makes the winning TRIANGLE a tie between
    # formats (different conservative boxes -> different descent
    # order), so assert on hit/miss and distance
    o0 = np.zeros((6, 3), np.float32)
    d0 = np.concatenate([np.eye(3, dtype=np.float32),
                         -np.eye(3, dtype=np.float32)])
    ta, da = intersect_mesh_wide(jnp.asarray(o0), jnp.asarray(d0), bq)
    tf, df_ = intersect_mesh_wide(jnp.asarray(o0), jnp.asarray(d0), bb)
    assert ((np.asarray(ta) >= 0) == (np.asarray(tf) >= 0)).all()
    assert np.allclose(np.asarray(da), np.asarray(df_), rtol=1e-5)


def test_bf16_directed_rounding():
    "lo rounds down, hi rounds up, infinities and exact values unchanged."
    from chroma_tpu.bvh.wide import _bf16_dir_bits

    vals = np.array([1.0, -1.0, 1.0 + 2 ** -20, -(1.0 + 2 ** -20),
                     12345.678, -12345.678, 0.0, -0.0,
                     np.inf, -np.inf, 3.0e38, -3.0e38], np.float32)

    def back(bits):
        return (bits.astype(np.uint32) << 16).view(np.float32)

    lo = back(_bf16_dir_bits(vals, up=False))
    hi = back(_bf16_dir_bits(vals, up=True))
    assert (lo <= vals).all() and (hi >= vals).all()
    exact = np.array([1.0, -1.0, 0.0, -0.0, np.inf, -np.inf], np.float32)
    assert (back(_bf16_dir_bits(exact, up=False)) == exact).all()
    assert (back(_bf16_dir_bits(exact, up=True)) == exact).all()
    # magnitude overflow saturates to the conservative infinity
    assert back(_bf16_dir_bits(np.float32(3.39e38), up=True)) == np.inf
    assert back(_bf16_dir_bits(np.float32(-3.39e38), up=False)) == -np.inf


def test_fanout32_traversal_matches_default():
    "Full-word (F=32) masks traverse identically to the F=16 build."
    from chroma_tpu.bvh.wide import build_instanced_bvh

    geo = _pmt_array_geometry(5)
    mesh = geo.mesh
    b16 = build_instanced_bvh([(mesh, None, None, 0)], fanout=16)
    b32 = build_instanced_bvh([(mesh, None, None, 0)], fanout=32,
                              leaf_size=16)
    o, d = _random_rays(3000, seed=3)
    t16, d16 = intersect_mesh_wide(o, d, b16)
    t32, d32 = intersect_mesh_wide(o, d, b32)
    assert (np.asarray(t16) == np.asarray(t32)).all()
    assert np.allclose(np.asarray(d16), np.asarray(d32), rtol=1e-5,
                       atol=1e-3, equal_nan=True)


@pytest.mark.slow
def test_per_stage_trav_specs_equivalence():
    """propagate() with PER-FUSED-STAGE traversal staging specs returns
    bitwise-identical results to the flat-spec and unstaged runs: with
    the same compaction schedule the key stream is identical, and
    traversal staging merges results back in lane order."""
    import jax
    from chroma_tpu.ops import propagate as P
    from chroma_tpu.ops.photon import PhotonState
    from chroma_tpu.ops.sample import make_key

    geo = _pmt_array_geometry()
    ga = build_geometry_arrays(geo)
    n = 16384
    rng = np.random.default_rng(3)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pol = np.cross(rng.normal(size=(n, 3)).astype(np.float32), d)
    pol /= np.linalg.norm(pol, axis=1, keepdims=True)
    ps = PhotonState(
        pos=jnp.zeros((n, 3), jnp.float32), dir=jnp.asarray(d),
        pol=jnp.asarray(pol),
        wavelength=jnp.asarray(
            rng.uniform(300, 700, n).astype(np.float32)),
        t=jnp.zeros(n, jnp.float32), weight=jnp.ones(n, jnp.float32),
        flags=jnp.zeros(n, jnp.uint32),
        last_hit_triangle=jnp.full(n, -1, jnp.int32),
        evidx=jnp.zeros(n, jnp.uint32),
        cur_mat=jnp.full(n, -1, jnp.int32))

    ck = (P.perf_key(ga), n, 12)
    try:
        P._SCHED_CACHE[ck] = ((2, 2), (4, 2))
        outs = []
        for pstages in (None, ((8, 16),),
                        (((8, 16),), (), ((16, 16),))):
            if pstages is None:
                P._PSTAGE_CACHE.pop(ck, None)
            else:
                P._PSTAGE_CACHE[ck] = pstages
            res = P.propagate(ps, ga, make_key(11), max_steps=12)
            outs.append(jax.device_get(res))
        for got in outs[1:]:
            for a, b in zip(jax.tree_util.tree_leaves(outs[0]),
                            jax.tree_util.tree_leaves(got)):
                assert (np.asarray(a) == np.asarray(b)).all()
        # absolute-width schedule entries (the cost-model tuner's form)
        # pick the same widths as the divisor form -> identical program
        P._PSTAGE_CACHE.pop(ck, None)
        P._SCHED_CACHE[ck] = ((2, 8192), (4, 4096))
        res = P.propagate(ps, ga, make_key(11), max_steps=12)
        got = jax.device_get(res)
        for a, b in zip(jax.tree_util.tree_leaves(outs[0]),
                        jax.tree_util.tree_leaves(got)):
            assert (np.asarray(a) == np.asarray(b)).all()
    finally:
        P._SCHED_CACHE.pop(ck, None)
        P._PSTAGE_CACHE.pop(ck, None)


def test_schedule_tuner_cost_model():
    """The DP schedule tuner emits monotonically shrinking absolute
    widths that always hold the margin over the interpolated survivors,
    and is stable under a few percent of count jitter."""
    from chroma_tpu.ops.propagate import (_tune_schedule, _resolve_width,
                                          _survival_fn, MIN_BATCH)
    n = 1 << 20
    bs = [1, 3, 5, 9, 17, 31]
    alive = [int(0.36 * 0.82 ** (k - 1) * n) for k in bs]
    sched = _tune_schedule(n, bs, alive, 100)
    assert sched, 'a decaying curve must produce a schedule'
    import os
    margin = float(os.environ.get('CHROMA_SCHED_MARGIN', '1.15'))
    alive_at = _survival_fn(n, bs, alive)
    w, step = n, 0
    for ent in sched:
        assert ent[0] >= 1
        step += ent[0]
        m = _resolve_width(w, ent)
        assert MIN_BATCH <= m < w, (m, w)
        assert m >= min(alive_at(step) * margin * n * 0.999, n), \
            'bucket must hold margin x survivors'
        w = m
    # stable under +3% jitter (quantized counts -> cached compile reuse)
    alive_hi = [int(a * 1.03) for a in alive]
    assert _tune_schedule(n, bs, alive_hi, 100) == sched


def test_staged_inst_overflow_lanes():
    """Headline-shape staging edges (VERDICT r3 item 10): overflow lanes
    (survivors beyond the compaction slice) finish in the mop-up loop,
    non-multiple-of-256 slice widths fall back to full width, and nested
    stages can mix both — all bitwise-identical to the unstaged query."""
    from chroma_tpu.ops.mesh_wide import intersect_mesh_instanced
    geo = _pmt_array_geometry()
    ga = build_geometry_arrays(geo)
    cases = (
        # visits bound 2: most lanes overflow the 1/2 slice -> mop-up
        (4608, ((2, 2),)),
        # nested: second stage m = 1152 (% 256 != 0) -> full-width
        # fallback inside the first stage's slice
        (4608, ((2, 2), (2, 2))),
        # m = 2432 (% 256 != 0) -> the whole staged path falls back
        (4864, ((4, 2),)),
    )
    for n, stages in cases:
        o, d = _random_rays(n, seed=11)
        ref = intersect_mesh_instanced(o, d, ga.wide, two_phase=False)
        got = intersect_mesh_instanced(o, d, ga.wide, stages=stages)
        assert (np.asarray(got[0]) == np.asarray(ref[0])).all(), \
            (n, stages)
        hit = np.asarray(ref[0]) >= 0
        assert np.allclose(np.asarray(got[1])[hit],
                           np.asarray(ref[1])[hit]), (n, stages)


def test_chained_traversal_bitwise_equivalence():
    """The interleaved-chain loop (CHROMA_TRAV_CHAINS>1) returns bitwise
    identical hits to the single-chain loop — each lane's walk is
    independent, only the lane grouping changes — including through a
    staged boundary and with want_context."""
    from chroma_tpu.ops.mesh_wide import intersect_mesh_instanced

    geo = _pmt_array_geometry()
    ga = build_geometry_arrays(geo)
    o, d = _random_rays(4096, seed=13)
    old = os.environ.get('CHROMA_TRAV_CHAINS')
    try:
        os.environ['CHROMA_TRAV_CHAINS'] = '1'
        r1 = intersect_mesh_instanced(o, d, ga.wide, want_context=True)
        s1 = intersect_mesh_instanced(o, d, ga.wide,
                                      stages=((6, 2), (6, 2)))
        for c in ('2', '4'):
            os.environ['CHROMA_TRAV_CHAINS'] = c
            rc = intersect_mesh_instanced(o, d, ga.wide,
                                          want_context=True)
            for a, b in zip(r1, rc):
                assert (np.asarray(a) == np.asarray(b)).all(), c
            sc = intersect_mesh_instanced(o, d, ga.wide,
                                          stages=((6, 2), (6, 2)))
            for a, b in zip(s1, sc):
                assert (np.asarray(a) == np.asarray(b)).all(), c
        # non-divisible width falls back to one chain (still correct)
        os.environ['CHROMA_TRAV_CHAINS'] = '3'
        r3 = intersect_mesh_instanced(o, d, ga.wide)
        assert (np.asarray(r3[0]) == np.asarray(r1[0])).all()
    finally:
        if old is None:
            os.environ.pop('CHROMA_TRAV_CHAINS', None)
        else:
            os.environ['CHROMA_TRAV_CHAINS'] = old
