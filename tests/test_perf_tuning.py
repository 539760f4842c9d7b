"""Learned-performance machinery: wide-node collapse occupancy, the
cost-model traversal-stage tuner, and the flat-hit gather width."""
import numpy as np


def _shell_boxes(n, seed=1):
    "Spherical shell of PMT-like AABBs (the headline TLAS shape)."
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    c = d * 14000
    return (c - 200).astype(np.float32), (c + 200).astype(np.float32)


def test_wide_collapse_occupancy():
    """Collapsing a binary SAH tree into fanout-F rows must produce
    well-filled nodes: the round-3 area-greedy expansion left most of
    the 29k-instance headline TLAS as 2-child fanout-32 nodes (mean 5.0
    children, 7.0 TLAS visits/ray where a balanced cut needs ~3)."""
    from chroma_tpu.bvh.wide import _binary_sah_build, _emit_wide_rows

    lo, hi = _shell_boxes(8192)
    bn = _binary_sah_build(lo, hi, max_leaf=1)
    F, width = 32, 200

    leaf_ids = []

    def make_leaf(node_id):
        leaf_ids.append(node_id)
        return np.zeros(width, np.float32)

    rows, lri, depth = _emit_wide_rows(bn, F, width, make_leaf,
                                       packed=True, b0=14)
    # every binary leaf emitted exactly once
    assert len(lri) == 8192 and len(set(leaf_ids)) == 8192

    # expected internal visits for random rays ~ sum over wide nodes of
    # P(ray hits the node's box) ~ sum(area)/area(scene). The round-3
    # builder's area-greedy expansion scored ~6.9 on this shape (and the
    # r3 geometry cache's even older tree walked 7.0 TLAS visits/ray at
    # headline scale); the leafcount expansion scores ~5.4 with depth 2.
    # node-count proxy: the broken collapse emitted ~2.6x more internal
    # rows (tiny 2-child nodes) than the balanced cut needs
    internal_rows = len(rows) - len(set(lri.values()))
    assert internal_rows <= 1300, internal_rows
    assert depth <= 3


def test_best_stage_spec_constraints():
    """The cost-model spec picker only emits boundaries whose compaction
    slice holds the margin x still-walking lanes, quantizes slice widths
    the staged traversal accepts, and leaves floor-dominated small
    buckets unstaged."""
    from chroma_tpu.ops.propagate import _best_stage_spec, STAGE_MARGIN

    rng = np.random.default_rng(0)
    v = np.clip(rng.lognormal(np.log(25), 0.4, 20000), 8, 120).astype(int)
    for width, a_frac in ((1 << 20, 1.0), (1 << 19, 0.7), (262144, 0.8)):
        spec = _best_stage_spec(width, a_frac, v)
        w = width
        walked = 0
        for b, div in spec:
            walked += b
            frac = a_frac * float(np.mean(v > walked))
            w //= div
            assert frac * STAGE_MARGIN <= w / width, (spec, width)
            assert w >= 1024 and w % 256 == 0
    # tiny bucket: per-iteration floor dominates, staging can't pay
    assert _best_stage_spec(2048, 0.8, v) == ()


def test_learned_hit_gather_width():
    "Quarter-octave gather widths: bounded head-room, bounded programs."
    from chroma_tpu.ops.daq import _learned_m, MIN_HIT_M

    n = 1 << 20
    for n_det in (100, 5000, 33000, 87000, 400000):
        m = _learned_m(n_det, n)
        assert m >= min(max(int(n_det * 1.07), MIN_HIT_M), n)
        if m > MIN_HIT_M:
            assert m <= int(n_det * 1.07) * 1.15 + 1024, (n_det, m)
        step = 1 << max(int(int(n_det * 1.07) + 1).bit_length() - 3, 10)
        assert m % step == 0 or m in (MIN_HIT_M, n)
    assert _learned_m(2 * n, n) == n


def test_bench_regression_gate():
    """The bench history gate (bench.regression_warnings) fires on a
    quick-config drop below 1.0x baseline and on >5% regressions vs the
    best recorded run, and stays silent otherwise."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import regression_warnings

    history = [
        {'t': 1.0, 'quick': {'photon_propagation_throughput': 2.8e6,
                             'photons_per_sec_vs_baseline': 1.12},
         'headline': {'photon_propagation_throughput': 1.29e6,
                      'photons_per_sec_vs_baseline': 0.515}},
        {'t': 2.0, 'quick': {'photon_propagation_throughput': 2.6e6,
                             'photons_per_sec_vs_baseline': 1.04}},
    ]
    # healthy run: no warnings
    ok = {'quick': {'photon_propagation_throughput': 2.9e6,
                    'photons_per_sec_vs_baseline': 1.16},
          'headline': {'photon_propagation_throughput': 1.30e6,
                       'photons_per_sec_vs_baseline': 0.52}}
    assert regression_warnings(history, ok) == []

    # quick below baseline AND headline >5% below the best recorded
    bad = {'quick': {'photon_propagation_throughput': 2.4e6,
                     'photons_per_sec_vs_baseline': 0.96},
           'headline': {'photon_propagation_throughput': 1.1e6,
                        'photons_per_sec_vs_baseline': 0.44}}
    warns = regression_warnings(history, bad)
    assert any('below 1.0x' in w for w in warns), warns
    assert any('headline regressed' in w for w in warns), warns
    # quick 2.4e6 is also >5% below the best recorded 2.8e6
    assert any('quick regressed' in w for w in warns), warns

    # empty history: only the baseline gate can fire
    assert regression_warnings([], ok) == []


def test_real_tlas_build_stats():
    """Tree-quality stats of the ACTUAL quick-config detector TLAS (630
    PMT instances + world sphere, built from the live instance list):
    a collapse regression fails here, not as a silent bench drop. Also
    unit-checks the violation detector on a pathological stats dict."""
    import jax
    from chroma_tpu import demo
    from chroma_tpu.demo.pmt import build_8inch_pmt_with_lc
    from chroma_tpu.make import sphere
    from chroma_tpu.transform import make_rotation_matrix, normalize
    from chroma_tpu.bvh.wide import (build_instanced_bvh, table_stats,
                                     check_table_stats, fmt_of)

    pmt = build_8inch_pmt_with_lc().mesh
    world = sphere(4500.0, nsteps=200)
    instances = [(world, None, None, 0)]
    base = len(world.triangles)
    for pos in demo.spherical_spiral(4000.0, 400.0):
        direction = -normalize(pos)
        y = np.array((0.0, 1.0, 0.0))
        rot = make_rotation_matrix(
            np.arccos(np.dot(y, direction)), np.cross(direction, y))
        instances.append((pmt, rot, pos, base))
        base += len(pmt.triangles)

    inst = build_instanced_bvh(instances)
    st = table_stats(np.asarray(inst.rows), inst.fanout, inst.leaf_size,
                     fmt_of(inst))
    assert check_table_stats(st, inst.fanout) == [], st
    assert st['instance'] == len(instances)
    # the quality bar the round-4 collapse fix established: well-filled
    # wide nodes and a bounded expected-visit proxy on the real tree
    assert st['mean_children'] >= inst.fanout * 0.3, st
    assert st['visit_proxy'] <= 30.0, st
    assert st['mean_leaf_tris'] >= 4.0, st

    # pathological trees must trip the detector
    bad = dict(st, mean_children=3.0, internal=4000)
    assert any('under-filled' in v
               for v in check_table_stats(bad, inst.fanout))
    bad = dict(st, visit_proxy=90.0)
    assert any('proxy' in v for v in check_table_stats(bad, inst.fanout))


def test_geocache_sidecar_stats(tmp_path):
    """save_geometry_arrays writes the tree-quality stats into the JSON
    sidecar and load_geometry_arrays re-checks the loaded table."""
    import json
    from chroma_tpu.geometry import Geometry, Solid, vacuum
    from chroma_tpu.demo.optics import water
    from chroma_tpu.make import box, sphere
    from chroma_tpu.ops.types import build_geometry_arrays
    from chroma_tpu.io.geocache import (save_geometry_arrays,
                                        load_geometry_arrays)

    geo = Geometry(vacuum)
    geo.add_solid(Solid(sphere(1200.0, nsteps=16), water, vacuum))
    unit = Solid(box(120.0, 80.0, 60.0), water, water)
    for i in range(5):
        geo.add_solid(unit, None, np.array([400.0 * i - 800.0, 0.0, 0.0]))
    geo.flatten()
    ga = build_geometry_arrays(geo)

    path = str(tmp_path / 'geo')
    save_geometry_arrays(path, ga)
    with open(path + '.json') as f:
        meta = json.load(f)
    st = meta['ga.wide.__stats__']
    assert st['instance'] == 6 and st['rows'] > 0
    assert 'visit_proxy' in st and 'mean_children' in st

    ga2 = load_geometry_arrays(path)
    assert ga2 is not None
    assert np.asarray(ga2.wide.rows).shape == np.asarray(ga.wide.rows).shape


def test_fused_bomb_suffix_mop(monkeypatch):
    """The fused bomb's overflow path: a schedule that compacts to 1/8
    after one step while most photons are still alive GUARANTEES
    overflow into the suffix mop (round 5: overflow lanes front-pack
    into a small bucket instead of running the full suffix width to
    max_steps). Every lane must come back terminated and accounted for
    — a lane lost or duplicated by the pack/merge shows up in the flag
    totals."""
    from chroma_tpu import event
    from chroma_tpu.geometry import Geometry, Solid, Surface, vacuum
    from chroma_tpu.demo.optics import water
    from chroma_tpu.loader import create_geometry_from_obj
    from chroma_tpu.make import box
    from chroma_tpu.ops.types import build_geometry_arrays
    from chroma_tpu.ops.propagate import propagate
    from chroma_tpu.ops.sample import make_key
    import jax.numpy as jnp
    from chroma_tpu.ops.photon import PhotonState

    gray = Surface('gray')
    gray.set('absorb', 0.35)
    gray.set('reflect_diffuse', 0.65)
    geo = Geometry(vacuum)
    geo.add_solid(Solid(box(1000.0, 1000.0, 1000.0), water, vacuum,
                        surface=gray))
    geo.flatten()
    ga = build_geometry_arrays(create_geometry_from_obj(
        geo, auto_build_bvh=False, update_bvh_cache=False))

    n = 4096
    rng = np.random.default_rng(11)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ps = PhotonState(
        pos=jnp.zeros((n, 3), jnp.float32),
        dir=jnp.asarray(d, jnp.float32),
        pol=jnp.asarray(np.cross(d, [0.0, 0.0, 1.0]), jnp.float32),
        wavelength=jnp.full(n, 450.0, jnp.float32),
        t=jnp.zeros(n, jnp.float32),
        weight=jnp.ones(n, jnp.float32),
        flags=jnp.zeros(n, jnp.uint32),
        last_hit_triangle=jnp.full(n, -1, jnp.int32),
        evidx=jnp.zeros(n, jnp.uint32),
        cur_mat=jnp.full(n, -1, jnp.int32),
    )

    # diffuse walls keep ~65% of photons alive past step 1, so the 1/8
    # bucket catches at most a fraction: most survivors take the mop
    monkeypatch.setenv('CHROMA_FUSED_SCHEDULE', '1:8,8:2')
    monkeypatch.setenv('CHROMA_TRAV_STAGE_PILOT', '0')
    res = propagate(ps, ga, make_key(5), max_steps=64)
    fl = np.asarray(res.flags)
    term = (event.SURFACE_DETECT | event.BULK_ABSORB
            | event.SURFACE_ABSORB | event.NO_HIT | event.NAN_ABORT)
    assert ((fl & event.NAN_ABORT) == 0).all()
    assert ((fl & term) != 0).all(), 'unterminated lanes after mop'
    absorbed = int(((fl & event.SURFACE_ABSORB) > 0).sum())
    assert absorbed > 0.5 * n  # gray walls absorb most photons

    # cross-check against the unstaged fused program (no compaction):
    # same physics, Poisson-level agreement on the absorb count
    monkeypatch.setenv('CHROMA_FUSED_SCHEDULE', 'none')
    res2 = propagate(ps, ga, make_key(5), max_steps=64)
    fl2 = np.asarray(res2.flags)
    a2 = int(((fl2 & event.SURFACE_ABSORB) > 0).sum())
    assert abs(absorbed - a2) <= 6 * np.sqrt(max(a2, 1)) + 10
