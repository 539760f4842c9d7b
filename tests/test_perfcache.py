"""Persisted learned-performance state (VERDICT r3 item 6): geometry
content fingerprints, schedule/gather-width persistence across processes,
and id-reuse safety."""
import os

import numpy as np

from chroma_tpu import perfcache
from chroma_tpu.geometry import Geometry, Solid, vacuum
from chroma_tpu.demo.optics import water
from chroma_tpu.make import box, sphere
from chroma_tpu.ops.types import build_geometry_arrays
from chroma_tpu.ops import propagate as P


def _geometry():
    geo = Geometry(vacuum)
    geo.add_solid(Solid(sphere(900.0, nsteps=12), water, vacuum))
    unit = Solid(box(100.0, 80.0, 60.0), water, water)
    for i in range(4):
        geo.add_solid(unit, displacement=np.array([300.0 * i - 450.0,
                                                   0.0, 0.0]))
    geo.flatten()
    return geo


def test_content_fingerprint_is_stable_and_persistent():
    "Two builds of the same geometry share one content key."
    geo = _geometry()
    ga1 = build_geometry_arrays(geo)
    ga2 = build_geometry_arrays(geo)
    k1, k2 = P.perf_key(ga1), P.perf_key(ga2)
    assert k1 == k2
    assert perfcache.persistent(k1)
    # the wide BVH itself is registered too (stages_for keying)
    assert perfcache.key_of(ga1.wide) == perfcache.key_of(ga2.wide)
    # and a different geometry gets a different key
    geo2 = _geometry()
    geo2.add_solid(Solid(box(50.0, 50.0, 50.0), water, water),
                   displacement=np.array([0.0, 400.0, 0.0]))
    geo2.flatten()
    assert P.perf_key(build_geometry_arrays(geo2)) != k1


def test_unregistered_objects_fall_back_to_session_keys():
    class Thing:
        pass

    t = Thing()
    k = perfcache.key_of(t)
    assert not perfcache.persistent(k)
    # never written to disk
    perfcache.update(k, {'x': 1})
    assert not os.path.exists(perfcache._path(k))


def test_schedule_round_trips_through_disk(tmp_path, monkeypatch):
    "A tuned schedule written by one 'process' is found by the next."
    monkeypatch.setenv('CHROMA_CACHE_DIR', str(tmp_path))
    geo = _geometry()
    ga = build_geometry_arrays(geo)
    pk = P.perf_key(ga)
    sched = ((2, 8192), (4, 4096))
    pstages = (((8, 16),), (), ((16, 16),))
    perfcache.update(pk, {
        'sched:16384:12': sched,
        'pstages:16384:12': pstages,
        'flat_stage': ((40, 16),),
        'hit_m:16384': 8192,
    })
    # fresh process: empty memoization + session caches
    perfcache._DISK.clear()
    P._SCHED_CACHE.clear()
    P._PSTAGE_CACHE.clear()
    P._STAGE_CACHE.clear()
    try:
        got_sched, got_pstages = P._sched_lookup(ga, 16384, 12)
        assert got_sched == sched            # tuples, not JSON lists
        assert got_pstages == pstages
        assert P.stages_for(ga) == ((40, 16),)
        from chroma_tpu.ops import daq as daq_ops
        assert perfcache.load(pk).get('hit_m:16384') == 8192
    finally:
        P._SCHED_CACHE.clear()
        P._PSTAGE_CACHE.clear()
        P._STAGE_CACHE.clear()
        perfcache._DISK.clear()


def test_partial_perf_entry_heals(tmp_path, monkeypatch):
    """A persisted schedule WITHOUT per-stage traversal specs (a process
    died between the stage pilot and the schedule probe) must trigger a
    re-probe + full retune on the next bomb — running degraded forever
    cost 3.4x at headline scale (round-5 regression: 1.29M -> 378k
    photons/s with a poisoned 'pstages: null' entry)."""
    import jax
    import jax.numpy as jnp
    from chroma_tpu.bvh.wide import InstancedBVH
    from chroma_tpu.ops.photon import PhotonState
    from chroma_tpu.ops.sample import make_key

    monkeypatch.setenv('CHROMA_CACHE_DIR', str(tmp_path))
    monkeypatch.setattr(P, '_PILOT_MIN', 1024)
    geo = _geometry()
    ga = build_geometry_arrays(geo)
    assert isinstance(ga.wide, InstancedBVH)  # pilot precondition
    pk = P.perf_key(ga)
    n, steps = 2048, 12
    suffix = '%d:%d' % (n, steps)

    # the poisoned shape: schedule present, specs and distributions lost
    perfcache.update(pk, {'sched:' + suffix: ((2, 1024), (4, 512)),
                          'pstages:' + suffix: None,
                          'flat_stage': []})
    # fresh process
    perfcache._DISK.clear()
    P._SCHED_CACHE.clear()
    P._PSTAGE_CACHE.clear()
    P._STAGE_CACHE.clear()
    P._DIST_CACHE.clear()
    try:
        d = jax.random.normal(jax.random.key(0), (n, 3))
        d = (d / jnp.linalg.norm(d, axis=1, keepdims=True)).astype(
            jnp.float32)
        ps = PhotonState(
            pos=jnp.zeros((n, 3), jnp.float32), dir=d, pol=d,
            wavelength=jnp.full(n, 400.0, jnp.float32),
            t=jnp.zeros(n, jnp.float32),
            weight=jnp.ones(n, jnp.float32),
            flags=jnp.zeros(n, jnp.uint32),
            last_hit_triangle=jnp.full(n, -1, jnp.int32),
            evidx=jnp.zeros(n, jnp.uint32),
            cur_mat=jnp.full(n, -1, jnp.int32))
        P.propagate(ps, ga, make_key(3), max_steps=steps)
        perfcache._DISK.clear()           # read back what hit the disk
        ent = perfcache.load(pk)
        # [] = tuned-but-empty terminal sentinel; null = still poisoned
        assert ent.get('pstages:' + suffix) is not None
        assert ent.get('dists'), 'pilot distributions must persist'
        assert 'counts:' + suffix in ent, 'survival curve must persist'
        # healed entry is terminal: a second fresh process goes straight
        # to the fused path — no second probe
        P._SCHED_CACHE.clear()
        P._PSTAGE_CACHE.clear()
        P._STAGE_CACHE.clear()
        P._DIST_CACHE.clear()
        probes = []
        real = P._fused_bomb

        def spy(*a, **kw):
            if kw.get('report'):
                probes.append(1)
            return real(*a, **kw)

        monkeypatch.setattr(P, '_fused_bomb', spy)
        P.propagate(ps, ga, make_key(4), max_steps=steps)
        assert not probes, 'terminal sentinel must not re-probe'
    finally:
        P._SCHED_CACHE.clear()
        P._PSTAGE_CACHE.clear()
        P._STAGE_CACHE.clear()
        P._DIST_CACHE.clear()
        perfcache._DISK.clear()


def test_geocache_load_registers_same_fingerprint(tmp_path):
    "A geometry loaded from the geocache keys the same perf entries."
    from chroma_tpu.io.geocache import (save_geometry_arrays,
                                        load_geometry_arrays)
    geo = _geometry()
    ga = build_geometry_arrays(geo)
    path = str(tmp_path / 'arrays')
    save_geometry_arrays(path, ga)
    loaded = load_geometry_arrays(path)
    assert P.perf_key(loaded) == P.perf_key(ga)
    assert perfcache.persistent(P.perf_key(loaded))
