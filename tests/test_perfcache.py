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
