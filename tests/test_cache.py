"""Disk cache tests (reference test strategy: test/test_cache.py)."""
import os
import shutil
import tempfile

import pytest

from chroma_tpu import make
from chroma_tpu.cache import Cache, GeometryNotFoundError, BVHNotFoundError
from chroma_tpu.geometry import Geometry, Solid, vacuum
from chroma_tpu.bvh import make_recursive_grid_bvh


@pytest.fixture
def cache_dir():
    d = tempfile.mkdtemp()
    yield d
    shutil.rmtree(d)


def _geometry():
    geo = Geometry()
    geo.add_solid(Solid(make.cube(1.0), vacuum, vacuum))
    geo.flatten()
    return geo


def test_geometry_save_load(cache_dir):
    cache = Cache(cache_dir)
    geo = _geometry()
    cache.save_geometry('box', geo)
    assert 'box' in cache.list_geometry()
    loaded = cache.load_geometry('box')
    assert loaded.mesh.md5() == geo.mesh.md5()
    assert cache.get_geometry_hash('box') == geo.mesh.md5()


def test_geometry_missing(cache_dir):
    with pytest.raises(GeometryNotFoundError):
        Cache(cache_dir).load_geometry('nope')


def test_default_geometry(cache_dir):
    cache = Cache(cache_dir)
    geo = _geometry()
    cache.save_geometry('box', geo)
    cache.set_default_geometry('box')
    assert cache.load_default_geometry().mesh.md5() == geo.mesh.md5()
    # re-pointing the default works
    cache.save_geometry('box2', geo)
    cache.set_default_geometry('box2')


def test_bvh_save_load(cache_dir):
    cache = Cache(cache_dir)
    geo = _geometry()
    h = geo.mesh.md5()
    assert not cache.exist_bvh(h)
    bvh = make_recursive_grid_bvh(geo.mesh)
    cache.save_bvh(bvh, h)
    assert cache.exist_bvh(h)
    loaded = cache.load_bvh(h)
    assert (loaded.nodes == bvh.nodes).all()
    with pytest.raises(BVHNotFoundError):
        cache.load_bvh(h, 'other')


def test_loader_builds_and_caches(cache_dir):
    from chroma_tpu.loader import create_geometry_from_obj
    geo = create_geometry_from_obj(make.cube(1.0), cache_dir=cache_dir)
    assert geo.bvh is not None
    # second load hits the cache
    geo2 = create_geometry_from_obj(make.cube(1.0), cache_dir=cache_dir)
    assert (geo2.bvh.nodes == geo.bvh.nodes).all()
