"""Headless tests of the viewer feature set (reference: chroma/camera.py
photon tracks :882-928, BVH layer display :475-488, anaglyph :330-420,
streaming event source)."""
import numpy as np
import pytest

from chroma_tpu import make
from chroma_tpu.camera import (CameraPose, EventSource, draw_tracks,
                               bvh_layer_geometry, snapshot,
                               snapshot_anaglyph, _scene_pose)
from chroma_tpu.geometry import Geometry, Solid
from chroma_tpu.demo.optics import water, glass
from chroma_tpu.loader import create_geometry_from_obj


@pytest.fixture(scope='module')
def geometry():
    geo = Geometry(water)
    geo.add_solid(Solid(make.box(100.0, 100.0, 100.0), glass, water,
                        color=0xFF3366))
    return create_geometry_from_obj(geo, update_bvh_cache=False)


def test_projection_inverts_rays(geometry):
    "Projecting a point along a film ray lands on that ray's pixel."
    pose, scale, center = _scene_pose(geometry)
    size = (64, 48)
    rays = pose.rays(size)
    pos = np.asarray(rays.pos)
    dirs = np.asarray(rays.dir)
    pick = [0, 1000, 2345, size[0] * size[1] - 1]
    pts = pos[pick] + 500.0 * dirs[pick]
    px, py, vis = pose.project(pts, size)
    assert vis.all()
    for n, p in enumerate(pick):
        assert abs(px[n] - p // size[1]) < 1.0
        assert abs(py[n] - p % size[1]) < 1.0


def test_draw_tracks_marks_pixels(geometry):
    from chroma_tpu.event import Photons
    pose, scale, center = _scene_pose(geometry)
    size = (64, 48)
    image = np.zeros((size[1], size[0], 3), np.uint8)
    track = Photons(pos=np.array([center, center + [30.0, 0, 0]]),
                    dir=np.tile([0.0, 0, 1], (2, 1)),
                    pol=np.tile([1.0, 0, 0], (2, 1)),
                    wavelengths=np.array([450.0, 550.0]),
                    t=np.zeros(2))
    out = draw_tracks(image, [track], pose, size)
    assert (out > 0).any()


@pytest.mark.slow
def test_bvh_layer_geometry(geometry):
    from chroma_tpu.make import box as _box
    layer_geo = bvh_layer_geometry(geometry, 1)
    per_box = len(_box(1.0, 1.0, 1.0).triangles)
    n_layer = len(geometry.bvh.get_layer(1))
    assert len(layer_geo.mesh.triangles) == per_box * n_layer
    # layer boxes cover the original geometry's extent
    lo, hi = layer_geo.mesh.get_bounds()
    glo, ghi = geometry.mesh.get_bounds()
    assert (lo <= glo + 1.0).all() and (hi >= ghi - 1.0).all()
    img = snapshot(layer_geo, size=(48, 32))
    assert img.shape == (32, 48, 3)


@pytest.mark.slow
def test_anaglyph_differs_between_channels(geometry):
    img = snapshot_anaglyph(geometry, size=(48, 32))
    assert img.shape == (32, 48, 3)
    mono = snapshot(geometry, size=(48, 32))
    # left/right eyes see slightly different reds
    assert (img[..., 0] != mono[..., 0]).any()


def test_event_source_streams():
    def gen():
        for i in range(5):
            yield 'ev%d' % i

    src = EventSource(gen())
    assert src.current() == 'ev0'
    assert src.next() == 'ev1'
    assert src.jump(3) == 'ev3'
    assert src.prev() == 'ev2'
    # walking past the end stays on the last event
    for _ in range(10):
        last = src.next()
    assert last == 'ev4'
    # list input still works
    src2 = EventSource(['a', 'b'])
    assert src2.current() == 'a' and src2.next() == 'b'
    assert src2.next() == 'b'
