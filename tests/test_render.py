"""Renderer tests: depth peeling, shading, headless snapshot."""
import numpy as np
import jax.numpy as jnp

from chroma_tpu import make
from chroma_tpu.loader import create_geometry_from_obj
from chroma_tpu.ops.types import build_geometry_arrays
from chroma_tpu.ops.render import render, distances
from chroma_tpu.camera import snapshot
from chroma_tpu.tools import from_film
import pytest


def _cube_geo(color=0x80FF0000):  # semi-transparent red
    from chroma_tpu.geometry import Solid, vacuum
    from chroma_tpu.geometry import Geometry
    geo = Geometry()
    geo.add_solid(Solid(make.cube(2.0), vacuum, vacuum, color=color))
    return create_geometry_from_obj(geo, update_bvh_cache=False)


def test_render_hits_and_misses():
    geo = _cube_geo()
    ga = build_geometry_arrays(geo)
    origin = jnp.array([[0, -10, 0], [0, -10, 100]], dtype=jnp.float32)
    direction = jnp.array([[0, 1, 0], [0, 1, 0]], dtype=jnp.float32)
    pixels = np.asarray(render(origin, direction, ga,
                               bg_color=0xFF101010))
    # first ray hits the cube: red-dominated pixel
    r = (pixels[0] >> 16) & 0xFF
    b = pixels[0] & 0xFF
    assert r > b
    # second ray misses: exact background
    assert pixels[1] == 0xFF101010


def test_distances():
    geo = _cube_geo()
    ga = build_geometry_arrays(geo)
    origin, direction = from_film(position=(0, -10, 0), size=(8, 6),
                                  width=2.0)
    d = np.asarray(distances(jnp.asarray(origin, jnp.float32),
                             jnp.asarray(direction, jnp.float32), ga))
    assert np.isfinite(d).any()
    assert abs(np.nanmin(np.where(np.isfinite(d), d, np.nan)) - 9.0) < 0.1


@pytest.mark.slow
def test_snapshot():
    geo = _cube_geo()
    img = snapshot(geo, size=(64, 48))
    assert img.shape == (48, 64, 3)
    assert img.dtype == np.uint8
    # the cube should occupy some of the frame with non-background pixels
    assert (img != img[0, 0]).any()
