"""Deterministic RNG: a given (seed, chunking) reproduces photon
histories exactly, and different chunkings are distribution-identical
(counter-based keys; matches the reference's seed-level reproducibility,
SURVEY §5.4)."""
import numpy as np
import jax

from chroma_tpu.geometry import Geometry, Solid, Material, Surface, vacuum
from chroma_tpu.loader import create_geometry_from_obj
from chroma_tpu.make import box
from chroma_tpu.ops.types import build_geometry_arrays
from chroma_tpu.ops.propagate import propagate, photon_state_from_host
from chroma_tpu.generator import photon_bomb
import pytest


@pytest.mark.slow
def test_chunking_invariance():
    water = Material('water')
    water.set('refractive_index', 1.33)
    water.set('absorption_length', 3000.0)
    water.set('scattering_length', 3000.0)
    gray = Surface('gray')
    gray.set('absorb', 0.3)
    gray.set('reflect_diffuse', 0.4)
    gray.set('reflect_specular', 0.3)

    geo = Geometry(vacuum)
    geo.add_solid(Solid(box(2000, 2000, 2000), water, vacuum,
                        surface=gray))
    geo = create_geometry_from_obj(geo, update_bvh_cache=False)
    ga = build_geometry_arrays(geo)

    np.random.seed(0)
    photons = photon_bomb(2000, 450.0, (0, 0, 0))
    state = photon_state_from_host(photons)
    key = jax.random.key(123)

    # exact reproducibility for a fixed chunking
    a = jax.tree_util.tree_map(np.asarray, propagate(
        state, ga, key, max_steps=60, step_chunk=4))
    b = jax.tree_util.tree_map(np.asarray, propagate(
        state, ga, key, max_steps=60, step_chunk=4))
    np.testing.assert_array_equal(a.flags, b.flags)
    np.testing.assert_allclose(a.pos, b.pos)
    np.testing.assert_allclose(a.t, b.t)

    # without compaction the lane layout is fixed, so ANY chunking gives
    # identical histories
    c = jax.tree_util.tree_map(np.asarray, propagate(
        state, ga, key, max_steps=60, step_chunk=16, compact=False))
    d = jax.tree_util.tree_map(np.asarray, propagate(
        state, ga, key, max_steps=60, step_chunk=7, compact=False))
    np.testing.assert_array_equal(c.flags, d.flags)
    np.testing.assert_allclose(c.t, d.t, rtol=1e-5)

    # across chunkings (with compaction) distributions must agree
    import chroma_tpu.event as event
    for field_bit in (event.SURFACE_ABSORB, event.RAYLEIGH_SCATTER,
                      event.BULK_ABSORB):
        fa = ((a.flags & np.uint32(field_bit)) > 0).mean()
        fc = ((c.flags & np.uint32(field_bit)) > 0).mean()
        assert abs(fa - fc) < 0.05
