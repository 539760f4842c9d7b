"""Propagation sanity tests (reference: test/test_propagation.py)."""
import numpy as np

from chroma_tpu import event
from chroma_tpu.geometry import Geometry, Solid, vacuum
from chroma_tpu.loader import create_geometry_from_obj
from chroma_tpu.make import box
from chroma_tpu.sim import Simulation
import pytest


def _axis_photons(nphotons=2000):
    "Axis-aligned photons at the origin — normal-incidence stress test."
    pos = np.tile([0, 0, 0], (nphotons, 1)).astype(np.float32)
    dir = np.tile([0, 0, 1], (nphotons, 1)).astype(np.float32)
    pol = np.zeros_like(pos)
    phi = np.random.uniform(0, 2 * np.pi, nphotons).astype(np.float32)
    pol[:, 0] = np.cos(phi)
    pol[:, 1] = np.sin(phi)
    t = np.zeros(nphotons, dtype=np.float32)
    wavelengths = np.full(nphotons, 400.0, np.float32)
    return event.Photons(pos=pos, dir=dir, pol=pol, t=t,
                         wavelengths=wavelengths)


@pytest.mark.slow
def test_abort():
    """Photons hitting triangles at exactly normal incidence must not
    produce NaNs or NAN_ABORT flags."""
    np.random.seed(0)
    cube = Geometry(vacuum)
    cube.add_solid(Solid(box(100, 100, 100), vacuum, vacuum))
    geo = create_geometry_from_obj(cube, update_bvh_cache=False)
    sim = Simulation(geo, seed=1)

    photons = _axis_photons()

    # one step
    ev = next(sim.simulate([photons], keep_photons_end=True, max_steps=1))
    pe = ev.photons_end
    for arr in (pe.pos, pe.dir, pe.pol, pe.t, pe.wavelengths):
        assert not np.isnan(arr).any()

    # ten steps
    ev = next(sim.simulate([_axis_photons()], keep_photons_end=True,
                           max_steps=10))
    aborted = (ev.photons_end.flags & np.uint32(event.NAN_ABORT)) > 0
    assert not aborted.any()


def test_black_box_absorbs_everything():
    from chroma_tpu.geometry import Surface, Material
    water = Material('w')
    water.set('refractive_index', 1.33)
    water.set('absorption_length', 1e9)
    water.set('scattering_length', 1e9)
    black = Surface('black')
    black.set('absorb', 1)

    cube = Geometry(vacuum)
    cube.add_solid(Solid(box(1000, 1000, 1000), water, vacuum,
                         surface=black))
    geo = create_geometry_from_obj(cube, update_bvh_cache=False)
    sim = Simulation(geo, seed=2)

    photons = _axis_photons(1000)
    ev = next(sim.simulate([photons], keep_photons_end=True, max_steps=10))
    flags = ev.photons_end.flags
    absorbed = (flags & np.uint32(event.SURFACE_ABSORB)) > 0
    assert absorbed.all()
    # all photons traveled 500mm in n=1.33 medium
    expected_t = 500.0 / (299.792458 / 1.33)
    np.testing.assert_allclose(ev.photons_end.t, expected_t, rtol=1e-4)
