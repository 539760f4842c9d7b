"""Rayleigh scattering angular distribution
(reference: test/test_rayleigh.py, ROOT fit replaced by a chi-square
test against the analytic (1+cos^2)sin distribution)."""
import numpy as np

from chroma_tpu import event
from chroma_tpu.geometry import Geometry, Solid
from chroma_tpu.loader import create_geometry_from_obj
from chroma_tpu.make import box
from chroma_tpu.sim import Simulation
from chroma_tpu.demo.optics import water


def test_angular_distribution_polarized():
    np.random.seed(0)
    # large box: water's scattering length at 400nm is ~70m, so a few
    # meters of travel gives a few thousand scatters from 100k photons
    cube = Geometry(water)
    cube.add_solid(Solid(box(5000, 5000, 5000), water, water))
    geo = create_geometry_from_obj(cube, update_bvh_cache=False)
    sim = Simulation(geo, seed=3)

    nphotons = 100000
    pos = np.tile([0, 0, 0], (nphotons, 1)).astype(np.float32)
    dir = np.tile([0, 0, 1], (nphotons, 1)).astype(np.float32)
    pol = np.tile([1.0, 0.0, 0.0], (nphotons, 1)).astype(np.float32)
    t = np.zeros(nphotons, dtype=np.float32)
    wavelengths = np.full(nphotons, 400.0, np.float32)
    photons = event.Photons(pos=pos, dir=dir, pol=pol, t=t,
                            wavelengths=wavelengths)

    ev = next(sim.simulate([photons], keep_photons_end=True, max_steps=1))
    pe = ev.photons_end
    aborted = (pe.flags & np.uint32(event.NAN_ABORT)) > 0
    assert not aborted.any()

    scattered = (pe.flags & np.uint32(event.RAYLEIGH_SCATTER)) > 0
    assert scattered.sum() > 1000  # ~4000 expected in 100mm of water

    cos_scatter = (dir[scattered] * pe.dir[scattered]).sum(axis=1)
    theta = np.arccos(np.clip(cos_scatter, -1, 1))

    # chi-square against (1 + cos^2 theta) sin(theta), GEANT4 phys. ref.
    nbins = 20
    counts, edges = np.histogram(theta, bins=nbins, range=(0, np.pi))
    centers = 0.5 * (edges[:-1] + edges[1:])
    expected = (1 + np.cos(centers) ** 2) * np.sin(centers)
    expected *= counts.sum() / expected.sum()

    keep = expected > 10
    chi2 = (((counts - expected) ** 2 / expected)[keep]).sum()
    ndf = int(keep.sum())
    # generous 5-sigma-ish bound; catches any systematic shape error
    assert chi2 < ndf + 5 * np.sqrt(2 * ndf), (chi2, ndf)
