"""PMT DAQ time/charge distributions (reference: test/test_detector.py)."""
import numpy as np
import pytest

from chroma_tpu.geometry import Solid, vacuum
from chroma_tpu.loader import create_geometry_from_obj
from chroma_tpu.detector import Detector
from chroma_tpu.make import box
from chroma_tpu.sim import Simulation
from chroma_tpu.event import Photons
from chroma_tpu.demo.optics import r7081hqe_photocathode


@pytest.fixture(scope='module')
def sim():
    cube = Detector(vacuum)
    cube.add_pmt(Solid(box(10.0, 10, 10), vacuum, vacuum,
                       surface=r7081hqe_photocathode))
    cube.set_time_dist_gaussian(1.2, -6.0, 6.0)
    cube.set_charge_dist_gaussian(1.0, 0.1, 0.5, 1.5)
    geo = create_geometry_from_obj(cube, update_bvh_cache=False)
    return Simulation(geo, seed=5)


def _one_photon(t0=100.0):
    pos = np.zeros((1, 3), dtype=np.float32)
    dir = np.array([[0, 0, 1]], dtype=np.float32)
    phi = np.random.uniform(0, 2 * np.pi, 1).astype(np.float32)
    pol = np.column_stack([np.cos(phi), np.sin(phi),
                           np.zeros(1, np.float32)])
    return Photons(pos=pos, dir=dir, pol=pol,
                   wavelengths=np.full(1, 400.0, np.float32),
                   t=np.full(1, t0, np.float32))


@pytest.mark.slow
def test_time_and_charge_distributions(sim):
    """Hit-time std and charge mean/std must match the configured PMT
    distributions (single-photoelectron events)."""
    np.random.seed(0)
    hit_times = []
    hit_charges = []
    for ev in sim.simulate((_one_photon() for _ in range(1000)),
                           run_daq=True):
        if ev.channels.hit[0]:
            hit_times.append(ev.channels.t[0])
            hit_charges.append(ev.channels.q[0])

    hit_times = np.array(hit_times)
    hit_charges = np.array(hit_charges)
    assert len(hit_times) > 200  # ~32% QE at 400nm

    assert abs(hit_times.std() - 1.2) < 0.1
    assert abs(hit_charges.mean() - 1.0) < 0.1
    assert abs(hit_charges.std() - 0.1) < 0.1
