"""PDF accumulation + likelihood path (reference test strategy:
test/test_pdf.py, with the Simulation PDF API restored)."""
import numpy as np
import pytest

from chroma_tpu.geometry import Solid, vacuum, Material, Surface
from chroma_tpu.detector import Detector
from chroma_tpu.loader import create_geometry_from_obj
from chroma_tpu.make import box
from chroma_tpu.sim import Simulation
from chroma_tpu.generator import photon_bomb
from chroma_tpu import event


@pytest.fixture(scope='module')
def sim():
    water = Material('water')
    water.set('refractive_index', 1.33)
    water.set('absorption_length', 1e5)
    water.set('scattering_length', 1e5)
    pc = Surface('pc')
    pc.set('detect', 0.5)
    pc.set('absorb', 0.5)

    det = Detector(vacuum)
    det.add_pmt(Solid(box(1000.0, 1000, 1000), water, vacuum, surface=pc))
    det.set_time_dist_gaussian(1.2, -6.0, 6.0)
    det.set_charge_dist_gaussian(1.0, 0.1, 0.5, 1.5)
    geo = create_geometry_from_obj(det, update_bvh_cache=False)
    return Simulation(geo, seed=11)


def _events(n, nphotons=500):
    for _ in range(n):
        yield event.Event(photons_beg=photon_bomb(nphotons, 400.0,
                                                  (0, 0, 0)))


@pytest.mark.slow
def test_create_pdf(sim):
    np.random.seed(0)
    hitcount, pdf = sim.create_pdf(_events(4, nphotons=50), 32,
                                   (0, 50), 16, (-0.5, 49.5))
    assert hitcount.shape == (1,)
    assert pdf.shape == (1, 32, 16)
    # every DAQ readout that was in range landed in the histogram
    assert pdf.sum() == hitcount.sum()
    assert hitcount[0] > 0


@pytest.mark.slow
def test_eval_pdf_and_likelihood(sim):
    np.random.seed(1)
    # make an observed event
    obs = next(sim.simulate(photon_bomb(500, 400.0, (0, 0, 0)),
                            run_daq=True, keep_photons_end=True))
    assert obs.channels.hit[0]

    hitcount, pdf_value, pdf_uncert = sim.eval_pdf(
        obs.channels, _events(6), 0.5, (-0.5, 20.0), 1, (-0.5, 7.5),
        nreps=1, ndaq=4, min_bin_content=10)
    assert hitcount[0] > 0
    assert pdf_value[0] > 0  # observed time is typical -> finite density

    # full negative log likelihood through the Likelihood facade
    from chroma_tpu.likelihood import Likelihood
    lk = Likelihood(sim, obs, trange=(-0.5, 20.0))
    nll = lk.eval(_events(50), nevals=6, nreps=1, ndaq=4)
    assert np.isfinite(nll.nominal_value)


def test_kernel_pdf(sim):
    np.random.seed(2)
    obs = next(sim.simulate(photon_bomb(500, 400.0, (0, 0, 0)),
                            run_daq=True))
    sim.setup_kernel(obs.channels, _events(4), (-10.0, 20.0), (-0.5, 49.5),
                     nreps=1, ndaq=4)
    hitcount, pdf_values, _ = sim.eval_kernel(obs.channels, _events(4),
                                              (-10.0, 20.0), (-0.5, 49.5),
                                              nreps=1, ndaq=4)
    assert hitcount[0] > 0
    assert pdf_values[0] > 0
