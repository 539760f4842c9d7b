"""Event batching: multiple events propagate in one device launch and
results route back to the right Event (reference: sim.py:54-154)."""
import numpy as np

from chroma_tpu.geometry import Solid, vacuum, Material, Surface
from chroma_tpu.detector import Detector
from chroma_tpu.loader import create_geometry_from_obj
from chroma_tpu.make import box
from chroma_tpu.sim import Simulation
from chroma_tpu.generator import photon_bomb
from chroma_tpu import event
import pytest


@pytest.mark.slow
def test_multi_event_batch_routing():
    water = Material('w')
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
    sim = Simulation(geo, seed=31)

    np.random.seed(0)
    sizes = [100, 300, 200]
    events = [event.Event(id=i, photons_beg=photon_bomb(n, 400.0,
                                                        (0, 0, 0)))
              for i, n in enumerate(sizes)]

    out = list(sim.simulate(iter(events), keep_photons_end=True,
                            run_daq=True, photons_per_batch=10000))
    assert len(out) == 3
    for ev, n in zip(out, sizes):
        assert len(ev.photons_end) == n
        # all flat hits for this event carry its batch index
        if len(ev.flat_hits):
            assert (ev.flat_hits.evidx == out.index(ev)).all()
        # roughly half the photons detect on the single channel
        assert ev.channels.hit[0]
        assert 0.2 * n < ev.channels.q[0] < 0.8 * n
        assert 0 in ev.hits
        assert len(ev.hits[0]) == len(ev.flat_hits)
