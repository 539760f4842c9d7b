"""Photon-track recording (reference: gpu/photon.py photon_tracking,
sim.py:117-129 track regrouping)."""
import numpy as np

from chroma_tpu.geometry import Geometry, Solid, Material, Surface, vacuum
from chroma_tpu.loader import create_geometry_from_obj
from chroma_tpu.make import box
from chroma_tpu.sim import Simulation
from chroma_tpu.generator import photon_bomb
import pytest


@pytest.mark.slow
def test_photon_tracks():
    water = Material('w')
    water.set('refractive_index', 1.33)
    water.set('absorption_length', 1e5)
    water.set('scattering_length', 1e5)
    mirror = Surface('mirror')
    mirror.set('reflect_specular', 0.7)
    mirror.set('absorb', 0.3)

    geo = Geometry(vacuum)
    geo.add_solid(Solid(box(1000, 1000, 1000), water, vacuum,
                        surface=mirror))
    geo = create_geometry_from_obj(geo, update_bvh_cache=False)
    sim = Simulation(geo, seed=21, photon_tracking=True)

    np.random.seed(0)
    ev = next(sim.simulate(photon_bomb(64, 400.0, (0, 0, 0)),
                           keep_photons_end=True, max_steps=12))
    assert ev.photon_tracks is not None
    assert len(ev.photon_tracks) == 64

    lengths = [len(t) for t in ev.photon_tracks]
    assert max(lengths) >= 2  # mirror bounces give multi-step tracks

    # each track's positions must lie on the box surface (|coord| = 500
    # on at least one axis) and be causally ordered in time
    track = ev.photon_tracks[int(np.argmax(lengths))]
    assert (np.diff(track.t) >= 0).all()
    on_wall = (np.abs(np.abs(track.pos) - 500.0) < 1.0).any(axis=1)
    assert on_wall.all()


def test_tracking_with_mesh_warns_and_tracks(caplog):
    """photon_tracking with mesh= must not silently drop the mesh: it
    warns and still produces tracks single-device (VERDICT r3 item 8)."""
    import logging
    from chroma_tpu.parallel import photon_mesh

    water = Material('w')
    water.set('refractive_index', 1.33)
    water.set('absorption_length', 1e5)
    water.set('scattering_length', 1e5)
    absorber = Surface('absorber')
    absorber.set('absorb', 1.0)
    geo = Geometry(vacuum)
    geo.add_solid(Solid(box(1000, 1000, 1000), water, vacuum,
                        surface=absorber))
    geo = create_geometry_from_obj(geo, update_bvh_cache=False)
    sim = Simulation(geo, seed=5, photon_tracking=True,
                     mesh=photon_mesh())

    with caplog.at_level(logging.WARNING, logger='chroma_tpu'):
        ev = next(sim.simulate(photon_bomb(32, 400.0, (0, 0, 0)),
                               max_steps=4))
    assert any('photon_tracking' in r.getMessage()
               for r in caplog.records)
    assert ev.photon_tracks is not None
    assert len(ev.photon_tracks) == 32
