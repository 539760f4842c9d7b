"""Interaction-length traversal pruning must not change any photon history
in a closed geometry: the pruned query hides only boundaries that lie
beyond the point where the photon scatters or is absorbed, and the
transport reuses the same pre-sampled uniforms (ops/photon.py
propagate_step). Verified bitwise against the unpruned engine."""
import numpy as np
import jax
import pytest

from chroma_tpu import event
from chroma_tpu.geometry import Geometry, Solid
from chroma_tpu.demo.optics import water, glass, black_surface
from chroma_tpu.loader import create_geometry_from_obj
from chroma_tpu.make import box
from chroma_tpu.ops.types import build_geometry_arrays
from chroma_tpu.ops.propagate import photon_state_from_host, run_steps


@pytest.fixture(scope='module')
def geometry():
    geo = Geometry(water)
    # closed absorbing shell with a refracting glass cube inside: photons
    # bulk-scatter and absorb in water, refract/reflect at glass, and die
    # on the shell -- every code path the pruned traversal touches
    geo.add_solid(Solid(box(2000.0, 2000.0, 2000.0), water, water,
                        surface=black_surface))
    geo.add_solid(Solid(box(300.0, 300.0, 300.0), glass, water))
    return build_geometry_arrays(create_geometry_from_obj(
        geo, update_bvh_cache=False))


def _bomb(n, seed):
    rs = np.random.RandomState(seed)
    d = rs.randn(n, 3)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pol = np.cross(rs.randn(n, 3), d)
    pol /= np.linalg.norm(pol, axis=1, keepdims=True)
    ph = event.Photons(pos=np.zeros((n, 3)), dir=d, pol=pol,
                       wavelengths=rs.uniform(300, 700, n),
                       t=np.zeros(n))
    return photon_state_from_host(ph)


@pytest.mark.slow
def test_pruned_histories_bitwise_equal(geometry):
    n = 4096
    key = jax.random.key(11)
    a, _, _ = run_steps(_bomb(n, 0), geometry, key, 0, 40, prune=True)
    b, _, _ = run_steps(_bomb(n, 0), geometry, key, 0, 40, prune=False)
    assert np.array_equal(np.asarray(a.flags), np.asarray(b.flags))
    assert np.array_equal(np.asarray(a.pos), np.asarray(b.pos))
    assert np.array_equal(np.asarray(a.t), np.asarray(b.t))
    assert np.array_equal(np.asarray(a.wavelength), np.asarray(b.wavelength))
    # and the run terminated across every terminal class, so the equality
    # actually exercised absorption, scattering, and surface deaths
    flags = np.asarray(a.flags)
    assert (flags & np.uint32(event.BULK_ABSORB)).any()
    assert (flags & np.uint32(event.SURFACE_ABSORB)).any()
    assert (flags & np.uint32(event.RAYLEIGH_SCATTER)).any()


def test_medium_tracking_resolves(geometry):
    "After a step every surviving photon knows its medium."
    n = 1024
    key = jax.random.key(3)
    ph, _, _ = run_steps(_bomb(n, 1), geometry, key, 0, 4, prune=True)
    cur = np.asarray(ph.cur_mat)
    alive = np.asarray(ph.alive)
    assert (cur[alive] >= 0).all()
