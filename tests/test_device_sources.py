"""Device-resident photon sources: Simulation and the gpu facade accept
PhotonState inputs without host round trips (reference:
chroma/gpu/photon.py:66-95, sim.py:156-223; test modeled on the
reference's test_gpu_photon_gpu_input.py)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from chroma_tpu import event, gpu
from chroma_tpu.geometry import Solid
from chroma_tpu.detector import Detector
from chroma_tpu.demo.optics import r7081hqe_photocathode, vacuum
from chroma_tpu.loader import create_geometry_from_obj
from chroma_tpu.make import box
from chroma_tpu.ops.photon import PhotonState
from chroma_tpu.ops.propagate import photon_state_from_host
from chroma_tpu.sim import Simulation


@pytest.fixture(scope='module')
def sim():
    cube = Detector(vacuum)
    cube.add_pmt(Solid(box(10.0, 10, 10), vacuum, vacuum,
                       surface=r7081hqe_photocathode))
    cube.set_time_dist_gaussian(1.2, -6.0, 6.0)
    cube.set_charge_dist_gaussian(1.0, 0.1, 0.5, 1.5)
    geo = create_geometry_from_obj(cube, update_bvh_cache=False)
    return Simulation(geo, seed=9)


def _device_bomb(n, seed):
    key = jax.random.key(seed)
    k1, k2 = jax.random.split(key)
    from chroma_tpu.ops.sample import uniform_sphere
    d = uniform_sphere(k1, (n,))
    pol = jnp.cross(uniform_sphere(k2, (n,)), d)
    pol = pol / jnp.linalg.norm(pol, axis=1, keepdims=True)
    return PhotonState(
        pos=jnp.zeros((n, 3), jnp.float32), dir=d, pol=pol,
        wavelength=jnp.full(n, 400.0, jnp.float32),
        t=jnp.zeros(n, jnp.float32), weight=jnp.ones(n, jnp.float32),
        flags=jnp.zeros(n, jnp.uint32),
        last_hit_triangle=jnp.full(n, -1, jnp.int32),
        evidx=jnp.zeros(n, jnp.uint32),
        cur_mat=jnp.full(n, -1, jnp.int32))


@pytest.mark.slow
def test_simulate_accepts_device_states(sim):
    states = [_device_bomb(512, s) for s in (1, 2)]
    evs = list(sim.simulate(iter(states), run_daq=True,
                            keep_photons_end=True, max_steps=40))
    assert len(evs) == 2
    for i, ev in enumerate(evs):
        assert len(ev.photons_end) == 512
        flags = ev.photons_end.flags
        assert (flags != 0).all()          # everything terminated
        assert (ev.photons_end.evidx == i).all()
        assert int((flags & np.uint32(event.SURFACE_DETECT) > 0).sum()) > 0


def test_gpu_photons_device_input_and_ncopies(sim):
    st = _device_bomb(256, 3)
    gp = gpu.GPUPhotons(st, ncopies=3)
    assert len(gp) == 768
    assert gp.true_nphotons == 256
    # copies are replicas of the originals
    assert np.array_equal(np.asarray(gp.state.dir[:256]),
                          np.asarray(gp.state.dir[256:512]))


@pytest.mark.slow
def test_flat_hits_device_path_matches_host(sim):
    st = _device_bomb(2048, 5)
    gg = gpu.GPUDetector(sim.detector)
    gp = gpu.GPUPhotons(st)
    gp.propagate(gg, gpu.get_rng_states(1, seed=4), max_steps=40)

    hits = gp.get_flat_hits(gg)
    # reference computation on host
    host = gp.get()
    from chroma_tpu.ops import daq as daq_ops
    channel = daq_ops.photon_channels(
        host, sim.detector.solid_id,
        np.asarray(sim.detector.solid_id_to_channel_index))
    assert len(hits) == int((channel >= 0).sum())
    assert len(hits) > 0
    np.testing.assert_array_equal(np.sort(hits.t),
                                  np.sort(host.t[channel >= 0]))

    detected = gp.select(event.SURFACE_DETECT)
    assert len(detected) == int(
        (host.flags & np.uint32(event.SURFACE_DETECT) > 0).sum())


@pytest.mark.slow
def test_lazy_hits_semantics(sim):
    """LazyHits: free len(), device arrays until first field touch, one
    materialization that survives slicing/join/pickle."""
    import pickle
    from chroma_tpu.ops import daq as daq_ops

    st = _device_bomb(2048, 5)
    gg = gpu.GPUDetector(sim.detector)
    gp = gpu.GPUPhotons(st)
    gp.propagate(gg, gpu.get_rng_states(1, seed=4), max_steps=40)

    hits = gp.get_flat_hits(gg)
    assert isinstance(hits, daq_ops.LazyHits)
    assert isinstance(hits, event.Photons)
    n = len(hits)
    assert n > 0
    assert hits.device_state() is not None      # still device-resident
    sub, ch = hits.device_state()
    assert len(sub.pos) >= n                    # gather-width packing

    t = hits.t                                  # first touch materializes
    assert hits.device_state() is None
    assert len(t) == n and np.isfinite(t).all()
    assert (hits.channel < sim.detector.num_channels()).all()

    # slicing yields a plain Photons of the right size
    part = hits[: n // 2]
    assert isinstance(part, event.Photons) and len(part) == n // 2

    # pickling a FRESH lazy object ships plain numpy
    hits2 = gp.get_flat_hits(gg)
    blob = pickle.dumps(hits2)
    back = pickle.loads(blob)
    assert type(back) is event.Photons and len(back) == len(hits2)
    np.testing.assert_array_equal(np.sort(back.t), np.sort(hits.t))
