"""chroma.gpu-compatible facade round trip (reference call-site shapes,
chroma/gpu/__init__.py API)."""
import numpy as np
import pytest

from chroma_tpu.geometry import Solid, vacuum, Material, Surface
from chroma_tpu.detector import Detector
from chroma_tpu.loader import create_geometry_from_obj
from chroma_tpu.make import box
from chroma_tpu.generator import photon_bomb
from chroma_tpu import gpu, event


@pytest.fixture(scope='module')
def detector():
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
    return create_geometry_from_obj(det, update_bvh_cache=False)


@pytest.mark.slow
def test_reference_style_simulation_loop(detector):
    "The reference's manual GPU-layer idiom ports with an import change."
    np.random.seed(3)
    context = gpu.create_cuda_context()
    gpu_geometry = gpu.GPUDetector(detector)
    rng_states = gpu.get_rng_states(512 * 64, seed=7)

    gpu_photons = gpu.GPUPhotons(photon_bomb(2048, 400.0, (0, 0, 0)))
    gpu_photons.propagate(gpu_geometry, rng_states, max_steps=20)

    photons_end = gpu_photons.get()
    terminal = (photons_end.flags & np.uint32(event.TERMINAL_FLAGS)) != 0
    assert terminal.all()

    hits = gpu_photons.get_flat_hits(gpu_geometry)
    assert len(hits) > 500  # ~50% detection efficiency
    assert (hits.flags & np.uint32(event.SURFACE_DETECT)).all()

    daq = gpu.GPUDaq(gpu_geometry)
    daq.begin_acquire()
    daq.acquire(gpu_photons, rng_states)
    channels = daq.end_acquire().get()
    assert channels.hit[0]
    assert channels.q[0] > 100

    detected = gpu_photons.select(event.SURFACE_DETECT)
    assert len(detected) == len(hits)
    context.pop()


def test_gpu_pdf_classes(detector):
    np.random.seed(4)
    gpu_geometry = gpu.GPUDetector(detector)
    key = gpu.get_rng_states(1, seed=9)

    gpu_photons = gpu.GPUPhotons(photon_bomb(512, 400.0, (0, 0, 0)))
    gpu_photons.propagate(gpu_geometry, key, max_steps=20)
    daq = gpu.GPUDaq(gpu_geometry, ndaq=4)
    daq.begin_acquire()
    daq.acquire(gpu_photons, key)
    channels = daq.end_acquire()

    pdf = gpu.GPUPDF()
    pdf.setup_pdf(gpu_geometry, 20, (-10, 30), 16, (-0.5, 300))
    pdf.add_hits_to_pdf(channels)
    hitcount, hist = pdf.get_pdfs()
    assert hitcount.sum() == hist.sum()
    assert hitcount.sum() > 0

    # the observed event must be a single readout (ndaq=1)
    daq1 = gpu.GPUDaq(gpu_geometry)
    daq1.begin_acquire()
    daq1.acquire(gpu_photons, key)
    obs = daq1.end_acquire().get()
    pdf.setup_pdf_eval(gpu_geometry, obs, 0.5, (-10, 30), 1, (-0.5, 300),
                       min_bin_content=5)
    pdf.accumulate_pdf_eval(channels)
    hitcount2, values, uncert = pdf.get_pdf_eval()
    assert hitcount2[0] > 0

    kpdf = gpu.GPUKernelPDF()
    kpdf.setup_moments(gpu_geometry, (-10, 30), (-0.5, 300))
    kpdf.accumulate_moments(channels)
    kpdf.compute_bandwidth(obs.hit, obs.t, obs.q)
    kpdf.setup_kernel(obs.hit, obs.t, obs.q)
    kpdf.accumulate_kernel(channels)
    hc, vals, _ = kpdf.get_kernel_eval()
    assert hc[0] > 0
