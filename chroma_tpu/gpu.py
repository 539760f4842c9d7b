"""Drop-in naming compatibility with the reference's chroma.gpu layer.

The reference exposes device runtime classes as chroma.gpu.GPUGeometry,
GPUPhotons, GPUDaq, GPUPDF... (reference: chroma/gpu/__init__.py). The
TPU equivalents live in chroma_tpu.ops as functional modules; this facade
wraps them in the familiar object API so reference call sites port with
an import change.
"""
from __future__ import annotations

import numpy as np
import jax

from chroma_tpu.ops.types import build_geometry_arrays
from chroma_tpu.ops.propagate import (propagate, photon_state_from_host,
                                      photon_state_to_host)
from chroma_tpu.ops import daq as daq_ops
from chroma_tpu.ops import pdf as pdf_ops
from chroma_tpu.ops.photon import PhotonState


@jax.jit
def _flag_pack(state, flag):
    "Front-pack lanes whose history matches `flag` (see daq.flat_hit_pack)."
    import jax.numpy as jnp
    match = (state.flags & flag) != 0
    mi = match.astype(jnp.int32)
    n = jnp.sum(mi)
    fwd = jnp.cumsum(mi) - 1
    bwd = n + jnp.cumsum(1 - mi) - 1
    dest = jnp.where(match, fwd, bwd)
    perm = jnp.zeros_like(dest).at[dest].set(
        jnp.arange(dest.shape[0], dtype=dest.dtype))
    return perm, n


def _select_flag(state, flag):
    "Jitted select: (packed substate of pow-2 size >= count, count)."
    perm, n_dev = _flag_pack(state, flag)
    n = int(n_dev)
    m = 1
    while m < max(n, 1):
        m <<= 1
    m = min(m, len(state))
    sub = daq_ops.gather_hits(state, state.flags, perm, m)[0]
    return sub, n


def join_states(states):
    """Concatenate device PhotonStates along the photon axis without any
    host round trip (the analog of the reference's device-side source
    stacking, reference: chroma/sim.py:156-223 _stack_gpu_photon_sources
    + gpu/photon.py:66-95 dtod copies)."""
    import jax.numpy as jnp
    states = [st if st.cur_mat is not None else
              st.replace(cur_mat=jnp.full(len(st), -1, jnp.int32))
              for st in states]
    return jax.tree_util.tree_map(
        lambda *leaves: jnp.concatenate(leaves, axis=0), *states)


def create_cuda_context(device=None):
    "No-op placeholder: JAX owns the device. Returns a dummy context."
    class _Ctx(object):
        def pop(self):
            pass
    return _Ctx()


def get_rng_states(n, seed=1):
    "The TPU engine uses counter-based keys; returns the base key."
    from chroma_tpu.ops.sample import make_key
    return make_key(seed)


class GPUGeometry(object):
    "Device geometry (reference: chroma/gpu/geometry.py GPUGeometry)."

    def __init__(self, geometry, wavelengths=None, times=None,
                 print_usage=False, **_compat):
        self.geometry = geometry
        self.arrays = build_geometry_arrays(geometry, wavelengths, times)
        if print_usage:
            self.print_device_usage()

    def print_device_usage(self):
        rows = self.arrays.wide.rows if self.arrays.wide is not None \
            else self.arrays.nodes
        if self.arrays.triangles is not None:
            ntri = len(self.arrays.triangles)
        else:
            ntri = int(self.arrays.inst.tri_base[-1])
        print('device geometry: %d triangles, %.1f MB acceleration rows'
              % (ntri, rows.size * 4 / 1e6))


class GPUDetector(GPUGeometry):
    "Detector geometry with channel map (reference: gpu/detector.py)."


class GPUPhotons(object):
    "Device photon batch (reference: chroma/gpu/photon.py GPUPhotons)."

    def __init__(self, photons, ncopies=1, **_compat):
        import jax.numpy as jnp
        if isinstance(photons, PhotonState):
            # device-resident input: a zero-copy view, duplicated on
            # device when ncopies > 1 (reference: gpu/photon.py:66-111)
            self.true_nphotons = len(photons)
            state = photons
            if state.cur_mat is None:
                state = state.replace(
                    cur_mat=jnp.full(len(state), -1, jnp.int32))
            if ncopies > 1:
                state = jax.tree_util.tree_map(
                    lambda a: jnp.concatenate([a] * ncopies, axis=0),
                    state)
            self.state = state
        else:
            self.true_nphotons = len(photons)
            if ncopies > 1:
                from chroma_tpu.event import Photons
                photons = Photons.join([photons] * ncopies)
            self.state = photon_state_from_host(photons)

    def __len__(self):
        return len(self.state)

    def propagate(self, gpu_geometry, rng_states, max_steps=100,
                  use_weights=False, scatter_first=0, track=False,
                  **_compat):
        result = propagate(self.state, gpu_geometry.arrays, rng_states,
                           max_steps=max_steps, use_weights=use_weights,
                           scatter_first=scatter_first,
                           track_steps=track)
        if track:
            self.state, tracking = result
            return tracking
        self.state = result
        return None

    def get(self):
        return photon_state_to_host(self.state)

    def get_flat_hits(self, gpu_geometry):
        """Photons detected by channels. Counts and compacts ON DEVICE
        (one jitted pack + one gather launch), transferring only the
        detected minority, like the reference's count->alloc->copy
        kernels (reference: gpu/photon.py:141-209)."""
        return daq_ops.extract_flat_hits(self.state, gpu_geometry.arrays)

    def select(self, target_flag):
        """Photons whose history matches target_flag (device-side count
        and compaction, host transfer of the selection only)."""
        sub, n = _select_flag(self.state, np.uint32(target_flag))
        return photon_state_to_host(sub)[:int(n)]


class GPUDaq(object):
    "DAQ runner (reference: chroma/gpu/daq.py GPUDaq)."

    def __init__(self, gpu_detector, ndaq=1):
        self.gpu_detector = gpu_detector
        self.ndaq = ndaq
        self._pending = None

    def begin_acquire(self, nthreads_per_block=None):
        self._pending = None

    def acquire(self, gpu_photons, rng_states, start_photon=0,
                nphotons=None, **_compat):
        state = gpu_photons.state
        if nphotons is not None:
            state = jax.tree_util.tree_map(
                lambda a: a[start_photon:start_photon + nphotons], state)
            # decorrelate chunks: lane i of each chunk is a different photon
            rng_states = jax.random.fold_in(rng_states, start_photon)
        batch = daq_ops.run_daq(state, self.gpu_detector.arrays,
                                rng_states, ndaq=self.ndaq)
        # accumulate across acquire() calls within one begin/end cycle,
        # like the reference's persistent atomicMin/Add/Or device arrays
        # (reference: chroma/gpu/daq.py:61-79, cuda/daq.cu:73-75)
        if self._pending is None:
            self._pending = batch
        else:
            prev = self._pending
            self._pending = daq_ops.ChannelArrays(
                earliest_time=jax.numpy.minimum(prev.earliest_time,
                                                batch.earliest_time),
                charge=prev.charge + batch.charge,
                histories=prev.histories | batch.histories)
        return self._pending

    def end_acquire(self):
        return GPUChannels(self._pending, self.ndaq)


class GPUChannels(object):
    "Channel readout container (reference: chroma/gpu/daq.py GPUChannels)."

    def __init__(self, arrays, ndaq=1):
        self.arrays = arrays
        self.ndaq = ndaq
        self.t = arrays.earliest_time
        self.q = arrays.charge
        self.flags = arrays.histories

    def get(self):
        return daq_ops.channels_to_host(self.arrays)


class GPUPDF(object):
    "Binned + variable-bin PDF estimation (reference: chroma/gpu/pdf.py)."

    def __init__(self):
        self._accum = None
        self._eval = None

    def setup_pdf(self, gpu_geometry, tbins, trange, qbins, qrange):
        self._accum = pdf_ops.PDFAccumulator(gpu_geometry.arrays, tbins,
                                             trange, qbins, qrange)

    def clear_pdf(self):
        self._accum.clear()

    def add_hits_to_pdf(self, gpu_channels, **_compat):
        self._accum.add(gpu_channels.arrays, ndaq=gpu_channels.ndaq)

    def get_pdfs(self):
        return self._accum.get()

    def setup_pdf_eval(self, gpu_geometry, event_channels, min_twidth,
                       trange, min_qwidth, qrange, min_bin_content=10,
                       time_only=True):
        self._eval = pdf_ops.PDFEval(gpu_geometry.arrays, event_channels,
                                     min_twidth, trange, min_qwidth,
                                     qrange, min_bin_content, time_only)

    def clear_pdf_eval(self):
        self._eval.clear()

    def accumulate_pdf_eval(self, gpu_channels, **_compat):
        self._eval.accumulate(gpu_channels.arrays,
                              ndaq=gpu_channels.ndaq)

    def get_pdf_eval(self):
        return self._eval.get()


class GPUKernelPDF(object):
    "Gaussian KDE PDF estimation (reference: chroma/gpu/pdf.py:7-175)."

    def __init__(self):
        self._kernel = None

    def setup_moments(self, gpu_geometry, trange, qrange, time_only=True):
        self._kernel = pdf_ops.KernelPDF(gpu_geometry.arrays, trange,
                                         qrange, time_only=time_only)

    def clear_moments(self):
        self._kernel.clear_moments()

    def accumulate_moments(self, gpu_channels, **_compat):
        self._kernel.accumulate_moments(gpu_channels.arrays)

    def compute_bandwidth(self, event_hit, event_time, event_charge,
                          scale_factor=1.0):
        self._kernel.compute_bandwidth(event_hit, event_time,
                                       event_charge, scale_factor)

    def setup_kernel(self, event_hit, event_time, event_charge):
        self._kernel.setup_kernel(event_hit, event_time, event_charge)

    def clear_kernel(self):
        self._kernel.clear_kernel()

    def accumulate_kernel(self, gpu_channels, **_compat):
        self._kernel.accumulate_kernel(gpu_channels.arrays)

    def get_kernel_eval(self):
        return self._kernel.get_kernel_eval()


class GPURays(object):
    "Ray bundle for rendering (reference: chroma/gpu/render.py GPURays)."

    def __init__(self, pos, dir, max_alpha_depth=10, **_compat):
        from chroma_tpu.camera import Rays
        self._rays = Rays(pos, dir)
        self.max_alpha_depth = max_alpha_depth

    @property
    def pos(self):
        return self._rays.pos

    @property
    def dir(self):
        return self._rays.dir

    def rotate(self, phi, n):
        self._rays.rotate(phi, n)

    def rotate_around_point(self, phi, n, point):
        self._rays.rotate_around_point(phi, n, point)

    def translate(self, v):
        self._rays.translate(v)

    def render(self, gpu_geometry, pixels=None, alpha_depth=10,
               keep_last_render=False):
        out = self._rays.render(gpu_geometry.arrays, alpha_depth)
        if pixels is not None:
            pixels[:] = np.asarray(out)
        return out
