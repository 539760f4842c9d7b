"""Simulation: the top-level orchestration facade
(reference: chroma/sim.py).

Owns the device geometry, batches incoming events to amortize host<->device
transfer (photons_per_batch, reference: sim.py:227), runs the propagation
engine, extracts per-channel hits and per-event DAQ readouts, and yields
finished Events. Also exposes the PDF-evaluation API used by
chroma_tpu.likelihood (restoring the interface that drifted out of the
reference fork; SURVEY §4 "drift").
"""
from __future__ import annotations

import os
import time

import numpy as np
import jax

from chroma_tpu import event
from chroma_tpu import itertoolset
from chroma_tpu.log import logger
from chroma_tpu.loader import create_geometry_from_obj
from chroma_tpu.ops.types import build_geometry_arrays
from chroma_tpu.ops.propagate import (propagate, photon_state_from_host,
                                      photon_state_to_host)
from chroma_tpu.ops import daq as daq_ops
from chroma_tpu.profiler import profiler


def pick_seed():
    """Seed from a mix of current time and process ID
    (reference: sim.py:17-20)."""
    return int(time.time()) ^ (os.getpid() << 16) & 2 ** 32 - 1


class Simulation(object):
    def __init__(self, detector, seed=None, photon_tracking=False,
                 wavelengths=None, times=None, mesh=None, n_devices=None,
                 **compat_kwargs):
        """Create a simulation around a flattened Geometry/Detector.

        mesh / n_devices: run multi-chip — photons shard over a 1-D
        jax.sharding.Mesh (chroma_tpu.parallel), geometry replicated,
        DAQ reductions riding ICI collectives. Batches that don't divide
        the mesh are padded with dead lanes.

        `compat_kwargs` absorbs reference-only options (cuda_device,
        nthreads_per_block, max_blocks) so call sites port unchanged.
        """
        if mesh is None and n_devices is not None:
            from chroma_tpu.parallel import photon_mesh
            mesh = photon_mesh(n_devices)
        self.mesh = mesh
        gpu_geometry = compat_kwargs.pop('gpu_geometry', None)
        if gpu_geometry is None:
            if getattr(detector, 'bvh', None) is None or \
                    not hasattr(detector, 'mesh'):
                detector = create_geometry_from_obj(detector)
        self.detector = detector
        self.photon_tracking = photon_tracking
        # steps per launch between compaction checks; 'auto' starts small
        # (compaction pays off fastest early) and grows geometrically
        self.step_chunk = compat_kwargs.pop('step_chunk', 'auto')

        if seed is None:
            seed = pick_seed()
        self.seed = seed
        np.random.seed(self.seed)
        from chroma_tpu.ops.sample import make_key
        self._key = make_key(self.seed)

        # gpu_geometry: pass prebuilt GeometryArrays (e.g. from the
        # geocache) and skip both the host flatten and the device build;
        # every hot path, including hit extraction, is device-resident
        # and never touches the host detector
        self.gpu_geometry = gpu_geometry if gpu_geometry is not None \
            else build_geometry_arrays(detector, wavelengths, times)

        self.pdf_config = None
        self._pdf = None

    def _next_key(self):
        """Per-event subkey from a host-side pool: splitting on device
        per event costs an eager dispatch through the remote runtime, so
        keys are split 64 at a time, pulled to the host once, and
        re-wrapped per event (one async upload, no device compute)."""
        if not getattr(self, '_key_pool', None):
            keys = jax.random.split(self._key, 65)
            self._key = keys[0]
            data = jax.device_get(jax.random.key_data(keys[1:]))
            self._key_pool = [row for row in data]
        return jax.random.wrap_key_data(
            jax.numpy.asarray(self._key_pool.pop()))

    @property
    def has_channels(self):
        return self.gpu_geometry.detector is not None

    # ------------------------------------------------------------------
    # event simulation
    # ------------------------------------------------------------------

    def simulate(self, iterable, keep_photons_beg=False,
                 keep_photons_end=False, keep_hits=True, keep_flat_hits=True,
                 run_daq=False, max_steps=1000, photons_per_batch=1000000):
        """Simulate an iterable of Photons or Events, yielding finished
        Events. Events are grouped into >= photons_per_batch batches to
        amortize transfer and launch overhead (reference: sim.py:225-278).
        """
        from chroma_tpu.ops.photon import PhotonState
        if isinstance(iterable, (event.Photons, PhotonState)):
            first_element, iterable = iterable, [iterable]
        else:
            first_element, iterable = itertoolset.peek(iterable)

        if isinstance(first_element, event.Event):
            pass
        elif isinstance(first_element, (event.Photons, PhotonState)):
            # PhotonState inputs stay device-resident end to end
            # (reference: gpu/photon.py:66-95 GPU-array sources)
            iterable = (event.Event(photons_beg=x) for x in iterable)
        elif isinstance(first_element, event.Vertex):
            # parametric light model stands in for the removed GEANT4
            # layer (chroma_tpu.generator; reference: chroma/generator)
            from chroma_tpu.generator import vertex_gun_to_events
            iterable = vertex_gun_to_events(iterable)

        nphotons = 0
        batch_events = []
        for ev in iterable:
            ev.nphotons = len(ev.photons_beg)
            if isinstance(ev.photons_beg, event.Photons):
                ev.photons_beg.evidx[:] = np.uint32(len(batch_events))
            nphotons += ev.nphotons
            batch_events.append(ev)

            if nphotons >= photons_per_batch:
                yield from self._simulate_batch(
                    batch_events, keep_photons_beg=keep_photons_beg,
                    keep_photons_end=keep_photons_end, keep_hits=keep_hits,
                    keep_flat_hits=keep_flat_hits, run_daq=run_daq,
                    max_steps=max_steps)
                nphotons = 0
                batch_events = []

        if batch_events:
            yield from self._simulate_batch(
                batch_events, keep_photons_beg=keep_photons_beg,
                keep_photons_end=keep_photons_end, keep_hits=keep_hits,
                keep_flat_hits=keep_flat_hits, run_daq=run_daq,
                max_steps=max_steps)

    def _simulate_batch(self, batch_events, keep_photons_beg=False,
                        keep_photons_end=False, keep_hits=True,
                        keep_flat_hits=True, run_daq=False, max_steps=100,
                        verbose=False):
        "Propagate one batch of events and attach results."
        t_start = time.perf_counter()

        from chroma_tpu.ops.photon import PhotonState
        photon_sources = [ev.photons_beg for ev in batch_events]
        batch_bounds = np.cumsum([0] + [len(src) for src in photon_sources])
        nbatch = int(batch_bounds[-1])

        if any(isinstance(src, PhotonState) for src in photon_sources):
            # device-resident sources: stamp evidx and stack on device,
            # no host round trip (reference: sim.py:156-223)
            import jax.numpy as jnp
            from chroma_tpu.gpu import join_states
            with profiler.region('sim.upload'):
                states = []
                for i, src in enumerate(photon_sources):
                    st = src if isinstance(src, PhotonState) \
                        else photon_state_from_host(src)
                    if len(photon_sources) > 1:
                        # single-source batches skip the stamp launch:
                        # every hit maps to event 0 regardless
                        st = st.replace(
                            evidx=jnp.full(len(st), i, jnp.uint32))
                    states.append(st)
                state = join_states(states) if len(states) > 1 \
                    else states[0]
        else:
            batch = event.Photons.join(photon_sources) \
                if len(photon_sources) > 1 else photon_sources[0]
            with profiler.region('sim.upload'):
                state = photon_state_from_host(batch)
        key = self._next_key()

        if self.mesh is not None and self.photon_tracking:
            # tracking snapshots every chunk per original lane index;
            # the sharded driver has no per-chunk host boundary to
            # snapshot at, so tracking runs single-device
            logger.warning('photon_tracking=True: ignoring mesh=%s and '
                           'propagating single-device', self.mesh)
        want_hits = self.has_channels and (keep_hits or keep_flat_hits)
        batch_hits = None
        if self.mesh is not None and not self.photon_tracking:
            # multi-chip: pad to the mesh, shard the photon axis, un-pad
            from chroma_tpu.parallel import propagate_sharded, pad_to_mesh
            import jax.tree_util as jtu
            padded, true_n = pad_to_mesh(state, self.mesh)
            result = propagate_sharded(padded, self.gpu_geometry, key,
                                       max_steps=max_steps,
                                       mesh=self.mesh,
                                       step_chunk=self.step_chunk)
            if len(result) != true_n:
                result = jtu.tree_map(lambda a: a[:true_n], result)
        elif want_hits and not self.photon_tracking:
            # hot path: propagation + flat-hit extraction fused into one
            # device program, one host sync, one minority transfer
            with profiler.region('sim.propagate_with_hits'):
                result, batch_hits = daq_ops.propagate_with_hits(
                    state, self.gpu_geometry, key, max_steps=max_steps,
                    step_chunk=self.step_chunk)
        else:
            result = propagate(state, self.gpu_geometry, key,
                               max_steps=max_steps,
                               step_chunk=1 if self.photon_tracking
                               else self.step_chunk,
                               track_steps=self.photon_tracking)
            if self.photon_tracking:
                result, tracking = result

        if verbose:
            logger.info('batch of %d photons took %.2f s'
                        % (nbatch, time.perf_counter() - t_start))

        # hit extraction runs ON DEVICE and fully jitted: on the fused
        # path above it already happened inside the bomb program; other
        # paths pay one pack + one gather launch. Only the detected
        # minority is transferred (reference count->alloc->copy kernels,
        # gpu/photon.py:141-209). The full-batch readback (~0.8 s per 1M
        # photons through the remote tunnel) happens only when the caller
        # asked for every end-state.
        photons_end = None
        if keep_photons_end or self.photon_tracking:
            with profiler.region('sim.readback'):
                photons_end = photon_state_to_host(result)
                if want_hits:
                    channel_dev, _, _ = daq_ops.flat_hit_pack(
                        result, self.gpu_geometry)
                    photons_end.channel = np.maximum(
                        np.asarray(channel_dev), 0).astype(np.uint32)

        if want_hits and batch_hits is None:
            with profiler.region('sim.hit_extraction'):
                batch_hits = daq_ops.extract_flat_hits(
                    result, self.gpu_geometry)

        for i, ev in enumerate(batch_events):
            start, end = batch_bounds[i], batch_bounds[i + 1]

            if not keep_photons_beg:
                ev.photons_beg = None

            if self.photon_tracking:
                ev.photon_tracks = self._regroup_tracks(tracking, start, end)

            if keep_photons_end:
                ev.photons_end = photons_end[start:end]

            if self.has_channels and (keep_hits or keep_flat_hits):
                # single-event batches skip both the device-side evidx
                # stamp and the host-side selection scan
                ev_hits = batch_hits if len(batch_events) == 1 \
                    else batch_hits[batch_hits.evidx == i]
                if keep_hits:
                    # sort-and-split instead of one boolean scan per
                    # channel (O(C*N) -> O(N log N); measured ~1 s/event
                    # at 630 channels x 33k hits the old way)
                    order = np.argsort(ev_hits.channel, kind='stable')
                    sh = ev_hits[order]
                    chans, starts = np.unique(sh.channel,
                                              return_index=True)
                    bounds = np.r_[starts, len(sh.channel)]
                    ev.hits = {int(c): sh[bounds[j]:bounds[j + 1]]
                               for j, c in enumerate(chans)}
                if keep_flat_hits:
                    ev.flat_hits = ev_hits

            if self.has_channels and run_daq:
                with profiler.region('sim.daq'):
                    ev_state = jax.tree_util.tree_map(
                        lambda a: a[start:end], result)
                    arrays = daq_ops.run_daq(
                        ev_state, self.gpu_geometry,
                        jax.random.fold_in(key, 7000 + i))
                    ev.channels = daq_ops.channels_to_host(arrays)

            yield ev

    @staticmethod
    def _regroup_tracks(tracking, start, end):
        "Per-photon track lists from chunk snapshots (tracking mode)."
        nphotons = end - start
        tracks = [[] for _ in range(nphotons)]
        for orig_idx, snapshot in tracking:
            mask = (orig_idx >= start) & (orig_idx < end)
            if not mask.any():
                continue
            ids = orig_idx[mask] - start
            snap = photon_state_to_host(
                jax.tree_util.tree_map(lambda a: a[mask], snapshot))
            for j, pid in enumerate(ids):
                tracks[pid].append(snap[j:j + 1])
        return [event.Photons.join(t) if t else event.Photons()
                for t in tracks]

    # ------------------------------------------------------------------
    # PDF evaluation API (used by chroma_tpu.likelihood)
    # ------------------------------------------------------------------

    def create_pdf(self, iterable, tbins, trange, qbins, qrange,
                   nreps=1, ndaq=1):
        """Histogram the DAQ response of many events into a binned
        (channel, t, q) PDF. Returns (hitcount, pdf) numpy arrays."""
        from chroma_tpu.ops import pdf as pdf_ops
        accum = pdf_ops.PDFAccumulator(self.gpu_geometry, tbins, trange,
                                       qbins, qrange)
        for ev in iterable:
            state0 = self._source_state(ev.photons_beg)
            for _ in range(nreps):
                key = self._next_key()
                result = propagate(state0, self.gpu_geometry, key,
                                   max_steps=100)
                arrays = daq_ops.run_daq(result, self.gpu_geometry,
                                         jax.random.fold_in(key, 1),
                                         ndaq=ndaq)
                accum.add(arrays, ndaq=ndaq)
        return accum.get()

    def setup_pdf_eval(self, event_hits, min_twidth, trange, min_qwidth,
                       qrange, min_bin_content=100, time_only=True):
        """Prepare likelihood PDF evaluation against an observed event
        (reference API: gpu/pdf.py:229-283)."""
        from chroma_tpu.ops import pdf as pdf_ops
        self._pdf = pdf_ops.PDFEval(self.gpu_geometry, event_hits,
                                    min_twidth, trange, min_qwidth, qrange,
                                    min_bin_content, time_only)

    def eval_pdf(self, event_channels, iterable, min_twidth, trange,
                 min_qwidth, qrange, min_bin_content=100, nreps=1, ndaq=1,
                 time_only=True):
        """Probability of each channel's observed hit given simulated
        events (restores the Simulation API expected by likelihood.py)."""
        self.setup_pdf_eval(event_channels, min_twidth, trange, min_qwidth,
                            qrange, min_bin_content=min_bin_content,
                            time_only=time_only)
        for ev in iterable:
            state0 = self._source_state(ev.photons_beg)
            for _ in range(nreps):
                key = self._next_key()
                result = propagate(state0, self.gpu_geometry, key,
                                   max_steps=100)
                arrays = daq_ops.run_daq(result, self.gpu_geometry,
                                         jax.random.fold_in(key, 1),
                                         ndaq=ndaq)
                self._pdf.accumulate(arrays, ndaq=ndaq)
        return self._pdf.get()

    def setup_kernel(self, event_channels, bandwidth_iterable, trange,
                     qrange, nreps=1, ndaq=1, time_only=True,
                     scale_factor=1.0):
        """Accumulate moments from an oversampled MC run and derive the
        per-channel KDE bandwidths (reference API: gpu/pdf.py:13-112)."""
        from chroma_tpu.ops import pdf as pdf_ops
        self._kernel = pdf_ops.KernelPDF(self.gpu_geometry, trange, qrange,
                                         time_only=time_only)
        for ev in bandwidth_iterable:
            for _ in range(nreps):
                arrays = self._run_daq_once(ev, ndaq)
                self._kernel.accumulate_moments(arrays)
        hit = np.asarray(event_channels.hit).astype(bool)
        t = np.asarray(event_channels.t, dtype=np.float32)
        q = np.asarray(event_channels.q, dtype=np.float32)
        self._kernel.compute_bandwidth(hit, t, q, scale_factor=scale_factor)
        self._kernel.setup_kernel(hit, t, q)

    def eval_kernel(self, event_channels, kernel_iterable, trange, qrange,
                    nreps=1, ndaq=1, time_only=True):
        """Per-channel KDE PDF values at the observed hits; requires a
        prior setup_kernel() call."""
        if getattr(self, '_kernel', None) is None:
            raise RuntimeError('call setup_kernel() first')
        self._kernel.clear_kernel()
        for ev in kernel_iterable:
            for _ in range(nreps):
                arrays = self._run_daq_once(ev, ndaq)
                self._kernel.accumulate_kernel(arrays)
        return self._kernel.get_kernel_eval()

    def _source_state(self, photons):
        """Upload once (or pass through an already-device PhotonState) so
        likelihood loops re-propagate without host round trips
        (reference: gpu/photon.py:66-95 device-resident sources)."""
        from chroma_tpu.ops.photon import PhotonState
        if isinstance(photons, PhotonState):
            return photons
        return photon_state_from_host(photons)

    def _run_daq_once(self, ev, ndaq):
        "Propagate one event's photons and run the DAQ (ndaq replicas)."
        state = self._source_state(ev.photons_beg)
        key = self._next_key()
        result = propagate(state, self.gpu_geometry, key, max_steps=100)
        return daq_ops.run_daq(result, self.gpu_geometry,
                               jax.random.fold_in(key, 1), ndaq=ndaq)
