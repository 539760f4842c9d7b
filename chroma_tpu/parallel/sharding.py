"""Multi-chip scaling: shard the photon axis, replicate the geometry.

The reference is strictly single-GPU per Simulation; cross-node scaling
happens at the service level (SURVEY §2.3, §5.8). On TPU the natural
scale-out is intra-pod: photons are data-parallel over a 1-D device mesh
via shard_map (each chip propagates its shard against a replicated
geometry — no communication in the hot loop), and the DAQ channel
reductions ride ICI collectives:

  earliest hit time  -> pmin over the photon axis
  channel charge     -> psum
  channel history OR -> per-bit psum + recombine

This mirrors the reference's intra-GPU atomics -> ICI collectives mapping
called out in SURVEY §2.3.

All sharded programs are built ONCE per (mesh, static options) through
module-level caches — repeated calls hit the jit cache instead of
retracing — and `propagate_sharded` runs the same chunked driver as the
single-chip engine (chroma_tpu.ops.propagate): between chunks each shard
front-packs its survivors into a power-of-two bucket sized by the WORST
shard (the bucket must be uniform across the mesh), so the lockstep width
shrinks as the batch dies without any cross-chip photon motion.
"""
from __future__ import annotations

import os
from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from chroma_tpu.ops.photon import propagate_step
from chroma_tpu.ops import daq as daq_ops
from chroma_tpu.ops.propagate import MIN_BATCH, _next_pow2
from chroma_tpu.profiler import profiler

AXIS = 'photons'


def photon_mesh(n_devices=None, devices=None):
    "A 1-D device mesh over the photon axis."
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices).reshape(-1), (AXIS,))


def _shard_key(key):
    "Give each shard an independent random stream."
    return jax.random.fold_in(key, jax.lax.axis_index(AXIS))


# ---------------------------------------------------------------------------
# cached sharded programs (one trace per mesh + static options)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _steps_program(mesh, use_weights, prune):
    """Sharded analog of ops.propagate.run_steps: each shard runs its own
    early-exiting step loop; returns (photons, total alive, max alive per
    shard) — the two scalars drive the host's chunk/bucket decisions with
    a single 8-byte read."""

    # nsteps is a DYNAMIC replicated operand: one compiled program per
    # batch shape, not per (shape, chunk length) (see ops.propagate)
    @jax.jit
    def run(ph, geom, key, start_step, scatter_first, nsteps):

        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(P(AXIS), P(), P(), P(), P(), P()),
                 out_specs=(P(AXIS), P(), P()))
        def _run(ph, geom, key, start_step, scatter_first, nsteps):
            key = _shard_key(key)

            def cond(carry):
                i, p = carry
                return (i < nsteps) & jnp.any(p.alive)

            def body(carry):
                i, p = carry
                abs_step = start_step + i
                step_key = jax.random.fold_in(key, abs_step)
                sf = jnp.where(abs_step == 0, scatter_first, 0)
                p = propagate_step(p, geom, step_key,
                                   use_weights=use_weights,
                                   scatter_first=sf, prune=prune)
                return i + 1, p

            _, ph = jax.lax.while_loop(cond, body, (0, ph))
            local = jnp.sum(ph.alive.astype(jnp.int32))
            return (ph, jax.lax.psum(local, AXIS),
                    jax.lax.pmax(local, AXIS))

        return _run(ph, geom, key,
                    jnp.asarray(start_step, jnp.int32),
                    jnp.asarray(scatter_first, jnp.int32),
                    jnp.asarray(nsteps, jnp.int32))

    return run


@lru_cache(maxsize=None)
def _fused_program(mesh, use_weights, prune, donate):
    """Chunk boundary + next chunk in ONE launch (write-back, per-shard
    compaction, step loop) — the sharded analog of
    ops.propagate._fused_chunk; each avoided dispatch saves ~45 ms of
    host time through the remote runtime."""

    def run(final, current, orig_idx, geom, key, start_step,
            scatter_first, nsteps, bucket):

        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(P(AXIS), P(AXIS), P(AXIS), P(), P(), P(),
                           P(), P()),
                 out_specs=(P(AXIS), P(AXIS), P(AXIS), P(), P()))
        def _run(f, cur, oi, geom, key, start_step, scatter_first,
                 nsteps):
            f = jax.tree_util.tree_map(
                lambda ff, cc: ff.at[oi].set(cc), f, cur)

            act = cur.alive
            acti = act.astype(jnp.int32)
            n_act = jnp.sum(acti)
            fwd = jnp.cumsum(acti) - 1
            bwd = n_act + jnp.cumsum(1 - acti) - 1
            dest = jnp.where(act, fwd, bwd)
            perm = jnp.zeros_like(dest).at[dest].set(
                jnp.arange(dest.shape[0], dtype=dest.dtype))
            sel = perm[:bucket]
            cur = jax.tree_util.tree_map(lambda a: a[sel], cur)
            oi = oi[sel]

            key = _shard_key(key)

            def cond(carry):
                i, p = carry
                return (i < nsteps) & jnp.any(p.alive)

            def body(carry):
                i, p = carry
                abs_step = start_step + i
                step_key = jax.random.fold_in(key, abs_step)
                sf = jnp.where(abs_step == 0, scatter_first, 0)
                p = propagate_step(p, geom, step_key,
                                   use_weights=use_weights,
                                   scatter_first=sf, prune=prune)
                return i + 1, p

            _, cur = jax.lax.while_loop(cond, body, (0, cur))
            local = jnp.sum(cur.alive.astype(jnp.int32))
            return (f, cur, oi, jax.lax.psum(local, AXIS),
                    jax.lax.pmax(local, AXIS))

        return _run(final, current, orig_idx, geom, key,
                    jnp.asarray(start_step, jnp.int32),
                    jnp.asarray(scatter_first, jnp.int32),
                    jnp.asarray(nsteps, jnp.int32))

    # nsteps stays dynamic (one program per bucket, not per chunk length)
    return jax.jit(run, static_argnames=('bucket',),
                   donate_argnums=(0,) if donate else ())


@lru_cache(maxsize=None)
def _fused_bomb_program(mesh, schedule, max_steps, use_weights,
                        scatter_first, prune):
    """The whole bomb as ONE sharded launch: each shard runs the fused
    static-compaction-schedule program (ops.propagate._fused_bomb_impl)
    on its local slice — zero intermediate host syncs and zero cross-chip
    traffic in the hot loop (each shard's early-exiting while_loops are
    data-dependent per device, which SPMD permits because the loop bodies
    contain no collectives)."""
    from chroma_tpu.ops.propagate import _fused_bomb_impl

    @jax.jit
    def run(ph, geom, key):

        # check_vma=False: the bomb body is purely per-shard (zero
        # collectives), and the interpret-mode Pallas visit kernel mixes
        # varying arrays with literal constants in ways the vma checker
        # rejects (auto-pvary is not applied inside interpreted
        # pallas_call bodies). The collective-bearing programs
        # (_steps_program, _daq_program) keep their vma checks.
        @partial(jax.shard_map, mesh=mesh, check_vma=False,
                 in_specs=(P(AXIS), P(), P()), out_specs=P(AXIS))
        def _run(ph, geom, key):
            out, _abort = _fused_bomb_impl(ph, geom, _shard_key(key),
                                           schedule, max_steps,
                                           use_weights, scatter_first,
                                           prune)
            return out

        return _run(ph, geom, key)

    return run


@lru_cache(maxsize=None)
def _writeback_program(mesh, donate):
    "Scatter a (smaller) live slice back into the full sharded batch."

    def run(final, orig_idx, current):

        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(P(AXIS), P(AXIS), P(AXIS)),
                 out_specs=P(AXIS))
        def _write(f, oi, cur):
            return jax.tree_util.tree_map(
                lambda ff, cc: ff.at[oi].set(cc), f, cur)

        return _write(final, orig_idx, current)

    return jax.jit(run, donate_argnums=(0,) if donate else ())


@lru_cache(maxsize=None)
def _daq_program(mesh, ndaq):
    """Sharded DAQ acquire: per-shard run_daq + ICI channel reduction.
    The ChannelArrays come back replicated on every chip."""

    @jax.jit
    def run(ph, geom, key):

        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(P(AXIS), P(), P()), out_specs=P())
        def _daq(ph, geom, key):
            local = daq_ops.run_daq(ph, geom, _shard_key(key), ndaq=ndaq)
            return reduce_channel_arrays(local)

        return _daq(ph, geom, key)

    return run


@lru_cache(maxsize=None)
def _channels_program(mesh):
    "Sharded per-photon channel map (device-side flat-hit extraction)."

    @jax.jit
    def run(ph, geom):

        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(P(AXIS), P()), out_specs=P(AXIS))
        def _ch(ph, geom):
            return daq_ops.photon_channels_device(ph, geom)

        return _ch(ph, geom)

    return run


# ---------------------------------------------------------------------------
# drivers
# ---------------------------------------------------------------------------


def propagate_sharded(photons, geometry, key, max_steps=100, mesh=None,
                      use_weights=False, scatter_first=0, compact=True,
                      step_chunk='auto'):
    """Propagate a photon batch sharded over the mesh's photon axis,
    with the single-chip driver's chunked bucket compaction applied
    per shard. The batch length must divide evenly by the mesh size.
    Returns the final PhotonState (input length and order)."""
    if mesh is None:
        mesh = photon_mesh()
    nsh = int(mesh.devices.size)
    n = len(photons)
    if n % nsh:
        raise ValueError('batch length %d does not divide the %d-device '
                         'mesh; pad first (see pad_to_mesh)' % (n, nsh))
    prune = isinstance(scatter_first, int) and scatter_first == 0

    from chroma_tpu.ops import propagate as prop_mod
    if (prop_mod.USE_FUSED and compact
            and isinstance(scatter_first, int)):
        # reuse a single-chip probe-tuned schedule when one exists for
        # the local batch; otherwise the conservative probe schedule
        # (no per-shard probing: boundary counts would need collectives)
        sched = prop_mod.schedule_for(geometry, n // nsh, max_steps)
        prog = _fused_bomb_program(mesh, sched, int(max_steps),
                                   bool(use_weights), int(scatter_first),
                                   prune)
        with profiler.region('sharded.fused[n=%d]' % n):
            return prog(photons, geometry, key)

    steps = _steps_program(mesh, use_weights, prune)
    writeback = _writeback_program(mesh, False)
    writeback_d = _writeback_program(mesh, True)
    fused = _fused_program(mesh, use_weights, prune, False)
    fused_d = _fused_program(mesh, use_weights, prune, True)

    # shard-LOCAL original indices (compaction never crosses shards)
    orig_idx = jnp.asarray(np.tile(np.arange(n // nsh, dtype=np.int32),
                                   nsh))
    final = photons
    final_owned = False
    current = photons

    growth = int(os.environ.get('CHROMA_CHUNK_GROWTH', '2'))
    chunk_cap = int(os.environ.get('CHROMA_CHUNK_CAP', '32'))
    chunk = 1 if step_chunk == 'auto' else step_chunk
    step = 0
    n_alive = mx_alive = None
    while step < max_steps:
        if step_chunk == 'auto':
            chunk = min(chunk_cap, max(1, chunk * growth)) \
                if step > 0 else 1
        nsteps = min(chunk, max_steps - step)

        if step == 0:
            with profiler.region('sharded.chunk[n=%d]' % len(current)):
                current, alive_tot, alive_max = steps(
                    current, geometry, key, step, scatter_first,
                    nsteps=nsteps)
                n_alive = int(alive_tot)
                mx_alive = int(alive_max)
        else:
            few = n_alive <= max(len(current) // 16, MIN_BATCH // 4)
            if few:
                nsteps = max_steps - step
            bucket = _next_pow2(mx_alive)
            if compact and bucket * nsh < len(current):
                # one fused launch: write-back + per-shard compaction +
                # next chunk (see _fused_program)
                prog = fused_d if final_owned else fused
                with profiler.region('sharded.chunk[n=%d]'
                                     % (bucket * nsh)):
                    (final, current, orig_idx, alive_tot,
                     alive_max) = prog(final, current, orig_idx,
                                       geometry, key, step,
                                       scatter_first, nsteps=nsteps,
                                       bucket=bucket)
                    final_owned = True
                    n_alive = int(alive_tot)
                    mx_alive = int(alive_max)
            else:
                with profiler.region('sharded.chunk[n=%d]'
                                     % len(current)):
                    current, alive_tot, alive_max = steps(
                        current, geometry, key, step, scatter_first,
                        nsteps=nsteps)
                    n_alive = int(alive_tot)
                    mx_alive = int(alive_max)

        step += nsteps
        if n_alive == 0:
            break

    wb = writeback_d if final_owned else writeback
    return wb(final, orig_idx, current)


def propagate_and_daq_sharded(photons, geometry, key, max_steps=100,
                              mesh=None, use_weights=False,
                              scatter_first=0, ndaq=1, **driver_kwargs):
    """Full sharded step: chunked sharded propagation, then the DAQ
    channel reduction across chips (pmin earliest time, psum charge,
    per-bit OR histories). Returns (photons, ChannelArrays) with the
    channel arrays replicated on every chip."""
    if mesh is None:
        mesh = photon_mesh()
    out = propagate_sharded(photons, geometry, key, max_steps=max_steps,
                            mesh=mesh, use_weights=use_weights,
                            scatter_first=scatter_first, **driver_kwargs)
    channels = _daq_program(mesh, ndaq)(
        out, geometry, jax.random.fold_in(key, 0x7fffffff))
    return out, channels


def photon_channels_sharded(photons, geometry, mesh=None):
    "Per-photon channel ids (-1 undetected), sharded over the mesh."
    if mesh is None:
        mesh = photon_mesh()
    return _channels_program(mesh)(photons, geometry)


def pad_to_mesh(state, mesh):
    """Pad a PhotonState to a multiple of the mesh size with terminated
    zero-weight lanes (flags=NO_HIT -> dead, never detected)."""
    from chroma_tpu.event import NO_HIT
    nsh = int(mesh.devices.size)
    n = len(state)
    pad = (-n) % nsh
    if pad == 0:
        return state, n

    def _pad(a):
        widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, widths)

    padded = jax.tree_util.tree_map(_pad, state)
    padded = padded.replace(
        flags=padded.flags.at[n:].set(jnp.uint32(NO_HIT)),
        last_hit_triangle=padded.last_hit_triangle.at[n:].set(-1),
        cur_mat=None if state.cur_mat is None
        else padded.cur_mat.at[n:].set(-1))
    return padded, n


def reduce_channel_arrays(local):
    """Combine per-shard ChannelArrays across the photon mesh axis with the
    reference's exact atomic semantics (reference: cuda/daq.cu:73-75):
    earliest time -> pmin, charge -> psum, history -> bitwise OR (per-bit
    psum then recombine: the replication of the result is statically
    inferable, unlike a gathered reduce). Call inside shard_map."""
    earliest = jax.lax.pmin(local.earliest_time, AXIS)
    charge = jax.lax.psum(local.charge, AXIS)
    bits = (local.histories[:, None]
            >> jnp.arange(32, dtype=jnp.uint32)[None, :]) & jnp.uint32(1)
    bit_any = jax.lax.psum(bits.astype(jnp.int32), AXIS) > 0
    histories = jnp.sum(
        bit_any.astype(jnp.uint32)
        << jnp.arange(32, dtype=jnp.uint32)[None, :],
        axis=1, dtype=jnp.uint32)
    return local.replace(earliest_time=earliest, charge=charge,
                         histories=histories)
