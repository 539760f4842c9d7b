"""Multi-chip scaling: shard the photon axis, replicate the geometry.

The reference is strictly single-GPU per Simulation; cross-node scaling
happens at the service level (SURVEY §2.3, §5.8). On TPU the natural
scale-out is intra-pod: photons are data-parallel over a 1-D device mesh
via shard_map (each chip propagates its shard against a replicated
geometry — no communication in the hot loop), and the DAQ channel
reductions ride ICI collectives:

  earliest hit time  -> pmin over the photon axis
  channel charge     -> psum
  channel history OR -> all_gather + local bitwise OR

This mirrors the reference's intra-GPU atomics -> ICI collectives mapping
called out in SURVEY §2.3.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from chroma_tpu.ops.photon import propagate_step
from chroma_tpu.ops import daq as daq_ops

AXIS = 'photons'


def photon_mesh(n_devices=None, devices=None):
    "A 1-D device mesh over the photon axis."
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    import numpy as np
    return Mesh(np.asarray(devices).reshape(-1), (AXIS,))


def _shard_key(key):
    "Give each shard an independent random stream."
    return jax.random.fold_in(key, jax.lax.axis_index(AXIS))


def _local_steps(photons, geometry, key, nsteps, use_weights,
                 scatter_first):
    "Propagate the local shard for up to nsteps (early exit when dead)."
    scatter_first = jnp.asarray(scatter_first, dtype=jnp.int32)

    def cond(carry):
        i, ph = carry
        return (i < nsteps) & jnp.any(ph.alive)

    def body(carry):
        i, ph = carry
        step_key = jax.random.fold_in(key, i)
        sf = jnp.where(i == 0, scatter_first, 0)
        ph = propagate_step(ph, geometry, step_key, use_weights=use_weights,
                            scatter_first=sf)
        return i + 1, ph

    _, photons = jax.lax.while_loop(cond, body, (0, photons))
    return photons


def propagate_sharded(photons, geometry, key, max_steps=100, mesh=None,
                      use_weights=False, scatter_first=0):
    """Propagate a photon batch sharded over the mesh's photon axis.
    The batch length must divide evenly by the mesh size."""
    if mesh is None:
        mesh = photon_mesh()

    @jax.jit
    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(AXIS), P(), P()), out_specs=P(AXIS))
    def run(ph, geom, key):
        return _local_steps(ph, geom, _shard_key(key), max_steps,
                            use_weights, scatter_first)

    return run(photons, geometry, key)


def propagate_and_daq_sharded(photons, geometry, key, max_steps=100,
                              mesh=None, use_weights=False,
                              scatter_first=0):
    """Full sharded step: propagate the photon shards, then reduce the DAQ
    channel arrays across chips (pmin for earliest time, psum for charge,
    gathered OR for histories). Returns (photons, ChannelArrays), with the
    channel arrays replicated on every chip."""
    if mesh is None:
        mesh = photon_mesh()

    @jax.jit
    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(AXIS), P(), P()),
             out_specs=(P(AXIS), P()))
    def run(ph, geom, key):
        key = _shard_key(key)
        ph = _local_steps(ph, geom, key, max_steps, use_weights,
                          scatter_first)
        local = daq_ops.run_daq(ph, geom, jax.random.fold_in(key, 0x7fffffff))
        return ph, reduce_channel_arrays(local)

    return run(photons, geometry, key)


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
