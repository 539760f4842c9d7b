"""Propagation driver: jitted multi-step loop + host-side batch compaction.

The reference retires finished photons through device work queues with
warp-aggregated atomics (reference: chroma/cuda/propagate.cu:280-365,
chroma/gpu/photon.py:226-293). On TPU the equivalent economics are:

  * inside jit: a lax.while_loop over steps that exits early once every
    lane is terminated — no queues, dead lanes are masked;
  * between jit launches: when the live fraction drops, the host gathers
    the survivors into a smaller power-of-two buffer and continues with a
    (cached) smaller program — this replaces the reference's queue-swap
    shrinkage, because masked-out lanes still cost FLOPs on a vector
    machine;
  * the reference's "few photons left -> just finish all remaining steps"
    heuristic (gpu/photon.py:259-264) carries over directly.
"""
from __future__ import annotations

import math
import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from chroma_tpu import event
from chroma_tpu.ops.photon import PhotonState, propagate_step
from chroma_tpu.profiler import profiler

# steps per jit launch between compaction checks
DEFAULT_STEP_CHUNK = 2
MIN_BATCH = 256


def photon_state_from_host(photons):
    "Upload an event.Photons batch to a device PhotonState."
    dirs = np.asarray(photons.dir, dtype=np.float32)
    pols = np.asarray(photons.pol, dtype=np.float32)

    def _norm(v):
        n = np.linalg.norm(v, axis=-1, keepdims=True)
        return v / np.where(n > 0, n, 1.0)

    return PhotonState(
        pos=jnp.asarray(photons.pos, dtype=jnp.float32),
        dir=jnp.asarray(_norm(dirs)),
        pol=jnp.asarray(_norm(pols)),
        wavelength=jnp.asarray(photons.wavelengths, dtype=jnp.float32),
        t=jnp.asarray(photons.t, dtype=jnp.float32),
        weight=jnp.asarray(photons.weights, dtype=jnp.float32),
        flags=jnp.asarray(photons.flags, dtype=jnp.uint32),
        last_hit_triangle=jnp.asarray(photons.last_hit_triangles,
                                      dtype=jnp.int32),
        evidx=jnp.asarray(photons.evidx, dtype=jnp.uint32),
        # medium unknown until the first geometry query resolves it
        cur_mat=jnp.full(len(photons.pos), -1, dtype=jnp.int32),
    )


def photon_state_to_host(state, channel=None):
    """Download a PhotonState to an event.Photons batch.

    jax.device_get starts the copies for every field asynchronously
    before blocking, so the whole state costs ONE transfer latency —
    field-by-field np.asarray paid ~9 round trips through the remote
    runtime."""
    host = jax.device_get(state)
    return event.Photons(
        pos=host.pos,
        dir=host.dir,
        pol=host.pol,
        wavelengths=host.wavelength,
        t=host.t,
        last_hit_triangles=host.last_hit_triangle,
        flags=host.flags,
        weights=host.weight,
        evidx=host.evidx,
        channel=channel,
    )


def _steps_loop(photons, geometry, key, start_step, nsteps, use_weights,
                scatter_first, prune, trav_stages=None, record=0):
    """Shared early-exiting step loop (traced inside the jitted programs).

    record > 0 (a STATIC count) additionally returns a (record,) i32
    array of the alive count after each step — the probe bomb's
    PER-STEP survival curve. The schedule tuner needs every step:
    interpolating between sparse stage-boundary counts underestimates
    the survivors mid-stage (decay flattens with depth), and a bucket
    tuned one step too tight overflows lanes into the un-compacted
    mop-up loop, which runs them to max_steps at suffix width
    (measured: one 8k-lane overflow at a 131k suffix cost ~2.3 s of a
    1.25 s bomb). Entries past an early exit stay 0 (everything dead)."""
    scatter_first = jnp.asarray(scatter_first, dtype=jnp.int32)

    def cond(carry):
        i, ph = carry[:2]
        return (i < nsteps) & jnp.any(ph.alive)

    def body(carry):
        i, ph = carry[:2]
        abs_step = start_step + i
        step_key = jax.random.fold_in(key, abs_step)
        sf = jnp.where(abs_step == 0, scatter_first, 0)
        ph = propagate_step(ph, geometry, step_key, use_weights=use_weights,
                            scatter_first=sf, prune=prune,
                            trav_stages=trav_stages)
        if not record:
            return i + 1, ph
        counts = carry[2].at[jnp.minimum(i, record - 1)].set(
            jnp.sum(ph.alive.astype(jnp.int32)))
        return i + 1, ph, counts

    init = (jnp.asarray(0, jnp.int32), photons)
    if record:
        init = init + (jnp.zeros(record, jnp.int32),)
    out = jax.lax.while_loop(cond, body, init)
    steps_done, photons = out[:2]
    # the live count rides along in the same program so the driver's
    # bucket decision costs one host read of an already-computed scalar
    # instead of a separate dispatch (remote sync ~74 ms either way, but
    # the extra ~25 ms count launch is gone)
    alive = jnp.sum(photons.alive.astype(jnp.int32))
    if record:
        return photons, steps_done, alive, out[2]
    return photons, steps_done, alive


@partial(jax.jit, static_argnames=('use_weights', 'prune', 'trav_stages'))
def run_steps(photons, geometry, key, start_step, nsteps, use_weights=False,
              scatter_first=0, prune=True, trav_stages=None):
    """Run up to `nsteps` propagation steps, exiting early when every
    photon has terminated. Keys derive from (key, absolute step), so for a
    FIXED batch layout any resume chunking gives identical histories;
    after a compaction the lane order changes and draws reassign (the
    reference's thread-keyed curand has the same property). Results are
    exactly reproducible for a given (seed, chunking) and
    distribution-identical across chunkings. scatter_first only applies
    at absolute step 0 (reference: propagate.cu:319).

    `nsteps` is a DYNAMIC operand: the while_loop bound is data-dependent
    anyway, and keeping it out of the jit key means one compiled program
    per batch shape instead of one per (shape, chunk length) pair — the
    finish-remaining heuristic alone would otherwise mint a fresh
    10-40 s remote compile for every distinct remaining-step count."""
    return _steps_loop(photons, geometry, key, start_step, nsteps,
                       use_weights, scatter_first, prune, trav_stages)


def _next_pow2(x):
    return max(MIN_BATCH, 1 << int(np.ceil(np.log2(max(x, 1)))))


@jax.jit
def _count_alive(photons):
    return jnp.sum(photons.alive.astype(jnp.int32))


# All lane movement below (write-back scatters, compaction gathers)
# moves the photon state as ONE packed (N, C) f32 matrix: per-field
# (N,)/(N,3) gathers are latency-bound at ~14-23 ns/ROW regardless of
# row width or index locality, so a 13-array state costs ~13x one
# fat-row gather; the pack/unpack relayout XLA fuses for ~3 ms at 1M
# lanes. Measured at 1M lanes (v5e): full-state permute 140-230 ms
# per-field vs 9.6 ms packed; take-bucket+scatter boundary 251 ms vs
# 29.5 ms.


def _scatter_mat(final_mat, orig_idx, current):
    return final_mat.at[orig_idx].set(_ps_pack(current))


_scatter_into_donated = jax.jit(_scatter_mat, donate_argnums=0)


@jax.jit
def _ps_pack_jit(photons):
    return _ps_pack(photons)


@partial(jax.jit, donate_argnums=0)
def _scatter_unpack_donated(final_mat, orig_idx, current):
    "Final write-back + unpack to a PhotonState, one launch."
    return _ps_unpack(final_mat.at[orig_idx].set(_ps_pack(current)),
                      current)


COMPACT_SORT = os.environ.get('CHROMA_COMPACT_SORT', '0') != '0'


def _compact_sel(current, bucket):
    """Lane selection for device-side compaction: stable-partition live
    lanes to the front, keep the first `bucket`. Replaces the reference's
    queue swap (gpu/photon.py:277-286) without any host transfer.
    O(N) cumsums + one iota scatter (no sort).

    CHROMA_COMPACT_SORT=1 instead orders the surviving lanes by a coarse
    position+direction Morton key (the reference sorts rays for warp
    coherence with tools.argsort_direction; here the win would be HBM
    row reuse between adjacent traversal gathers)."""
    act = current.alive
    if COMPACT_SORT:
        d = current.dir
        p = current.pos
        def q(v, lo, hi, bits):
            x = jnp.clip((v - lo) / (hi - lo), 0.0, 1.0)
            return (x * ((1 << bits) - 1)).astype(jnp.uint32)
        # 3x3 position bits (coarse cell) then 3x3 direction bits
        lo = jnp.min(p, axis=0)
        hi = jnp.max(p, axis=0) + 1e-3
        keyv = jnp.zeros(d.shape[0], jnp.uint32)
        for ax in range(3):
            keyv = (keyv << jnp.uint32(3)) | q(p[:, ax], lo[ax], hi[ax], 3)
        for ax in range(3):
            keyv = (keyv << jnp.uint32(3)) | q(d[:, ax], -1.0, 1.0, 3)
        keyv = jnp.where(act, keyv, jnp.uint32(0xFFFFFFFF))
        return jnp.argsort(keyv)[:bucket]
    _, perm = _ps_compact_perm(act)
    return perm[:bucket]


def _fused_chunk_impl(final_mat, current, orig_idx, geometry, key,
                      start_step, nsteps, bucket, use_weights,
                      scatter_first, prune, trav_stages=None):
    """One chunk boundary + next chunk as a SINGLE program: write the
    finished batch back into the packed `final_mat`, compact survivors
    into `bucket` lanes, and run the next `nsteps`. Each separate launch
    through the remote runtime costs ~45 ms of host dispatch; fusing the
    three per-boundary programs into one is worth ~15-20% end-to-end on
    a 1M-photon bomb."""
    cmat = _ps_pack(current)
    final_mat = final_mat.at[orig_idx].set(cmat)
    sel = _compact_sel(current, bucket)
    current = _ps_unpack(cmat[sel], current)
    orig_idx = orig_idx[sel]
    current, steps_done, alive = _steps_loop(
        current, geometry, key, start_step, nsteps, use_weights,
        scatter_first, prune, trav_stages)
    return final_mat, current, orig_idx, steps_done, alive


# `final_mat` is always driver-owned (packed upfront), so donate it.
# `bucket` shapes the compacted slice (static); `nsteps` stays dynamic
# (see run_steps)
_fused_chunk_donated = jax.jit(
    _fused_chunk_impl,
    static_argnames=('bucket', 'use_weights', 'prune', 'trav_stages'),
    donate_argnums=(0,))


# ---------------------------------------------------------------------------
# fully-fused bomb: the whole multi-chunk drive as ONE device program
# ---------------------------------------------------------------------------
#
# The chunked driver below still pays a ~74 ms host sync per chunk
# boundary (the 4-byte alive count that picks the next bucket size) —
# ~6-8 of them per 1M-photon bomb, i.e. ~40% of the wall time. The fused
# program removes every intermediate sync by baking a STATIC compaction
# schedule ((steps, divisor) stages) into one jit: each stage runs a
# bounded early-exiting step loop, front-packs the survivors, recurses on
# a 1/div prefix slice, and mops up rare overflow lanes (survivors beyond
# the slice) with a bounded loop over the suffix slice — overflow costs
# nothing when absent because its while_loop exits immediately.
#
# Lane permutes move the state as ONE packed (N, C) f32 matrix: row
# gathers cost ~8-21 ns/row nearly independent of row width, so permuting
# 16 (N,) fields separately costs ~16x one fat-row permute.

_PS_VEC = ('pos', 'dir', 'pol')          # (N,3) f32
_PS_SCALAR = ('wavelength', 't', 'weight', 'flags', 'last_hit_triangle',
              'evidx', 'cur_mat')        # (N,) mixed dtypes


def _ps_pack(ps):
    "PhotonState -> one (N, C) f32 matrix (ints bitcast, not converted)."
    cols = []
    for name in _PS_VEC:
        cols.append(getattr(ps, name))
    for name in _PS_SCALAR:
        a = getattr(ps, name)
        if a is None:
            continue
        if a.dtype != jnp.float32:
            a = jax.lax.bitcast_convert_type(a, jnp.float32)
        cols.append(a[:, None])
    return jnp.concatenate(cols, axis=1)


def _ps_unpack(mat, proto):
    "Inverse of _ps_pack; `proto` supplies dtypes and None-ness."
    out = {}
    c = 0
    for name in _PS_VEC:
        out[name] = mat[:, c:c + 3]
        c += 3
    for name in _PS_SCALAR:
        a = getattr(proto, name)
        if a is None:
            out[name] = None
            continue
        col = mat[:, c]
        if a.dtype != jnp.float32:
            col = jax.lax.bitcast_convert_type(col, a.dtype)
        out[name] = col
        c += 1
    return PhotonState(**out)


def _ps_take(ps, idx):
    "Permute/slice lanes of a PhotonState via one fat-row gather."
    return _ps_unpack(_ps_pack(ps)[idx], ps)


def _parse_schedule(spec):
    if not spec or spec in ('none', 'off', '0'):
        return ()
    return tuple(tuple(int(x) for x in part.split(':'))
                 for part in spec.split(','))


# width below which compaction stops paying (per-step cost is dominated
# by the while_loop iteration floor, not lane count)
SCHED_FLOOR = 2048

# conservative first-bomb schedule: divisor 2 everywhere tolerates up to
# ~50% single-stage survival; its boundary alive counts feed the tuner
PROBE_SCHEDULE = ((1, 2), (2, 2), (2, 2), (4, 2), (8, 2), (16, 2))


def _resolve_width(width, ent):
    """Next-stage lane count for a schedule entry at current `width`.

    A schedule entry is (steps, w) where w < 1024 is a DIVISOR of the
    current width (the original pow2-bucket form, batch-size portable)
    and w >= 1024 is an ABSOLUTE lane count (emitted by the cost-model
    tuner, which picks non-pow2 bucket widths — survivor decay is
    gradual, and rounding every bucket up to a power of two wastes up to
    2x the lane-steps; schedules with absolute widths are only cached
    per (geometry, batch) so the widths always match their batch)."""
    d = int(ent[1])
    return min(d, width) if d >= 1024 else width // d


def _trim_schedule(sched, n):
    out = []
    width = n
    pending = 0          # spans of dropped no-op boundaries
    for ent in sched:
        steps = int(ent[0]) + pending
        pending = 0
        m = _resolve_width(width, ent)
        if m >= width:   # no-op boundary (absolute width >= current)
            pending = steps
            continue
        if m < max(SCHED_FLOOR, MIN_BATCH):
            break
        out.append((steps, int(ent[1])))
        width = m
    return tuple(out)


def _boundary_steps(sched, max_steps):
    "Cumulative step index at each stage boundary of a schedule."
    out, c = [], 0
    for steps, _ in sched:
        c = min(c + steps, max_steps)
        out.append(c)
    return out


def _survival_fn(n, boundary_steps, alive_counts):
    """Geometric interpolation of a probe bomb's measured survival curve
    ((step, alive count) points) -> alive_fraction(step)."""
    pts = [(0, 1.0)]
    for s, a in zip(boundary_steps, alive_counts):
        pts.append((s, max(float(a) / n, 0.25 / n)))

    def alive_at(step):
        if step <= 0:
            return 1.0
        for (s0, f0), (s1, f1) in zip(pts, pts[1:]):
            if step <= s1:
                w = (step - s0) / max(s1 - s0, 1)
                return f0 * (f1 / f0) ** w
        # extrapolate past the probe with the last segment's decay rate
        (s0, f0), (s1, f1) = pts[-2], pts[-1]
        rate = min((f1 / f0) ** (1.0 / max(s1 - s0, 1)), 0.97)
        return f1 * rate ** (step - s1)

    return alive_at


def _round_lanes(w):
    "Round a lane count UP to a multiple of 1024 (layout-friendly)."
    return max(((int(w) + 1023) // 1024) * 1024, 1024)


# cost-model constants for the schedule tuner, in per-lane-step units
# (measured at 1M lanes, headline detector: one full-width step ~200 ms
# -> ~190 ns/lane; the empty while_loop floor ~2-4 ms -> ~0.015n; a
# compaction boundary = front-pack cumsum/scatter + one fat-row permute
# ~ a tenth of a step at that width plus a small fixed launch cost)
# cost-model constants for the schedule tuner, in LANE-STEP units
# (measured, headline detector, v5e: per-lane step cost is a flat
# ~240-260 ns/lane at the per-width-best traversal spec, the loop/launch
# floor is ~6-8 ms/step ~ 30k lane-equivalents ABSOLUTE, and a boundary
# costs about a tenth of a step at its width)
# round-5 stage decomposition (tools_exp/exp_stage_costs, headline):
# a 2048-wide step costs ~0.5 ms against ~134 ns/lane at 1M width ->
# the floor is ~4k lane-equivalents, not the r4 estimate of 30k
SCHED_FLOOR_LANES = 5000     # per-step floor (absolute lanes-equivalent)
SCHED_BOUNDARY_FRAC = 0.10   # boundary cost, as a fraction of width
SCHED_BOUNDARY_LANES = 8000  # boundary fixed cost (absolute)
SCHED_MAX_STAGES = int(os.environ.get('CHROMA_SCHED_MAX_STAGES', '12'))


def _tune_schedule(n, boundary_steps, alive_counts, max_steps):
    """Derive a compaction schedule from a measured survival curve
    ((step, alive count) points from a probe bomb) by dynamic
    programming over a width ladder.

    The ladder holds NON-pow2 widths ({n/2^k} U {3n/2^(k+2)}): survivor
    decay is gradual (headline detector ~0.82x/step), so pow2-only
    buckets run at ~55% average occupancy — steps 5-12 of the headline
    bomb ran a 256k bucket carrying 134k->34k live lanes. The DP walks
    the modeled per-step cost (width + loop floor) and boundary cost
    (front-pack + fat-row permute), choosing when to compact and to
    which ladder width; a 1.3x margin over the measured survivors keeps
    overflow into the full-suffix mop-up loop rare (overflow lanes run
    un-compacted to max_steps, so an optimistic width is catastrophic).
    Emitted entries carry ABSOLUTE widths (see _resolve_width)."""
    if not len(alive_counts):
        return ()
    # 1.3 before round 5: the margin guarded the then-catastrophic
    # full-suffix overflow loop (one 8k-lane overflow at a 131k suffix
    # measured ~2.3 s). With overflow lanes now front-packed into a
    # small mop bucket (see _fused_bomb_impl), the margin only needs to
    # cover run-to-run survival jitter (< 12.5%, the count quantization)
    margin = float(os.environ.get('CHROMA_SCHED_MARGIN', '1.15'))
    # quantize the measured counts to a 3-bit mantissa (round UP): raw
    # counts jitter a few % run to run, and any change in the derived
    # schedule is a fresh trace that misses the persistent jit cache
    # (~2 min recompile); the <12.5% slack is inside the margin
    alive_counts = [0 if a <= 0 else
                    int(math.ceil(a / (1 << max(int(a).bit_length() - 4, 0)))
                        * (1 << max(int(a).bit_length() - 4, 0)))
                    for a in (int(a) for a in alive_counts)]
    alive_at = _survival_fn(n, boundary_steps, alive_counts)
    floor_w = max(SCHED_FLOOR, MIN_BATCH)

    # three rungs per octave (1, 3/4, 5/8): measured occupancy of the
    # round-3 two-rung ladder was 62% of ideal lane-steps — survivor
    # decay (~0.78x/step headline) outpaces 1.33x-spaced rungs, and each
    # missing rung costs a stage of ~20% padding
    ws = set()
    for k in range(0, 14):
        if (n >> k) < floor_w:
            break
        ws.add(_round_lanes(n >> k))
        for num, den in ((3, 4), (5, 8)):
            w = _round_lanes(num * (n >> k) // den)
            if floor_w <= w < n:
                ws.add(w)
    ladder = sorted((w for w in ws if w <= n), reverse=True)
    if not ladder or ladder[0] != n:
        ladder = [n] + [w for w in ladder if w < n]
    nl = len(ladder)

    F = min(SCHED_FLOOR_LANES, 0.05 * n)
    H = int(max_steps)
    from functools import lru_cache

    horizon = int(boundary_steps[-1]) if len(boundary_steps) else 0

    @lru_cache(maxsize=None)
    def need(s):
        # past the measured horizon the curve is extrapolated at the
        # last segment's decay rate, but the surviving tail is exactly
        # the long-lived minority whose decay SLOWS — double the margin
        # out there rather than risk the mop-up
        m = margin * (2.0 if s > horizon else 1.0)
        return max(alive_at(s) * m * n, MIN_BATCH)

    @lru_cache(maxsize=None)
    def V(s, i, nb):
        "Min modeled cost of steps s..H at width ladder[i], nb stages left."
        if s >= H:
            return 0.0
        w = ladder[i]
        best = (w + F) + V(s + 1, i, nb)
        if nb > 0 and s > 0:
            # compact to the smallest ladder width holding margin*alive
            j = None
            for cand in range(nl - 1, i, -1):
                if ladder[cand] >= need(s):
                    j = cand
                    break
            if j is not None:
                cost = (SCHED_BOUNDARY_FRAC * w
                        + SCHED_BOUNDARY_LANES + V(s, j, nb - 1))
                if cost < best:
                    best = cost
        return best

    # reconstruct: walk forward, emitting (span, absolute width) entries.
    # V(s,...) recurses to the horizon before the cache warms, so the
    # recursion limit must cover H frames (default max_steps=1000 blew
    # the default 1000-frame limit through the caller's stack)
    import sys
    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 2 * H + 500))
    try:
        sched = []
        s, i, nb, span = 0, 0, SCHED_MAX_STAGES, 0
        while s < H:
            w = ladder[i]
            here = V(s, i, nb)
            stepped = (w + F) + V(s + 1, i, nb)
            if abs(here - stepped) < 1e-6 * max(here, 1.0):
                s += 1
                span += 1
                continue
            for cand in range(nl - 1, i, -1):
                if ladder[cand] >= need(s):
                    sched.append((span, int(ladder[cand])))
                    i, nb, span = cand, nb - 1, 0
                    break
            else:                  # pragma: no cover — defensive
                s += 1
                span += 1
    finally:
        sys.setrecursionlimit(old_limit)
    return tuple(sched)


def _per_stage_specs(trav_stages):
    """Normalize a trav_stages static arg: either ONE flat traversal
    spec ((visits, div), ...) applied at every fused stage, or a
    per-stage tuple of such specs (one per fused-schedule stage, last
    entry reused for the tail) — distinguished by nesting depth."""
    if not trav_stages:
        return None
    if isinstance(trav_stages[0], tuple) and (
            trav_stages[0] == () or isinstance(trav_stages[0][0], tuple)):
        return trav_stages          # already per-stage
    return (trav_stages,)           # flat spec -> same at every stage


def _fused_bomb_impl(photons, geometry, key, schedule, max_steps,
                     use_weights, scatter_first, prune, report=False,
                     trav_stages=None, extract_m=0):
    """The whole bomb as one traced program (see module comment above).
    Returns (final PhotonState, extras..., abort flag) — the NAN_ABORT
    check rides in the same program, so the driver's warning costs one
    scalar in an already-paid sync instead of a separate launch + sync
    (~0.12 s per bomb through the remote runtime).

    With report=True the extras include the alive count after each
    stage's bounded loop (stacked i32) — the probe bomb's survival curve
    for _tune_schedule, read back only after the program completes.

    With extract_m > 0 the extras include the flat-hit extraction
    (reference: gpu/photon.py:141-209): the detected minority
    front-packed into extract_m lanes as a PhotonState plus its channel
    ids and the true detected count — so the Simulation pays ONE
    dispatch and one minority transfer per event instead of separate
    propagate / abort-check / pack / count / gather launches.

    trav_stages may be one flat traversal staging spec or a PER-STAGE
    tuple of specs: each fused-schedule stage's population has a
    different visit-count tail (survivors walk longer the deeper the
    propagation — headline detector: frac(v>40) is 0.02% of step-0 rays
    but 32% of step-5 survivors), so each compaction bucket gets its own
    boundary."""
    counts = []
    specs = _per_stage_specs(trav_stages)
    nstages = len(schedule)

    def spec_at(k):
        if specs is None:
            return trav_stages      # None or () verbatim
        return specs[min(k, len(specs) - 1)]

    def stage(ph, start, sched, salt):
        n = len(ph)
        k = nstages - len(sched)
        skey = jax.random.fold_in(key, salt) if salt else key
        if not sched or start >= max_steps:
            ph, _, _ = _steps_loop(ph, geometry, skey, start,
                                   max_steps - start, use_weights,
                                   scatter_first, prune, spec_at(k))
            return ph
        nsteps = min(sched[0][0], max_steps - start)
        rec = nsteps if (report and salt == 0) else 0
        out = _steps_loop(ph, geometry, skey, start, nsteps,
                          use_weights, scatter_first, prune,
                          spec_at(k), record=rec)
        ph = out[0]
        if rec:
            counts.append(out[3])   # per-step alive curve of this stage
        start2 = start + nsteps
        m = _resolve_width(n, sched[0])
        if start2 >= max_steps or m < MIN_BATCH or m >= n:
            return ph
        dest, perm = _ps_compact_perm(ph.alive)
        php = _ps_take(ph, perm)
        prefix = jax.tree_util.tree_map(lambda a: a[:m], php)
        suffix = jax.tree_util.tree_map(lambda a: a[m:], php)
        prefix = stage(prefix, start2, sched[1:], salt)
        # overflow lanes (survivors beyond the slice — rare by
        # construction) finish on their own salted stream. Running them
        # at the full (n - m) suffix width was the one catastrophic
        # path in the driver (measured: one 8k-lane overflow at a 131k
        # suffix cost ~2.3 s of a 1.25 s bomb), which forced wide
        # safety margins on the schedule tuner. Instead: when any
        # suffix lane is alive (the lax.cond skips everything when not
        # — the common case costs one reduction), front-pack the
        # overflow into a small m2 bucket and finish THERE; the final
        # full-suffix loop only runs lanes beyond m2 (~never) and
        # exits immediately otherwise.
        okey = jax.random.fold_in(skey, 0x5F3759DF)
        m2 = max(min(m // 4, 1 << 16), MIN_BATCH)
        if len(php.t) - m > m2 * 2:
            def mop(sfx):
                sdest, sperm = _ps_compact_perm(sfx.alive)
                sp = _ps_take(sfx, sperm)
                pre = jax.tree_util.tree_map(lambda a: a[:m2], sp)
                post = jax.tree_util.tree_map(lambda a: a[m2:], sp)
                pre, _, _ = _steps_loop(
                    pre, geometry, okey, start2, max_steps - start2,
                    use_weights, scatter_first, prune, spec_at(k + 1))
                post, _, _ = _steps_loop(
                    post, geometry, jax.random.fold_in(okey, 1), start2,
                    max_steps - start2, use_weights, scatter_first,
                    prune, spec_at(k + 1))
                sp = jax.tree_util.tree_map(
                    lambda a, b: jnp.concatenate([a, b], axis=0),
                    pre, post)
                return _ps_take(sp, sdest)

            suffix = jax.lax.cond(jnp.any(suffix.alive), mop,
                                  lambda s: s, suffix)
        else:
            suffix, _, _ = _steps_loop(
                suffix, geometry, okey, start2, max_steps - start2,
                use_weights, scatter_first, prune, spec_at(k + 1))
        php = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a, b], axis=0), prefix, suffix)
        return _ps_take(php, dest)

    out = stage(photons, 0, tuple(schedule), 0)
    extras = ()
    if report:
        # one flat (total probe steps,) per-step survival curve
        extras += (jnp.concatenate(counts) if counts
                   else jnp.zeros(0, jnp.int32),)
    if extract_m:
        from chroma_tpu.ops import daq as daq_ops
        channel, perm, n_det = daq_ops.flat_hit_pack(out, geometry)
        sel = perm[:extract_m]
        extras += (_ps_take(out, sel), channel[sel], n_det)
    abort = jnp.any((out.flags & jnp.uint32(event.NAN_ABORT)) != 0)
    return (out,) + extras + (abort,)


def _ps_compact_perm(active):
    "Stable front-pack permutation (dest, perm); O(N), no sort."
    act = active.astype(jnp.int32)
    n_act = jnp.sum(act)
    fwd = jnp.cumsum(act) - 1
    bwd = n_act + jnp.cumsum(1 - act) - 1
    dest = jnp.where(active, fwd, bwd)
    perm = jnp.zeros_like(dest).at[dest].set(
        jnp.arange(dest.shape[0], dtype=dest.dtype))
    return dest, perm


_fused_bomb = jax.jit(
    _fused_bomb_impl,
    static_argnames=('schedule', 'max_steps', 'use_weights',
                     'scatter_first', 'prune', 'report', 'trav_stages',
                     'extract_m'))


USE_FUSED = os.environ.get('CHROMA_FUSED', '1') != '0'

# Learned performance state, keyed by the geometry's CONTENT fingerprint
# (chroma_tpu.perfcache; falls back to a session id-key for geometries
# built outside the registered paths). Tuned entries write through to
# <CHROMA_CACHE_DIR>/perf/<fp>.json so a cold process reuses the probe
# work (VERDICT r3 item 6: no probe bomb, no resize retries on restart).

# per-(geometry, batch, max_steps) tuned schedules
_SCHED_CACHE = {}

# per-geometry tuned traversal staging specs (see _tune_stages)
_STAGE_CACHE = {}

# per-geometry visit distributions measured by the pilot (depth -> np
# visits array), consumed by _tune_stage_specs after the schedule probe
_DIST_CACHE = {}

# per-(geometry, batch, max_steps) PER-FUSED-STAGE traversal specs
_PSTAGE_CACHE = {}

# per-(geometry, batch) raw probe survival curves (diagnostics)
_PROBE_COUNTS = {}

# smallest batch worth a staging pilot (tests shrink this)
_PILOT_MIN = 1 << 17


def perf_key(geometry):
    "Content-fingerprint cache key of a geometry (see chroma_tpu.perfcache)."
    from chroma_tpu import perfcache
    return perfcache.key_of(geometry)


def _dist_summary(v, keep=512):
    """JSON-ready summary of a visit distribution: a sorted quantile
    subsample (plus the exact max). _best_stage_spec only consumes
    mean(v > b) and max(v), both of which a 512-point sorted sample
    preserves to ~0.2% — far inside STAGE_MARGIN."""
    v = np.sort(np.asarray(v))
    if len(v) > keep:
        idx = np.linspace(0, len(v) - 1, keep).round().astype(np.int64)
        v = v[idx]
    return [int(x) for x in v]


def _dists_lookup(pk):
    """Pilot visit distributions for a geometry fingerprint: session
    cache first, then the persisted perf entry (the pilot is a real
    hardware run — losing its result to a process death must not
    poison later schedule tuning, VERDICT r5 regression)."""
    from chroma_tpu import perfcache
    if pk in _DIST_CACHE:
        return _DIST_CACHE[pk]
    if perfcache.persistent(pk):
        ent = perfcache.load(pk).get('dists')
        if ent:
            dists = {int(d): np.asarray(v) for d, v in ent.items()}
            _DIST_CACHE[pk] = dists
            return dists
    return None


def _tune_stages(photons, geometry, key, use_weights, scatter_first,
                 prune):
    """Probe the geometry's traversal visit-count distribution and derive
    a CARRIED-STATE staging spec for intersect_mesh_instanced.

    The lockstep traversal loop runs to the MAX visit count over the
    batch; on large instanced detectors the distribution is heavy-tailed
    (headline detector, mid-propagation: mean 24-36 visits, p99 45-76,
    max 205 — the whole batch pays 205), while compact detectors are
    tight (demo detector: max ~60) and staging only adds boundary cost.

    A pilot on a 64k slice measures the visit distribution at several
    propagation DEPTHS (0, 1, 3, 7, 15 steps), because the populations
    differ sharply: a photon bomb's step-0 rays all leave from one
    point and finish together (headline: max 43 visits), while deep
    survivors are the scattered/reflected minority that walks longest
    (headline: frac(v>40) is 0.02% at step 0 but 32% among step-5
    survivors). The distributions are stored for the per-fused-stage
    tuner (_tune_stage_specs); the flat spec returned here — used for
    the probe bomb and the chunked driver — is the earliest boundary b
    where EVERY measured population's still-walking fraction times a 4x
    safety margin fits a 1/16 slice. Overflow past the slice finishes
    at FULL width, so an optimistic boundary is catastrophic (measured
    at headline scale: boundary 40 tuned from shallow populations alone
    gives 621k photons/s, 48 gives 808k, unstaged 431k). No staging
    unless a deep tail (>=24 visits) remains past b."""
    n = len(photons)
    m = min(n, 1 << 16)
    pilot = jax.tree_util.tree_map(lambda a: a[:m], photons)
    k = min(m, 1 << 15)
    dists = {0: _visit_sample(pilot, geometry, k, m)}

    cur, depth = pilot, 0
    for target in (1, 3, 7, 15):
        cur, _, alive = run_steps(cur, geometry, key, depth,
                                  target - depth,
                                  use_weights=use_weights,
                                  scatter_first=scatter_first,
                                  prune=prune, trav_stages=())
        depth = target
        n_alive = int(alive)
        if n_alive < 512:
            break
        _, perm = _ps_compact_perm(cur.alive)
        cur = _ps_take(cur, perm)
        dists[depth] = _visit_sample(cur, geometry, k, n_alive)
    pk = perf_key(geometry)
    _DIST_CACHE[pk] = dists
    from chroma_tpu import perfcache
    perfcache.update(pk, {'dists': {str(d): _dist_summary(v)
                                    for d, v in dists.items()}})

    div, margin = 16, 4.0
    # flat spec: satisfy the shallow populations (the probe bomb's
    # large-width stages) with a wide margin — the flat spec also runs
    # at the deep buckets whose tails are 10-40x heavier, and the
    # measured flat-spec ladder at headline scale peaks at the boundary
    # this margin selects (b=48: 808k photons/s; 40: 622k; 56: 749k;
    # 64: 700k). Depth>=3 tails are the per-stage tuner's job.
    pops = [v for d, v in dists.items() if d <= 1]
    vmax = int(max(v.max() for v in pops))
    for b in range(8, vmax, 8):
        if all(float(np.mean(v > b)) * margin <= 1.0 / div
               for v in pops):
            break
    else:
        return ()
    if vmax - b < 24:          # tail too shallow to pay the boundary
        return ()
    return ((b, div),)


def _visit_sample(photons, geometry, k, n_valid):
    "Visit counts of the first min(k, n_valid) lanes (np array)."
    from chroma_tpu.ops.mesh_wide import traversal_visits
    sub = jax.tree_util.tree_map(lambda a: a[:k], photons)
    v, _, _ = traversal_visits(sub.pos, sub.dir, geometry.wide,
                               sub.last_hit_triangle, mask=sub.alive)
    return np.asarray(v)[:min(n_valid, k)]


# Traversal staging cost model (headline detector, v5e, measured via
# per-step sweeps at several widths/populations — /tmp/prof5 method):
# one lockstep visit costs ~4.3 ps/lane + ~0.08 ms floor; a staging
# boundary (front-pack + packed fat-row state move + sub-loop entry)
# costs ~8 ms fixed + ~14 ps/lane. Overflow past a boundary's slice
# runs to completion at the stage's FULL width, so the divisor
# constraint carries a 2x margin on the measured still-walking
# fraction — a spec one notch too tight measured 4-20x slower
# ((24,8) on a depth-3 262k bucket: 1188 vs 281 ns/lane).
# Recalibrated from the round-5 staged-spec menu (tools_exp/exp_specs,
# headline, 1M lanes): unstaged 149.4 ms / 36 visits -> 4.15 ps/lane;
# (24,16) = 108.2 ms -> a 65k-slice boundary costs ~4.4 ms; (16,2)+(8,8)
# = 151.7 ms -> a 524k-slice boundary ~55 ms. The boundary is dominated
# by the SLICE width (the O(batch) front-pack fuses into the slice
# gather), so per-slice ~75 ps and per-batch-lane ~2 ps — the r4
# constants (25 ps/batch-lane) had it backwards, which would have made
# the new three-boundary pyramids look 10x cheaper than they measure.
VISIT_MS_PER_LANE = float(os.environ.get('CHROMA_VISIT_MS_PER_LANE',
                                         '4.15e-6'))
VISIT_MS_FLOOR = float(os.environ.get('CHROMA_VISIT_MS_FLOOR', '0.05'))
BOUND_MS_FIXED = float(os.environ.get('CHROMA_BOUND_MS_FIXED', '3.0'))
BOUND_MS_PER_LANE = float(os.environ.get('CHROMA_BOUND_MS_PER_LANE',
                                         '2e-6'))
BOUND_MS_PER_SLICE = float(os.environ.get('CHROMA_BOUND_MS_PER_SLICE',
                                          '75e-6'))
# 2.0 before round 5, when overflow past a stage boundary ran to
# completion at FULL width (4-20x cost for a one-notch-too-tight spec);
# the overflow path now front-packs into the slice (mesh_wide
# _staged_inst), so the margin covers population drift only
STAGE_MARGIN = float(os.environ.get('CHROMA_STAGE_MARGIN', '1.35'))


def _visit_ms(w):
    return VISIT_MS_PER_LANE * w + VISIT_MS_FLOOR


def _bound_ms(w, m):
    # front-pack reads the full width; the packed fat-row state move
    # writes the m-lane slice (bigger divisors are cheaper boundaries)
    return (BOUND_MS_FIXED + BOUND_MS_PER_LANE * w
            + BOUND_MS_PER_SLICE * m)


def _best_stage_spec(width, a_frac, visits):
    """Cost-model pick of a traversal staging spec for one compaction
    bucket: `width` lanes of which a fraction `a_frac` enter alive,
    with per-ALIVE-lane visit counts sampled in `visits` (np array).

    Enumerates one- and two-boundary specs ((b, div), ...), keeping
    only those whose still-walking fraction (relative to the bucket
    WIDTH — dead lanes pad the denominator) times STAGE_MARGIN fits
    the 1/div slice at every boundary, and returns the modeled-cheapest
    of those and the unstaged loop. The unroll-2 loop quantizes b to
    even counts; slices must hold >= 1024 lanes and divide 256."""
    v = np.sort(np.asarray(visits))
    if not len(v):
        return ()
    vmax = int(v[-1])

    def walking(b):
        # fraction of the BUCKET still walking at visit b
        return a_frac * float(np.mean(v > b))

    def tail_cost(b, w):
        # bounded loop to the survivors' max visit count at width w
        return max(vmax - b, 0) * _visit_ms(w)

    best = (vmax * _visit_ms(width), ())
    bs = range(8, max(vmax, 9), 4)
    # Multi-boundary pyramids are OFF by default: measured on hardware
    # (tools_exp/exp_specs + the r5d probe regression, headline 1.46M ->
    # 0.50M photons/s), second/third boundaries lose in practice — the
    # pilot's visit distributions mismeasure the deep tail run-to-run,
    # and a second slice one notch too tight floods the overflow mop.
    # The single-cut (24,16)-style spec measured within 2% of the best
    # of a 10-spec menu on 1M bomb rays.
    multi = os.environ.get('CHROMA_STAGE_MULTI', '0') != '0'
    for b1 in bs:
        f1 = walking(b1) * STAGE_MARGIN
        for d1 in (2, 4, 8, 16):
            m1 = width // d1
            if m1 < 1024 or m1 % 256 or f1 > 1.0 / d1:
                continue
            c1 = b1 * _visit_ms(width) + _bound_ms(width, m1)
            one = c1 + tail_cost(b1, m1)
            if one < best[0]:
                best = (one, ((b1, d1),))
            if not multi:
                continue
            for b2 in bs:
                if b2 <= 0:
                    continue
                f2 = walking(b1 + b2) * STAGE_MARGIN
                for d2 in (2, 4):
                    m2 = m1 // d2
                    if m2 < 1024 or m2 % 256 or f2 > 1.0 / (d1 * d2):
                        continue
                    c2 = c1 + b2 * _visit_ms(m1) + _bound_ms(m1, m2)
                    two = c2 + tail_cost(b1 + b2, m2)
                    if two < best[0]:
                        best = (two, ((b1, d1), (b2, d2)))
                    # third boundary: pays on deep-tailed populations
                    # now that overflow past a too-tight slice is a
                    # front-packed mop, not a full-width re-walk
                    for b3 in bs:
                        f3 = walking(b1 + b2 + b3) * STAGE_MARGIN
                        for d3 in (2, 4):
                            m3 = m2 // d3
                            if (m3 < 1024 or m3 % 256
                                    or f3 > 1.0 / (d1 * d2 * d3)):
                                continue
                            three = (c2 + b3 * _visit_ms(m2)
                                     + _bound_ms(m2, m3)
                                     + tail_cost(b1 + b2 + b3, m3))
                            if three < best[0]:
                                best = (three,
                                        ((b1, d1), (b2, d2), (b3, d3)))
    return best[1]


def _dist_at(dists, step):
    "Measured visit distribution at the shallowest depth >= step."
    ds = sorted(dists)
    for d in ds:
        if d >= step:
            return dists[d]
    return dists[ds[-1]]


def _tune_stage_specs(n, sched, max_steps, dists, flat_spec,
                      alive_counts=None):
    """Per-fused-stage traversal staging specs from the measured visit
    distributions (pilot, _tune_stages) + survival curve (probe bomb).

    Each fused-schedule stage runs a bucket of known width with a known
    expected alive fraction and a visit distribution that deepens with
    propagation depth (headline: p99 goes 31 -> 66 between step 0 and
    step 3); _best_stage_spec picks the cheapest staging spec for each
    from the measured cost model. The probe's survival curve supplies
    the alive fractions; the visit distribution for a stage entering at
    step s is the pilot's next-deeper measurement (conservative: deeper
    populations walk longer)."""
    if not dists or 0 not in dists:
        return None
    specs = [_best_stage_spec(n, 1.0, dists[0])]
    width = n
    step = 0
    for ent in sched:
        step += int(ent[0])
        width = _resolve_width(width, ent)
        if alive_counts is not None and 0 < step <= len(alive_counts):
            a_frac = min(float(alive_counts[step - 1]) / width, 1.0)
        else:
            a_frac = 1.0 / 1.3
        specs.append(_best_stage_spec(width, a_frac,
                                      _dist_at(dists, step)))
    return tuple(specs)


def stages_for(geometry):
    """The traversal restart-staging spec propagate() will use for this
    geometry: the env override, the probe-tuned entry (session or
    persisted), or None (pilot not yet run -> per-width env default
    inside the traversal)."""
    from chroma_tpu import perfcache
    spec = os.environ.get('CHROMA_TRAV_STAGES')
    if spec is not None:
        return _parse_schedule(spec)
    pk = perf_key(geometry)
    if pk in _STAGE_CACHE:
        return _STAGE_CACHE[pk]
    if perfcache.persistent(pk):
        ent = perfcache.load(pk).get('flat_stage')
        if ent is not None:
            stages = perfcache.as_tuples(ent)
            _STAGE_CACHE[pk] = stages
            return stages
    return None


def _sched_lookup(geometry, n, max_steps):
    """Tuned (schedule, per-stage traversal specs) for this (geometry,
    batch, max_steps) — session cache first, then the persisted perf
    entry; (None, None) before any probe has run."""
    from chroma_tpu import perfcache
    pk = perf_key(geometry)
    ck = (pk, n, int(max_steps))
    if ck in _SCHED_CACHE:
        return _SCHED_CACHE[ck], _PSTAGE_CACHE.get(ck)
    if perfcache.persistent(pk):
        data = perfcache.load(pk)
        suffix = '%d:%d' % (n, int(max_steps))
        sched = data.get('sched:' + suffix)
        if sched is not None:
            sched = perfcache.as_tuples(sched)
            _SCHED_CACHE[ck] = sched
            pstages = data.get('pstages:' + suffix)
            # [] is the tuned-but-empty terminal sentinel: fall back to
            # the flat spec at use time, but never re-probe for it
            if pstages:
                _PSTAGE_CACHE[ck] = perfcache.as_tuples(pstages)
            return sched, _PSTAGE_CACHE.get(ck)
    return None, None


def schedule_for(geometry, n, max_steps=100):
    """The fused-compaction schedule propagate() will use for this
    (geometry, batch length): the env override, the probe-tuned entry,
    or — before any probe has run — the conservative probe schedule."""
    spec = os.environ.get('CHROMA_FUSED_SCHEDULE')
    if spec is not None:
        return _trim_schedule(_parse_schedule(spec), n)
    cached, _ = _sched_lookup(geometry, n, max_steps)
    if cached is not None:
        return cached
    return _trim_schedule(PROBE_SCHEDULE, n)


def propagate(photons, geometry, key, max_steps=100, use_weights=False,
              scatter_first=0, compact=True, step_chunk=DEFAULT_STEP_CHUNK,
              track_steps=False, extract_m=0):
    """Propagate a PhotonState to termination or `max_steps`.

    Returns the final PhotonState (same length/order as the input).
    With track_steps=True also returns a list of (orig_indices, PhotonState)
    snapshots after every chunk, for photon-track displays
    (reference: gpu/photon.py photon_tracking).

    With compaction on and no tracking, the whole bomb runs as ONE
    device program with a static compaction schedule (_fused_bomb) —
    zero intermediate host syncs. The chunked driver below remains for
    tracking (needs per-chunk snapshots) and compact=False.

    extract_m > 0 (tuned-bomb path only): returns (result, bundle) where
    bundle = (packed detected PhotonState, channels, n_detected, abort)
    device arrays from the SAME program — the Simulation hot path — or
    (result, None) when this bomb was the probe (caller extracts
    separately). The caller owns the abort warning in that mode.
    """
    n = len(photons)
    # traversal pruning needs the true boundary distance to be irrelevant;
    # any scatter_first biasing computes weights from it, so turn it off
    prune = isinstance(scatter_first, int) and scatter_first == 0

    if (USE_FUSED and compact and not track_steps
            and isinstance(scatter_first, int)):
        from chroma_tpu import perfcache
        pk = perf_key(geometry)
        ck = (pk, n, int(max_steps))
        from chroma_tpu.bvh.wide import InstancedBVH
        pilot_ok = (os.environ.get('CHROMA_TRAV_STAGE_PILOT', '1') != '0'
                    and n >= _PILOT_MIN
                    and isinstance(getattr(geometry, 'wide', None),
                                   InstancedBVH))
        stages = stages_for(geometry)
        if stages is None:
            # the visit-distribution pilot tunes CARRIED-STATE staging
            # (default on; CHROMA_TRAV_STAGE_PILOT=0 disables). Measured
            # at headline scale: tuned (48,16) staging 821k photons/s vs
            # 354k unstaged — the lockstep loop otherwise pays the max
            # visit count (205) while p99 is ~50.
            if pilot_ok:
                with profiler.region('propagate.stage_pilot'):
                    stages = _tune_stages(photons, geometry, key,
                                          bool(use_weights),
                                          int(scatter_first), prune)
                _STAGE_CACHE[pk] = stages
                perfcache.update(pk, {'flat_stage': stages})
            else:
                stages = ()
        env = os.environ.get('CHROMA_FUSED_SCHEDULE')
        pstages = None
        if env is not None:
            sched = _trim_schedule(_parse_schedule(env), n)
        else:
            sched, pstages = _sched_lookup(geometry, n, max_steps)
            if (sched is not None and pstages is None and pilot_ok
                    and os.environ.get('CHROMA_TRAV_STAGES') is None
                    and perfcache.persistent(pk)
                    and perfcache.load(pk).get(
                        'pstages:%d:%d' % (n, int(max_steps))) is None):
                # PARTIAL entry: a schedule whose per-stage specs were
                # never tuned (persisted null — an earlier process died
                # between the pilot and the probe) runs degraded at
                # ~3.4x cost at headline scale (measured: 378k vs 1.29M
                # photons/s). Re-probe this bomb and retune both. A
                # tuned-but-empty result persists as [] (terminal), so
                # this fires at most once per entry.
                sched = None
        if sched is not None:
            # per-fused-stage traversal specs when tuned (each bucket's
            # population has a different visit tail); flat spec (env or
            # pilot) otherwise
            tstages = None
            if os.environ.get('CHROMA_TRAV_STAGES') is None:
                tstages = pstages
            if tstages is None:
                tstages = stages
            with profiler.region('propagate.fused[n=%d]' % n):
                out = _fused_bomb(photons, geometry, key, sched,
                                  int(max_steps), bool(use_weights),
                                  int(scatter_first), prune,
                                  trav_stages=tstages,
                                  extract_m=int(extract_m))
            if extract_m:
                # bundle = (packed hits, channels, n_det, abort); the
                # caller fetches everything in one transfer and owns
                # the abort warning
                return out[0], tuple(out[1:])
            result, abort = out
            if bool(abort):
                from chroma_tpu.log import logger
                logger.warning('ABORTED PHOTONS')
            return result
        else:
            # first bomb on this (geometry, batch): run the conservative
            # probe schedule, reporting the alive count at every stage
            # boundary, and tune the schedule for all later bombs from
            # the measured survival curve
            probe = _trim_schedule(PROBE_SCHEDULE, n)
            with profiler.region('propagate.probe[n=%d]' % n):
                result, counts, abort = _fused_bomb(
                    photons, geometry, key, probe, int(max_steps),
                    bool(use_weights), int(scatter_first), prune,
                    report=True, trav_stages=stages)
            # counts is the PER-STEP survival curve (alive after steps
            # 1..len); clamp the tail after an early exit (stays 0)
            counts = np.maximum(np.asarray(counts), 0)
            _PROBE_COUNTS[(pk, n)] = counts  # diagnostics (chroma-profile)
            bsteps = list(range(1, len(counts) + 1))
            _SCHED_CACHE[ck] = _tune_schedule(
                n, bsteps, counts, int(max_steps))
            dists = _dists_lookup(pk)
            if dists is None and pilot_ok:
                # flat_stage was persisted but the distributions were
                # not (pre-fix entry): re-run the pilot purely for its
                # measured distributions so pstages can be tuned
                with profiler.region('propagate.stage_pilot'):
                    _tune_stages(photons, geometry, key,
                                 bool(use_weights), int(scatter_first),
                                 prune)
                dists = _DIST_CACHE.get(pk)
            ps = None
            if dists and _SCHED_CACHE[ck]:
                ps = _tune_stage_specs(
                    n, _SCHED_CACHE[ck], int(max_steps), dists, stages,
                    alive_counts=counts)
            if ps is not None:
                _PSTAGE_CACHE[ck] = ps
            suffix = '%d:%d' % (n, int(max_steps))
            perfcache.update(pk, {
                'sched:' + suffix: _SCHED_CACHE[ck],
                # [] = tuned, nothing to stage (terminal); null would
                # mean never-tuned and re-trigger the healing re-probe
                'pstages:' + suffix: [] if ps is None else ps,
                'counts:' + suffix: [int(c) for c in counts],
            })
            if bool(abort):
                from chroma_tpu.log import logger
                logger.warning('ABORTED PHOTONS')
            if extract_m:
                return result, None     # probe: caller extracts separately
            return result

    # everything below stays device-resident: the only per-chunk host
    # traffic is the 4-byte alive count
    stages = stages_for(geometry) or ()   # no pilot on the tracking path
    orig_idx = jnp.arange(n)
    final_mat = _ps_pack_jit(photons)
    tracking = []

    growth = int(os.environ.get('CHROMA_CHUNK_GROWTH', '2'))
    chunk_cap = int(os.environ.get('CHROMA_CHUNK_CAP', '32'))

    step = 0
    current = photons
    chunk = 1 if step_chunk == 'auto' else step_chunk
    n_alive = None
    while step < max_steps:
        if step_chunk == 'auto':
            # compact as soon as possible while the batch is large (most
            # photons die within the first steps — measured ~60% after
            # step 0, ~87% by step 2 on the demo detector), then grow the
            # chunk fast: every chunk boundary costs a ~74 ms host sync
            # through the remote runtime plus the compact/write-back work,
            # so fewer, longer chunks win once the batch is small
            chunk = min(chunk_cap, max(1, chunk * growth)) \
                if step > 0 else 1
        nsteps = min(chunk, max_steps - step)

        if step == 0:
            with profiler.region('propagate.chunk[n=%d]' % len(current)):
                current, _, alive = run_steps(
                    current, geometry, key, step, nsteps,
                    use_weights=use_weights,
                    scatter_first=scatter_first, prune=prune,
                    trav_stages=stages)
                n_alive = int(alive)
        else:
            # few survivors: finish their remaining steps in one launch
            # (reference heuristic: gpu/photon.py:259-264)
            few = n_alive <= max(len(current) // 16, MIN_BATCH // 4)
            if few:
                nsteps = max_steps - step
            bucket = _next_pow2(n_alive)
            if compact and bucket < len(current):
                # chunk boundary: ONE fused launch does write-back +
                # compaction + the next chunk (3 separate remote
                # dispatches cost ~45 ms host time each)
                with profiler.region('propagate.chunk[n=%d]' % bucket):
                    final_mat, current, orig_idx, _, alive = \
                        _fused_chunk_donated(
                            final_mat, current, orig_idx, geometry, key,
                            step, nsteps, bucket, use_weights,
                            scatter_first, prune, stages)
                    n_alive = int(alive)
            else:
                with profiler.region('propagate.chunk[n=%d]'
                                     % len(current)):
                    current, _, alive = run_steps(
                        current, geometry, key, step, nsteps,
                        use_weights=use_weights,
                        scatter_first=scatter_first, prune=prune,
                        trav_stages=stages)
                    n_alive = int(alive)

        step += nsteps
        profiler.count('propagate.steps', nsteps)
        profiler.count('propagate.lane_steps', nsteps * len(current))
        profiler.count('propagate.alive_after_chunk', n_alive)

        if track_steps:
            tracking.append((np.asarray(orig_idx),
                             jax.tree_util.tree_map(np.asarray, current)))

        if n_alive == 0:
            break

    # the last chunk's survivors-and-dead are still in `current`
    result = _scatter_unpack_donated(final_mat, orig_idx, current)

    if bool(_any_aborted(result)):
        from chroma_tpu.log import logger
        logger.warning('ABORTED PHOTONS')  # reference: gpu/photon.py:288
    if track_steps:
        return result, tracking
    return result


@jax.jit
def _any_aborted(photons):
    return jnp.any((photons.flags & jnp.uint32(event.NAN_ABORT)) != 0)
