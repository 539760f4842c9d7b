"""Benchmark driver: full-physics photon propagation throughput.

Measures photons/second through the demo PMT detector (isotropic photon
bomb, full surface/bulk physics, propagation to termination) at the
reference's HEADLINE scale — a ~29,000-PMT spherical detector
(reference: README.md:5 — 2.5M photons/s) — plus the BVH ray throughput
(Mrays/s) via the distance_to_mesh analog
(reference: chroma/cuda/mesh.h:131-159).

Prints ONE JSON line to stdout: {"metric", "value", "unit",
"vs_baseline"}; all metrics are also written to BENCH_EXTRA.json.

Scale knobs (env):
  CHROMA_BENCH_QUICK=1 - small 630-PMT config (fast smoke run)
  CHROMA_BENCH_PMT_RADIUS / SPHERE_RADIUS / SPIRAL_STEP - detector size
  CHROMA_BENCH_PHOTONS - photons per bomb (default 1M)
  CHROMA_BENCH_REPS    - timed repetitions (default 3)
"""
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_PHOTONS_PER_SEC = 2.5e6  # reference GPU headline (BASELINE.md)


def _flags(quick):
    if quick:
        return (4000.0, 4500.0, 400.0)
    return (float(os.environ.get('CHROMA_BENCH_PMT_RADIUS', 14000.0)),
            float(os.environ.get('CHROMA_BENCH_SPHERE_RADIUS', 14500.0)),
            float(os.environ.get('CHROMA_BENCH_SPIRAL_STEP', 205.0)))


def build_arrays(quick=False):
    """Device-ready GeometryArrays for the benchmark detector, through a
    two-level cache: (1) the geocache npz of the *device* arrays — loads
    in <1 s at any scale because lean instanced geometry stores nothing
    O(triangles); (2) the legacy host-geometry pickle (minutes to load at
    headline scale, kept to skip the ~10 min re-mesh); (3) full build."""
    from chroma_tpu.io.geocache import (save_geometry_arrays,
                                        load_geometry_arrays)
    from chroma_tpu.ops.types import build_geometry_arrays

    pmt_radius, sphere_radius, spiral_step = _flags(quick)

    cache_dir = os.environ.get('CHROMA_CACHE_DIR',
                               os.path.expanduser('~/.chroma'))
    os.makedirs(cache_dir, exist_ok=True)
    base = 'bench-%g-%g-%g' % (pmt_radius, sphere_radius, spiral_step)
    apath = os.path.join(cache_dir, base + '-arrays')

    t0 = time.time()
    # lean: skip the O(triangles) soup arrays — unused by the hot paths
    # and ~2 min of device upload through the tunnel at quick scale
    ga = load_geometry_arrays(apath, lean=True)
    if ga is not None:
        print('# loaded cached geometry arrays in %.1fs'
              % (time.time() - t0), file=sys.stderr)
        return ga

    pkl = os.path.join(cache_dir, base + '.pkl')
    if os.path.exists(pkl):
        t0 = time.time()
        with open(pkl, 'rb') as f:
            geo = pickle.load(f)
        print('# loaded legacy geometry pickle in %.0fs'
              % (time.time() - t0), file=sys.stderr)
    else:
        from chroma_tpu import demo
        from chroma_tpu.loader import create_geometry_from_obj
        det = demo.detector(pmt_radius, sphere_radius, spiral_step)
        # the device path only needs the wide BVH; skip the classic builder
        geo = create_geometry_from_obj(det, auto_build_bvh=False)

    t0 = time.time()
    ga = build_geometry_arrays(geo)
    print('# built geometry arrays in %.0fs' % (time.time() - t0),
          file=sys.stderr)
    try:
        save_geometry_arrays(apath, ga)
    except Exception as e:      # cache is best-effort
        print('# geometry cache write failed: %s' % e, file=sys.stderr)
    return ga


def photon_bomb(n, seed):
    """Isotropic photon bomb generated ON DEVICE (one jit, no host
    arrays): uploading a 1M-photon host batch costs ~0.8 s through the
    remote tunnel and would drain inside the timed propagation
    otherwise."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from chroma_tpu.ops.photon import PhotonState
    from chroma_tpu.ops.sample import uniform_sphere, uniform

    @jax.jit
    def make(key):
        k1, k2, k3 = jax.random.split(key, 3)
        d = uniform_sphere(k1, (n,))
        pol = jnp.cross(uniform_sphere(k2, (n,)), d)
        pol = pol / jnp.linalg.norm(pol, axis=1, keepdims=True)
        return PhotonState(
            pos=jnp.zeros((n, 3), jnp.float32),
            dir=d, pol=pol,
            wavelength=uniform(k3, (n,), 300.0, 700.0),
            t=jnp.zeros(n, jnp.float32),
            weight=jnp.ones(n, jnp.float32),
            flags=jnp.zeros(n, jnp.uint32),
            last_hit_triangle=jnp.full(n, -1, jnp.int32),
            evidx=jnp.zeros(n, jnp.uint32),
            cur_mat=jnp.full(n, -1, jnp.int32),
        )

    ps = make(jax.random.key(seed))
    # force a real sync (block_until_ready is advisory on the tunnel)
    import numpy as np
    np.asarray(ps.pos[:1])
    return ps


# HBM bytes one traversal visit moves per lane, for the roofline metric:
# the gathered W-column f32 row is touched three times (random table
# read, gather buffer write, kernel read) plus the carried state
# (~38 (N,)-row streams in+out: registers, stacks, hit context) and the
# read-only ray constants. See docs/design.md "visit cost anatomy".
VISIT_STATE_BYTES = 340.0
HBM_PEAK_GBPS = 819.0      # v5e


def measure_rays(ga, nrays, reps):
    """BVH ray throughput: nearest-triangle queries on isotropic rays
    (the reference's distance_to_mesh, cuda/mesh.h:131-159).
    Returns (rays/s, mean visits/ray, modeled HBM GB/s moved)."""
    import jax
    import numpy as np
    from chroma_tpu.ops.mesh_wide import (intersect_mesh_wide,
                                          traversal_visits)
    from chroma_tpu.ops.propagate import stages_for

    # the tuned staging spec the propagation hot path runs with (the
    # lockstep loop otherwise pays the batch's MAX visit count)
    stages = stages_for(ga) or ()
    f = jax.jit(lambda p, d, l: intersect_mesh_wide(p, d, ga.wide, l,
                                                    stages=stages)[1])
    best = float('inf')
    for rep in range(reps + 1):
        ps = photon_bomb(nrays, 1000 + rep)
        t0 = time.time()
        out = f(ps.pos, ps.dir, ps.last_hit_triangle)
        np.asarray(out[:1])
        dt = time.time() - t0
        if rep > 0:             # first call includes compile
            best = min(best, dt)

    # roofline: mean visits/ray (64k sample) x bytes/visit x rays/s
    ps = photon_bomb(min(nrays, 1 << 16), 999)
    v = traversal_visits(ps.pos, ps.dir, ga.wide,
                         ps.last_hit_triangle)[0]
    mean_visits = float(np.asarray(v).mean())
    w = int(ga.wide.rows.shape[1])
    bytes_per_visit = 3 * w * 4 + VISIT_STATE_BYTES
    hbm_gbps = (nrays / best) * mean_visits * bytes_per_visit / 1e9
    return nrays / best, mean_visits, hbm_gbps


def run_config(quick, nphotons, reps):
    "Measure one detector config; returns a metrics dict."
    import jax
    import jax.numpy as jnp
    import numpy as np
    from chroma_tpu.ops.propagate import propagate
    from chroma_tpu.ops.sample import make_key
    from chroma_tpu import event

    ga = build_arrays(quick)
    nch = ga.detector.nchannels
    ntri = (int(ga.inst.tri_base[-1]) if ga.inst is not None
            else len(ga.triangles))
    print('# detector: %d PMTs, %d triangles' % (nch, ntri),
          file=sys.stderr)

    @jax.jit
    def detected_count(flags):
        return jnp.sum((flags & jnp.uint32(event.SURFACE_DETECT)) > 0)

    # warm twice: the first bomb is the schedule PROBE, the second
    # compiles the probe-tuned program the timed reps run
    for w in (100, 101):
        res = propagate(photon_bomb(nphotons, w), ga, make_key(w),
                        max_steps=100, step_chunk='auto')
        _ = int(detected_count(res.flags))

    best = float('inf')
    detected = 0
    for rep in range(1, reps + 1):
        ps = photon_bomb(nphotons, rep)
        t0 = time.time()
        res = propagate(ps, ga, make_key(rep), max_steps=100,
                        step_chunk='auto')
        # sync on a 4-byte device-side reduction: the result stays on
        # device, as it does for downstream DAQ/PDF consumers — a full
        # flags readback costs ~0.25 s through the remote tunnel and
        # is not part of propagation
        detected = int(detected_count(res.flags))
        dt = time.time() - t0
        print('# rep %d: %.2fs -> %.0f photons/s (detected %d)' %
              (rep, dt, nphotons / dt, detected), file=sys.stderr)
        best = min(best, dt)

    value = nphotons / best
    metrics = {
        'photon_propagation_throughput': round(value, 1),
        'photons_per_sec_vs_baseline': round(
            value / BASELINE_PHOTONS_PER_SEC, 4),
        'detector_pmts': nch,
        'detector_triangles': ntri,
        'nphotons': nphotons,
    }
    # the secondary metrics must never cost the headline number: a
    # device/tunnel failure here still reports the propagate throughput
    try:
        rays_per_sec, mean_visits, hbm_gbps = measure_rays(
            ga, nphotons, max(reps - 1, 1))
        print('# BVH ray throughput: %.2f Mrays/s (%.1f visits/ray, '
              '~%.0f GB/s moved = %.0f%% of HBM peak)'
              % (rays_per_sec / 1e6, mean_visits, hbm_gbps,
                 100.0 * hbm_gbps / HBM_PEAK_GBPS), file=sys.stderr)
        metrics['bvh_ray_throughput_mrays'] = round(rays_per_sec / 1e6, 3)
        metrics['traversal_mean_visits'] = round(mean_visits, 2)
        metrics['hbm_gbps_moved'] = round(hbm_gbps, 1)
        metrics['hbm_utilization'] = round(hbm_gbps / HBM_PEAK_GBPS, 4)
        sim_value = measure_simulation(ga, nphotons, max(reps - 1, 1))
        print('# Simulation-level: %.0f photons/s (%.0f%% of raw '
              'propagate)' % (sim_value, 100.0 * sim_value / value),
              file=sys.stderr)
        metrics['simulation_photons_per_sec'] = round(sim_value, 1)
    except Exception as e:
        print('# secondary metrics failed: %s' % e, file=sys.stderr)
    return metrics


def measure_simulation(ga, nphotons, reps):
    """End-to-end Simulation throughput: device-resident sources in,
    flat hits out. Hit extraction (channel map + front-pack of the
    detected minority) runs inside the fused device program; the hits
    stay device-resident in a LazyHits (chroma_tpu.ops.daq) — only the
    4-byte detected count and abort flag cross to the host, because
    that is where the framework's own downstream consumers (DAQ, PDF
    accumulation) want the data. Materializing every photon field on
    the host is one extra batched transfer, paid only by callers that
    touch the numpy fields (measured separately below as the
    sim_hits_materialized rate). The gap to raw `propagate` is the
    event-assembly overhead."""
    from chroma_tpu.sim import Simulation

    sim = Simulation(None, seed=7, gpu_geometry=ga)
    best = float('inf')
    best_mat = float('inf')
    for rep in range(reps + 1):
        ps = photon_bomb(nphotons, 500 + rep)
        t0 = time.time()
        evs = list(sim.simulate(ps, max_steps=100, keep_hits=False))
        dt = time.time() - t0
        nhits = len(evs[0].flat_hits)
        # the host-materialized rate: + one batched transfer of every
        # photon field of the detected minority (tunnel-speed here;
        # PCIe-speed on a local host)
        _ = evs[0].flat_hits.t
        dt_mat = time.time() - t0
        if rep > 0:
            best = min(best, dt)
            best_mat = min(best_mat, dt_mat)
    print('# sim flat hits: %d (materialized rate %.0f photons/s)'
          % (nhits, nphotons / best_mat), file=sys.stderr)
    return nphotons / best


def _emit(metrics):
    print(json.dumps({
        'metric': 'photon_propagation_throughput',
        'value': metrics['photon_propagation_throughput'],
        'unit': 'photons/s/chip',
        'vs_baseline': metrics['photons_per_sec_vs_baseline'],
    }), flush=True)


def regression_warnings(history, current):
    """Regression gate over the bench history (pure function, tested in
    tests/test_perf_tuning.py): `history` is a list of prior record
    dicts (as appended to BENCH_HISTORY.jsonl), `current` the new one.
    Returns warning strings when the quick config drops below 1.0x
    baseline or either config regresses >5% vs the best recorded."""
    warns = []
    q = current.get('quick', {}).get('photons_per_sec_vs_baseline')
    if q is not None and q < 1.0:
        warns.append('quick config below 1.0x baseline: %.3fx' % q)
    for cfg in ('quick', 'headline'):
        cur = current.get(cfg, {}).get('photon_propagation_throughput')
        if cur is None:
            continue
        prior = [r.get(cfg, {}).get('photon_propagation_throughput')
                 for r in history]
        prior = [p for p in prior if p]
        if prior and cur < 0.95 * max(prior):
            warns.append('%s regressed >5%% vs best recorded: '
                         '%.0f vs %.0f photons/s'
                         % (cfg, cur, max(prior)))
    return warns


def _append_history(extra):
    """Append this run's metrics to BENCH_HISTORY.jsonl and print
    regression warnings against the recorded history (VERDICT r4 item:
    BENCH_EXTRA is overwritten per round; the history accumulates)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        'BENCH_HISTORY.jsonl')
    try:
        history = []
        if os.path.exists(path):
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        try:
                            history.append(json.loads(line))
                        except Exception:
                            pass
        record = dict(extra)
        record['t'] = time.time()
        for w in regression_warnings(history, record):
            print('# BENCH REGRESSION: %s' % w, file=sys.stderr)
        with open(path, 'a') as f:
            f.write(json.dumps(record) + '\n')
    except Exception as e:
        print('# bench history write failed: %s' % e, file=sys.stderr)


def _write_extra(extra):
    """Merge-write BENCH_EXTRA.json: a quick-only or partially-failed run
    must never erase a previously completed config's entry."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        'BENCH_EXTRA.json')
    try:
        merged = {}
        if os.path.exists(path):
            try:
                with open(path) as f:
                    merged = json.load(f)
            except Exception:
                merged = {}
        merged.update(extra)
        with open(path, 'w') as f:
            json.dump(merged, f, indent=1)
    except Exception:
        pass


def main():
    from chroma_tpu.tpu_util import wait_for_tpu, enable_persistent_cache
    enable_persistent_cache()
    wait_for_tpu()

    quick_only = bool(int(os.environ.get('CHROMA_BENCH_QUICK', '0')))
    nphotons = int(os.environ.get('CHROMA_BENCH_PHOTONS', 1 << 20))
    reps = int(os.environ.get('CHROMA_BENCH_REPS', 3))

    # quick config first so a partial run still reports a throughput
    # line; the headline (~29k-PMT / ~170M-triangle) config follows and,
    # when it completes, replaces it as the final (driver-parsed) line
    extra = {'quick': run_config(True, nphotons, reps)}
    _write_extra(extra)
    _emit(extra['quick'])
    if not quick_only:
        try:
            extra['headline'] = run_config(False, nphotons, reps)
        except Exception as e:
            # a headline failure must not erase the quick result
            print('# headline config failed: %s' % e, file=sys.stderr)
            _append_history(extra)
            return
        _write_extra(extra)
        _emit(extra['headline'])
    _append_history(extra)


if __name__ == '__main__':
    main()
