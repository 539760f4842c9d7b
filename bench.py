"""Benchmark driver: full-physics photon propagation throughput.

Measures photons/second through the demo PMT detector (isotropic photon
bomb, full surface/bulk physics, propagation to termination), the
configuration behind the reference's headline number
(reference: README.md:5 — 2.5M photons/s on a 29k-PMT detector).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Scale knobs (env):
  CHROMA_BENCH_PMT_RADIUS / SPHERE_RADIUS / SPIRAL_STEP - detector size
  CHROMA_BENCH_PHOTONS - photons per bomb (default 1M)
  CHROMA_BENCH_REPS    - timed repetitions (default 3)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_PHOTONS_PER_SEC = 2.5e6  # reference GPU headline (BASELINE.md)


def build_detector():
    from chroma_tpu import demo
    from chroma_tpu.loader import create_geometry_from_obj

    pmt_radius = float(os.environ.get('CHROMA_BENCH_PMT_RADIUS', 4000.0))
    sphere_radius = float(os.environ.get('CHROMA_BENCH_SPHERE_RADIUS',
                                         4500.0))
    spiral_step = float(os.environ.get('CHROMA_BENCH_SPIRAL_STEP', 400.0))

    det = demo.detector(pmt_radius, sphere_radius, spiral_step)
    # the device path only needs the wide BVH; skip the classic builder
    # (expensive at tens of millions of triangles)
    geo = create_geometry_from_obj(det, auto_build_bvh=False)
    return geo


def photon_bomb(n, seed):
    import numpy as np
    from chroma_tpu import event
    from chroma_tpu.ops.propagate import photon_state_from_host

    rs = np.random.RandomState(seed)

    def sphere(m):
        theta = rs.uniform(0, 2 * np.pi, m)
        u = rs.uniform(-1, 1, m)
        c = np.sqrt(1 - u * u)
        return np.stack([c * np.cos(theta), c * np.sin(theta), u], axis=1)

    pol = np.cross(sphere(n), sphere(n))
    pol /= np.linalg.norm(pol, axis=1, keepdims=True)
    ph = event.Photons(pos=np.zeros((n, 3)), dir=sphere(n), pol=pol,
                       wavelengths=rs.uniform(300, 700, n),
                       t=np.zeros(n))
    return photon_state_from_host(ph)


def main():
    from chroma_tpu.tpu_util import wait_for_tpu
    wait_for_tpu()
    import numpy as np
    import jax
    from chroma_tpu.ops.types import build_geometry_arrays
    from chroma_tpu.ops.propagate import propagate
    from chroma_tpu import event

    nphotons = int(os.environ.get('CHROMA_BENCH_PHOTONS', 1 << 20))
    reps = int(os.environ.get('CHROMA_BENCH_REPS', 3))

    geo = build_detector()
    ga = build_geometry_arrays(geo)
    nch = geo.num_channels()
    print('# detector: %d PMTs, %d triangles' %
          (nch, len(geo.mesh.triangles)), file=sys.stderr)

    # warm twice (covers the compaction bucket sizes and chunk lengths)
    for w in (100, 101):
        res = propagate(photon_bomb(nphotons, w), ga, jax.random.key(w),
                        max_steps=100, step_chunk='auto')
        _ = np.asarray(res.flags)[:1]

    best = float('inf')
    for rep in range(1, reps + 1):
        ps = photon_bomb(nphotons, rep)
        t0 = time.time()
        res = propagate(ps, ga, jax.random.key(rep), max_steps=100,
                        step_chunk='auto')
        flags = np.asarray(res.flags)
        dt = time.time() - t0
        detected = int(((flags & np.uint32(event.SURFACE_DETECT)) > 0).sum())
        print('# rep %d: %.2fs -> %.0f photons/s (detected %d)' %
              (rep, dt, nphotons / dt, detected), file=sys.stderr)
        best = min(best, dt)

    value = nphotons / best
    print(json.dumps({
        'metric': 'photon_propagation_throughput',
        'value': round(value, 1),
        'unit': 'photons/s/chip',
        'vs_baseline': round(value / BASELINE_PHOTONS_PER_SEC, 4),
    }))


if __name__ == '__main__':
    main()
