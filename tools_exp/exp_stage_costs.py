"""Round-5 experiment: decompose the headline bomb's cost by stage width.

Loads the cached bench geometry, replays the tuned schedule's stage
widths with realistic photon populations (propagate to depth d, compact,
then time bounded step runs at that width), and prints a table of
per-step cost vs (width, depth). The goal: quantify how much of the
786 ms headline bomb is the small-width survival TAIL's per-step floor
versus the large-width head, to pick the round-5 perf lever.

Usage:  python tools_exp/exp_stage_costs.py [quick|headline]
Chained-loop methodology: each timing point runs the SAME jitted program
r times back-to-back with one final sync (block_until_ready is advisory
through the remote tunnel; single calls mismeasure).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    cfg = sys.argv[1] if len(sys.argv) > 1 else 'headline'
    import jax
    from bench import build_arrays, photon_bomb
    from chroma_tpu.ops.propagate import (run_steps, _ps_compact_perm,
                                          _ps_take, stages_for,
                                          _sched_lookup, perf_key)
    from chroma_tpu.ops.sample import make_key
    from chroma_tpu import perfcache

    ga = build_arrays(cfg == 'quick')
    pk = perf_key(ga)
    n = 1 << 20
    sched, pstages = _sched_lookup(ga, n, 100)
    print('# schedule:', sched, file=sys.stderr)
    print('# pstages:', pstages, file=sys.stderr)
    data = perfcache.load(pk)
    counts = data.get('counts:%d:%d' % (n, 100))
    if counts:
        print('# survival curve:', counts, file=sys.stderr)

    key = make_key(42)
    ps = photon_bomb(n, 42)

    # walk the schedule: at each boundary, time `span` steps at the
    # stage's width with the real surviving population
    flat = stages_for(ga) or ()

    def timed_steps(pop, start, nsteps, stages, reps=3):
        """Time run_steps on this population (compile excluded)."""
        out = run_steps(pop, ga, key, start, nsteps, trav_stages=stages)
        np.asarray(out[2])  # warm + sync
        t0 = time.time()
        for _ in range(reps):
            out = run_steps(pop, ga, key, start, nsteps,
                            trav_stages=stages)
        np.asarray(out[2])
        return (time.time() - t0) / reps, out

    cur = ps
    start = 0
    stage_specs = pstages if pstages else None
    total_modeled = 0.0
    rows = []
    sched = sched or ((100, 1),)
    for si, ent in enumerate(sched + ((100 - sum(e[0] for e in sched), 0),)):
        span = int(ent[0])
        if span <= 0:
            break
        w = len(cur)
        spec = (stage_specs[min(si, len(stage_specs) - 1)]
                if stage_specs else flat)
        nst = min(span, 100 - start)
        if nst <= 0:
            break
        dt, out = timed_steps(cur, start, nst, spec)
        alive = int(out[2])
        rows.append((si, w, start, nst, dt, dt / nst, alive))
        print('stage %d: width %7d steps %2d..%2d  %7.1f ms  '
              '%6.1f ms/step  alive-> %d'
              % (si, w, start, start + nst, dt * 1e3, dt / nst * 1e3,
                 alive), flush=True)
        total_modeled += dt
        cur = out[0]
        start += nst
        if alive == 0:
            break
        if si < len(sched):
            # compact into the next stage's width
            from chroma_tpu.ops.propagate import _resolve_width
            m = _resolve_width(w, sched[si]) if si < len(sched) else w
            if m < w:
                _, perm = _ps_compact_perm(cur.alive)
                cur = _ps_take(cur, perm[:m])
    print('# total (sum of stages): %.1f ms' % (total_modeled * 1e3))


if __name__ == '__main__':
    main()
