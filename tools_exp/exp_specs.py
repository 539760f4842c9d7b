"""Round-5 experiment: MEASURE traversal staging specs at full width.

The cost-model spec picker chooses stage-0 specs like (24, 16) from
constants measured in round 4 (visit ~4.4 ps/lane, boundary ~10 ms +
25 ps/lane). This times the real intersect_mesh_instanced under a menu
of specs on 1M bomb rays AND 1M deep-survivor rays, reporting ms per
call — both to pick the best stage-0 spec directly and to recalibrate
the constants (the boundary's fat-row state move got cheaper as the
state slimmed; a stale boundary constant blocks tighter pyramids).

Usage: python tools_exp/exp_specs.py [quick|headline]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    cfg = sys.argv[1] if len(sys.argv) > 1 else 'headline'
    import jax
    import jax.numpy as jnp
    from bench import build_arrays, photon_bomb
    from chroma_tpu.ops.mesh_wide import intersect_mesh_instanced
    from chroma_tpu.ops.propagate import (run_steps, _ps_compact_perm,
                                          _ps_take)
    from chroma_tpu.ops.sample import make_key

    ga = build_arrays(cfg == 'quick')
    n = 1 << 20
    ps = photon_bomb(n, 21)

    # deep-survivor population at full width: propagate 3 steps, then
    # tile the survivors cyclically to n lanes (all alive, realistic
    # mixed directions/positions)
    out = run_steps(ps, ga, make_key(21), 0, 3, trav_stages=())
    cur = out[0]
    alive = int(out[2])
    _, perm = _ps_compact_perm(cur.alive)
    idx = jnp.arange(n) % max(alive, 1)
    deep = _ps_take(cur, perm[idx])
    print('# deep population tiled from %d survivors' % alive, flush=True)

    pops = {
        'bomb': (ps.pos, ps.dir, ps.last_hit_triangle),
        'deep': (deep.pos, deep.dir, deep.last_hit_triangle),
    }

    specs = [
        (),
        ((24, 16),),
        ((28, 16),),
        ((16, 16),),
        ((16, 2), (8, 8)),
        ((16, 2), (8, 4), (8, 2)),
        ((12, 2), (8, 2), (8, 2)),
        ((16, 4), (12, 4)),
        ((20, 8), (12, 2)),
        ((12, 4), (12, 4)),
    ]

    for name, (p, d, l) in pops.items():
        for spec in specs:
            f = jax.jit(lambda p, d, l, s=spec: intersect_mesh_instanced(
                p, d, ga.wide, l, stages=s)[1])
            try:
                r = f(p, d, l)
                np.asarray(r[:1])
                t0 = time.time()
                for _ in range(3):
                    r = f(p, d, l)
                np.asarray(r[:1])
                dt = (time.time() - t0) / 3
            except Exception as e:
                print('%s %-28s FAILED %s' % (name, spec, e), flush=True)
                continue
            print('%s %-28s %7.1f ms' % (name, str(spec), dt * 1e3),
                  flush=True)


if __name__ == '__main__':
    main()
