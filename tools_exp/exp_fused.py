"""Round-5 regression bisect: time the FUSED bomb under pstage variants.

The r5d/r5e probes tuned per-stage traversal specs that added ((40,8))
staging at 65k/41k/25k widths; the per-stage run_steps decomposition
shows +127 ms there, but the fused bomb regressed +1.5 s. This times
_fused_bomb directly under both pstage tuples to isolate whether the
interaction lives inside the fused program.

Usage: python tools_exp/exp_fused.py [quick|headline]
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
    from chroma_tpu.ops.propagate import _fused_bomb, _sched_lookup
    from chroma_tpu.ops.sample import make_key

    ga = build_arrays(cfg == 'quick')
    n = 1 << 20
    sched, pstages = _sched_lookup(ga, n, 100)
    print('# sched:', sched, flush=True)
    print('# tuned pstages:', pstages, flush=True)

    good = tuple(s if s and s[0][1] >= 16 or not s else ()
                 for s in (pstages or ()))
    # variant A: the tuned entry as-is; variant B: small-width staging
    # entries replaced by () (the r5c shape); variant C: flat (40,16)
    variants = {
        'tuned': pstages,
        'no-smallwidth-staging': tuple(
            (s if i < 7 else ()) for i, s in enumerate(pstages or ())),
        'flat4016': ((40, 16),),
    }
    ps = photon_bomb(n, 77)
    key = make_key(77)
    for name, tstages in variants.items():
        try:
            out = _fused_bomb(ps, ga, key, sched, 100, False, 0, True,
                              trav_stages=tstages)
            np.asarray(out[-1])
            t0 = time.time()
            for _ in range(2):
                out = _fused_bomb(ps, ga, key, sched, 100, False, 0,
                                  True, trav_stages=tstages)
            np.asarray(out[-1])
            dt = (time.time() - t0) / 2
        except Exception as e:
            print('%s FAILED: %s' % (name, e), flush=True)
            continue
        print('%-24s %7.1f ms/bomb' % (name, dt * 1e3), flush=True)


if __name__ == '__main__':
    main()
