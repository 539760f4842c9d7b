"""Round-5 experiment: small-width (survival tail) step-cost anatomy.

The fused bomb's tail runs tens of steps at widths <= 16k lanes where
per-step cost is floor-dominated. This measures, at several widths and a
deep-survivor population:

  * per-step cost with the default traversal (unroll 2, Pallas kernel)
  * deeper unrolls (4, 8) — fewer while_loop iterations per traversal
  * the jnp visit body (CHROMA_PALLAS_VISIT=0) — is the kernel's fixed
    launch cost the floor at small widths?

Usage: python tools_exp/exp_tail.py [quick|headline]
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
                                          _ps_take)
    from chroma_tpu.ops.sample import make_key
    from chroma_tpu.ops import mesh_wide, visit_kernel

    ga = build_arrays(cfg == 'quick')
    key = make_key(7)
    n = 1 << 20
    ps = photon_bomb(n, 7)

    # advance to depth 8 to get a realistic deep-survivor population
    out = run_steps(ps, ga, key, 0, 8, trav_stages=())
    cur, alive = out[0], int(out[2])
    print('# survivors at depth 8: %d' % alive, flush=True)
    _, perm = _ps_compact_perm(cur.alive)
    cur = _ps_take(cur, perm)

    def timed(pop, nsteps, reps=3, stages=()):
        out = run_steps(pop, ga, key, 8, nsteps, trav_stages=stages)
        np.asarray(out[2])
        t0 = time.time()
        for r in range(reps):
            out = run_steps(pop, ga, key, 8, nsteps, trav_stages=stages)
        np.asarray(out[2])
        return (time.time() - t0) / reps / nsteps

    widths = [2048, 8192, 65536, 262144]
    nst = 10
    results = {}
    # variant OUTER loop: the unroll/pallas knobs are not part of the jit
    # key, so the cache must be cleared per variant (fresh trace)
    for name, unroll, pallas in (('u2+pl', 2, 'auto'),
                                 ('u4+pl', 4, 'auto'),
                                 ('u8+pl', 8, 'auto'),
                                 ('u2+jnp', 2, '0')):
        run_steps.clear_cache()
        mesh_wide.TRAV_UNROLL = str(unroll)
        visit_kernel.PALLAS_VISIT = pallas
        for w in widths:
            if w > n:
                continue
            pop = jax.tree_util.tree_map(lambda a: a[:w], cur)
            try:
                c = timed(pop, nst)
            except Exception as e:
                print('  %s w=%d failed: %s' % (name, w, e), flush=True)
                continue
            results.setdefault(w, []).append((name, c))
            print('  %s width %7d: %6.2f ms/step' % (name, w, c * 1e3),
                  flush=True)
    mesh_wide.TRAV_UNROLL = 'auto'
    visit_kernel.PALLAS_VISIT = 'auto'
    for w in widths:
        print('width %7d: ' % w + '  '.join(
            '%s %6.2f ms/step' % (nm, c * 1e3)
            for nm, c in results.get(w, [])), flush=True)


if __name__ == '__main__':
    main()
