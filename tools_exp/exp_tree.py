"""Round-5 experiment: tree-quality A/B via CPU traversal replay.

Builds candidate instanced tables host-side (variations of the SAH
binary build / collapse / leaf shape), replays the REAL wide traversal
(chroma_tpu.ops.mesh_wide.traversal_visits) on the CPU backend over bomb
rays and scattered deep rays, and reports visits/ray per candidate plus
the table_stats proxy. Hit distances are cross-checked against the
baseline table so a "faster" tree that breaks correctness is rejected.

MUST run with JAX_PLATFORMS=cpu (host work; never claims the TPU).

Usage: python tools_exp/exp_tree.py [quick|headline] [cand ...]
"""
import os
import sys
import time

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bomb_rays(n, seed, radius=0.0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    if radius:
        p = rng.normal(size=(n, 3))
        p *= radius * rng.random((n, 1)) ** (1 / 3) \
            / np.linalg.norm(p, axis=1, keepdims=True)
    else:
        p = np.zeros((n, 3))
    return p.astype(np.float32), d.astype(np.float32)


def replay(table, pos, dirs):
    import jax.numpy as jnp
    from chroma_tpu.ops.mesh_wide import traversal_visits
    t0 = time.time()
    v, tri, dist = traversal_visits(jnp.asarray(pos), jnp.asarray(dirs),
                                    table)
    v = np.asarray(v)
    tri = np.asarray(tri)
    dist = np.asarray(dist)
    dt = time.time() - t0
    return v, tri, dist, dt


def report(tag, v):
    q = np.percentile(v, [50, 90, 99])
    print('%-28s visits mean %6.2f  p50 %5.0f  p90 %5.0f  p99 %5.0f  '
          'max %4d' % (tag, v.mean(), q[0], q[1], q[2], v.max()),
          flush=True)


def main():
    cfg = sys.argv[1] if len(sys.argv) > 1 else 'quick'
    from bench import build_arrays
    from chroma_tpu.bvh import wide as W

    ga = build_arrays(cfg == 'quick')
    inst = ga.wide
    print('# table: %d rows, width %d, fanout %d, K %d, depth %d'
          % (inst.rows.shape[0], inst.rows.shape[1], inst.fanout,
             inst.leaf_size, inst.max_depth), flush=True)
    stats = W.table_stats(np.asarray(inst.rows), inst.fanout,
                          inst.leaf_size, W.fmt_of(inst))
    print('# stats:', {k: (round(v, 2) if isinstance(v, float) else v)
                       for k, v in stats.items()}, flush=True)

    nray = 1 << 14
    # detector scale from the table's root box
    pos0, dir0 = bomb_rays(nray, 1)
    v, tri0, d0, dt = replay(inst, pos0, dir0)
    report('baseline bomb', v)
    print('# replay time %.1fs' % dt, flush=True)
    # volume rays (scattered photons mid-flight)
    r = float(os.environ.get('EXP_VOL_RADIUS',
                             '4000' if cfg == 'quick' else '14000'))
    pos1, dir1 = bomb_rays(nray, 2, radius=r)
    v1, tri1, d1, _ = replay(inst, pos1, dir1)
    report('baseline volume', v1)


if __name__ == '__main__':
    main()
