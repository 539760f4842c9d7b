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

# sitecustomize eagerly imports jax with the machine's JAX_PLATFORMS
# (the tunneled TPU) latched into the live config; env vars alone do NOT
# keep this process off the TPU — force the platform on the config
os.environ['JAX_PLATFORMS'] = 'cpu'
import jax
jax.config.update('jax_platforms', 'cpu')

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

    if os.environ.get('EXP_VARIANTS', '1') == '0':
        return

    # --- builder variants: rebuild the detector host-side and A/B ---
    from chroma_tpu import demo
    from chroma_tpu.loader import create_geometry_from_obj

    if cfg == 'quick':
        det = demo.detector(4000.0, 4500.0, 400.0)
    else:
        det = demo.detector(14000.0, 14500.0, 205.0)
    geo = create_geometry_from_obj(det, auto_build_bvh=False,
                                   update_bvh_cache=False)
    solids = geo.solids
    tri_base = np.cumsum([0] + [len(s.mesh.triangles) for s in solids])
    instances = [(s.mesh, geo.solid_rotations[i],
                  geo.solid_displacements[i], int(tri_base[i]))
                 for i, s in enumerate(solids)]
    print('# %d instances' % len(instances), flush=True)

    def check(tag, table, tol_frac=5e-4):
        t0v = time.time()
        v, tri, dist, dt = replay(table, pos0, dir0)
        # correctness: the same nearest triangle distance (trees may
        # tie-break differently on shared edges; distances must agree)
        m0 = np.isfinite(d0)
        m = np.isfinite(dist)
        mism = (m0 != m).sum()
        dd = np.abs(np.where(m0 & m, dist - d0, 0.0))
        bad = (dd > 1e-3 * np.maximum(np.abs(d0), 1.0)).sum()
        ok = mism <= tol_frac * len(d0) and bad <= tol_frac * len(d0)
        report(tag + (' [OK]' if ok else ' [MISMATCH %d/%d]'
                      % (mism + bad, len(d0))), v)
        v1c, _, _, _ = replay(table, pos1, dir1)
        report(tag + ' volume', v1c)
        from chroma_tpu.bvh import wide as W2
        st = W2.table_stats(np.asarray(table.rows), table.fanout,
                            table.leaf_size, W2.fmt_of(table))
        print('   rows %d width %d depth %d mean_children %.1f proxy %.2f '
              'mean_leaf_tris %.1f  (build+replay %.0fs)'
              % (st['rows'], table.rows.shape[1], table.max_depth,
                 st['mean_children'], st['visit_proxy'],
                 st.get('mean_leaf_tris', 0), time.time() - t0v),
              flush=True)

    variants = os.environ.get('EXP_TREE_VARIANTS',
                              'rebuild,binned,k16,k12').split(',')
    for var in variants:
        t0 = time.time()
        if var == 'rebuild':        # current defaults (sweep SAH now on)
            tb = W.build_instanced_bvh(instances)
        elif var == 'binned':       # pre-round-5 binned-16 SAH
            os.environ['CHROMA_BVH_SWEEP_SAH'] = '0'
            tb = W.build_instanced_bvh(instances)
            del os.environ['CHROMA_BVH_SWEEP_SAH']
        elif var == 'k16':
            tb = W.build_instanced_bvh(instances, leaf_size=16)
        elif var == 'k12':
            tb = W.build_instanced_bvh(instances, leaf_size=12)
        elif var == 'k10':
            # K=10 leaves fit the SAME 112-col row as the fanout-32
            # bf16 bounds block: visit-count cut with ZERO extra bytes
            tb = W.build_instanced_bvh(instances, leaf_size=10)
        elif var == 'f24':
            # fanout 24 bf16: bounds 72 cols, unified W=96 (leaf 88
            # dominates) — kernel sweep -25% ops, rows -14% bytes
            tb = W.build_instanced_bvh(instances, packed_fanout=24)
        elif var == 'f16':
            tb = W.build_instanced_bvh(instances, packed_fanout=16)
        elif var == 'f24k12':
            tb = W.build_instanced_bvh(instances, packed_fanout=24,
                                       leaf_size=12)
        elif var == 'k4':
            tb = W.build_instanced_bvh(instances, leaf_size=4)
        else:
            print('unknown variant', var)
            continue
        print('# built %s in %.0fs' % (var, time.time() - t0), flush=True)
        check(var, tb)


if __name__ == '__main__':
    main()
