"""Layer optimization + tree rebuild (reference: bin/chroma-bvh node_swap,
whose rebuild_tree drifted out of the reference; ours is real)."""
import numpy as np

from chroma_tpu import make
from chroma_tpu.bvh import make_recursive_grid_bvh, unpack_nodes
from chroma_tpu.bvh.build import (area_sort_nodes, optimize_layer,
                                  rebuild_above)


def _reachable_invariants(bvh, ntriangles):
    u = unpack_nodes(bvh.nodes)
    reachable = []
    frontier = [0]
    while frontier:
        reachable.extend(frontier)
        nxt = []
        for i in frontier:
            if u['nchild'][i] > 0:
                c = int(u['child'][i])
                nxt.extend(range(c, c + int(u['nchild'][i])))
        frontier = nxt
    reachable = np.asarray(sorted(set(reachable)))
    leaves = u['nchild'][reachable] == 0
    areas = (u['xhi'] - u['xlo'])[reachable]
    real_leaf = leaves & ((u['xhi'] - u['xlo'])[reachable] > 0)
    tri_ids = np.sort(u['child'][reachable][real_leaf])
    assert (tri_ids == np.arange(ntriangles)).all()
    internal = reachable[~leaves]
    for i in internal:
        c = int(u['child'][i])
        n = int(u['nchild'][i])
        for axis in 'xyz':
            assert (u[axis + 'lo'][c:c + n] >= u[axis + 'lo'][i]).all()
            assert (u[axis + 'hi'][c:c + n] <= u[axis + 'hi'][i]).all()


def test_optimize_and_rebuild_preserves_tree():
    mesh = make.sphere(17.0, nsteps=16)
    bvh = make_recursive_grid_bvh(mesh, target_degree=2)
    ntri = len(mesh.triangles)
    _reachable_invariants(bvh, ntri)

    li = bvh.layer_count() - 2          # a mid/lower internal layer
    lo, hi = bvh.layer_bounds[li], bvh.layer_bounds[li + 1]
    bvh.nodes[lo:hi] = optimize_layer(bvh.nodes[lo:hi], max_sweeps=2)
    rebuilt = rebuild_above(bvh, li)
    _reachable_invariants(rebuilt, ntri)


def test_area_sort_preserves_tree():
    mesh = make.box(10.0, 4.0, 7.0)
    bvh = make_recursive_grid_bvh(mesh, target_degree=3)
    bvh.nodes = area_sort_nodes(bvh.nodes, bvh.layer_bounds)
    _reachable_invariants(bvh, len(mesh.triangles))


def test_cli_round_trip(tmp_path):
    "chroma-bvh create/sort/optimize/stat against a temp cache."
    import os
    import subprocess
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, CHROMA_CACHE_DIR=str(tmp_path),
               JAX_PLATFORMS='cpu', PYTHONPATH=repo)
    geo_obj = '@chroma_tpu.models.icosahedron'

    def run(*args):
        out = subprocess.run(
            [sys.executable, os.path.join(repo, 'bin', 'chroma-bvh')]
            + list(args), env=env, capture_output=True, text=True,
            timeout=240)
        assert out.returncode == 0, out.stderr
        return out.stdout

    run('create', geo_obj, '--degree', '2')
    run('sort', geo_obj)
    out = run('optimize', geo_obj, '2')
    assert 'parent area' in out
    out = run('stat', geo_obj)
    assert 'nodes:' in out
