"""BVH format and builder tests (reference test strategy:
test/test_bvh.py, test/test_bvh_simple.py)."""
import numpy as np
import pytest

from chroma_tpu import make
from chroma_tpu.bvh import (WorldCoords, OutOfRangeError, unpack_nodes,
                            pack_nodes, node_areas, make_recursive_grid_bvh,
                            make_simple_bvh, flatten_to_dfs, validate_dfs,
                            CHILD_BITS)
from chroma_tpu.bvh.build import create_leaf_nodes


def test_world_coords_round_trip():
    wc = WorldCoords(world_origin=(-1.0, -2.0, -3.0), world_scale=0.1)
    pts = np.array([[-1.0, -2.0, -3.0], [0.0, 0.0, 0.0], [5.0, 4.0, 3.0]])
    fixed = wc.world_to_fixed(pts)
    assert fixed.dtype == np.uint16
    np.testing.assert_allclose(wc.fixed_to_world(fixed), pts, atol=0.051)


def test_world_coords_out_of_range():
    wc = WorldCoords(world_origin=(0, 0, 0), world_scale=1.0)
    with pytest.raises(OutOfRangeError):
        wc.world_to_fixed((-1, 0, 0))
    with pytest.raises(OutOfRangeError):
        wc.world_to_fixed((0, 70000, 0))


def test_node_pack_unpack_round_trip():
    lower = np.array([[1, 2, 3], [10, 20, 30]], dtype=np.uint32)
    upper = np.array([[4, 5, 6], [40, 50, 60]], dtype=np.uint32)
    child = np.array([7, 1234], dtype=np.uint32)
    nchild = np.array([0, 5], dtype=np.uint32)
    nodes = pack_nodes(lower, upper, child, nchild)
    u = unpack_nodes(nodes)
    assert (u['xlo'] == lower[:, 0]).all() and (u['xhi'] == upper[:, 0]).all()
    assert (u['ylo'] == lower[:, 1]).all() and (u['zhi'] == upper[:, 2]).all()
    assert (u['child'] == child).all()
    assert (u['nchild'] == nchild).all()


def test_node_areas():
    nodes = pack_nodes(np.array([[0, 0, 0]]), np.array([[1, 2, 3]]),
                       np.array([0]), np.array([0]))
    # 2*(1*2 + 2*3 + 3*1) = 22
    np.testing.assert_allclose(node_areas(nodes), [22.0])


def test_leaf_nodes_cover_triangles():
    mesh = make.sphere(100.0, nsteps=16)
    wc, nodes, morton = create_leaf_nodes(mesh)
    assert len(nodes) == len(mesh.triangles)
    u = unpack_nodes(nodes)
    assert (u['nchild'] == 0).all()
    assert sorted(u['child']) == list(range(len(mesh.triangles)))

    # each quantized leaf box must contain its triangle's vertices
    tri = mesh.vertices[mesh.triangles]
    lo_w = wc.fixed_to_world(
        np.column_stack([u['xlo'], u['ylo'], u['zlo']]).astype(float))
    hi_w = wc.fixed_to_world(
        np.column_stack([u['xhi'], u['yhi'], u['zhi']]).astype(float))
    eps = wc.world_scale * 1e-3
    assert (tri.min(axis=1) >= lo_w - eps).all()
    assert (tri.max(axis=1) <= hi_w + eps).all()


def _check_tree_invariants(bvh, ntriangles):
    nodes = bvh.nodes
    u = unpack_nodes(nodes)
    root = u[0]

    # walk reachable nodes from the root (chain collapsing leaves dead
    # duplicates in the array, so reachability matters)
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
    reachable = np.asarray(sorted(reachable))
    assert len(np.unique(reachable)) == len(reachable)

    leaves = u['nchild'][reachable] == 0
    # every triangle appears in exactly one reachable leaf
    tri_ids = np.sort(u['child'][reachable][leaves])
    assert (tri_ids == np.arange(ntriangles)).all()

    # parents contain their children
    internal = reachable[~leaves]
    for i in internal:
        c = int(u['child'][i])
        n = int(u['nchild'][i])
        for axis in 'xyz':
            assert (u[axis + 'lo'][c:c + n] >= u[axis + 'lo'][i]).all()
            assert (u[axis + 'hi'][c:c + n] <= u[axis + 'hi'][i]).all()

    # root covers everything
    leaf_ids = reachable[leaves]
    for axis in 'xyz':
        assert root[axis + 'lo'] <= u[axis + 'lo'][leaf_ids].min()
        assert root[axis + 'hi'] >= u[axis + 'hi'][leaf_ids].max()


def test_recursive_grid_bvh_invariants():
    mesh = make.sphere(50.0, nsteps=20)
    bvh = make_recursive_grid_bvh(mesh, target_degree=3)
    _check_tree_invariants(bvh, len(mesh.triangles))
    assert bvh.layer_count() >= 2
    # layers in order of increasing depth, root first
    assert bvh.layer_bounds[0] == 0 and bvh.layer_bounds[1] == 1


def test_recursive_grid_bvh_cube():
    mesh = make.cube(1.0)
    bvh = make_recursive_grid_bvh(mesh, target_degree=3)
    _check_tree_invariants(bvh, len(mesh.triangles))


def test_dfs_layout():
    mesh = make.sphere(50.0, nsteps=20)
    bvh = make_recursive_grid_bvh(mesh, target_degree=3)
    dfs_nodes, escape = flatten_to_dfs(bvh)
    validate_dfs(dfs_nodes, escape)

    # every triangle appears exactly once as a DFS leaf
    nchild = dfs_nodes[:, 3] >> CHILD_BITS
    tris = dfs_nodes[:, 3][nchild == 0] & np.uint32((1 << CHILD_BITS) - 1)
    assert sorted(tris) == list(range(len(mesh.triangles)))

    # escape of the root spans the whole tree
    assert escape[0] == len(dfs_nodes)

    # parent boxes contain the boxes of all nodes inside their subtree span
    lo = np.stack([dfs_nodes[:, i] & 0xFFFF for i in range(3)], axis=1)
    hi = np.stack([dfs_nodes[:, i] >> 16 for i in range(3)], axis=1)
    for i in np.flatnonzero(nchild > 0)[:200]:
        span = slice(i + 1, escape[i])
        assert (lo[span] >= lo[i]).all()
        assert (hi[span] <= hi[i]).all()


def test_simple_bvh():
    mesh = make.cube(2.0)
    bvh = make_simple_bvh(mesh, degree=2)
    u = unpack_nodes(bvh.nodes)
    leaves = (u['nchild'] == 0) & (u['xhi'] > u['xlo'])
    assert len(np.unique(u['child'][leaves])) == len(mesh.triangles)
