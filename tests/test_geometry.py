"""Host geometry model tests (mesh hygiene, solid flattening)."""
import numpy as np

from chroma_tpu.geometry import Mesh, Solid, Material, Surface, Geometry, vacuum
from chroma_tpu import make


def test_mesh_dedupe_and_null_removal():
    verts = [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 0]]  # dup of vertex 0
    tris = [[0, 1, 2], [3, 1, 2], [1, 1, 2]]  # last is degenerate
    m = Mesh(verts, tris, remove_duplicate_vertices=True)
    assert len(m.vertices) == 3
    # degenerate triangle dropped; remaining two are identical after dedupe
    assert len(m.triangles) == 2
    assert (m.triangles[0] == m.triangles[1]).all()


def test_mesh_bounds_and_md5():
    m = make.cube(2.0)
    lo, hi = m.get_bounds()
    np.testing.assert_allclose(lo, [-1, -1, -1])
    np.testing.assert_allclose(hi, [1, 1, 1])
    h1 = m.md5()
    m2 = make.cube(2.0)
    assert m2.md5() == h1
    assert make.cube(3.0).md5() != h1


def test_mesh_add():
    a = make.cube(1.0)
    b = make.cube(1.0, center=(5, 0, 0))
    c = a + b
    assert len(c.triangles) == len(a.triangles) + len(b.triangles)
    assert len(c.vertices) == len(a.vertices) + len(b.vertices)


def test_solid_broadcast_and_indices():
    mesh = make.cube(1.0)
    mat1 = Material('m1')
    mat2 = Material('m2')
    surf = Surface('s')
    s = Solid(mesh, mat1, mat2, surface=surf, color=0xff)
    n = len(mesh.triangles)
    assert len(s.material1) == n
    assert all(m is mat1 for m in s.material1)
    lookup = {id(mat1): 0, id(mat2): 1}
    assert (s.material1_indices(lookup) == 0).all()
    assert (s.material2_indices(lookup) == 1).all()


def test_geometry_flatten():
    mat = Material('water')
    mat.set('refractive_index', 1.33)
    surf = Surface('black')

    geo = Geometry()
    geo.add_solid(Solid(make.cube(1.0), mat, vacuum, surface=surf))
    geo.add_solid(Solid(make.cube(1.0), vacuum, vacuum),
                  displacement=(10, 0, 0))
    geo.flatten()

    nt = len(geo.mesh.triangles)
    assert nt == 32  # two extruded cubes, 16 triangles each
    assert len(geo.material1_index) == nt
    assert len(geo.surface_index) == nt
    assert len(geo.solid_id) == nt
    assert set(geo.solid_id) == {0, 1}
    # second solid has no surface -> index -1
    assert (geo.surface_index[geo.solid_id == 1] == -1).all()
    assert (geo.surface_index[geo.solid_id == 0] >= 0).all()
    # displacement applied
    second = geo.mesh.vertices[
        np.unique(geo.mesh.triangles[geo.solid_id == 1])]
    assert second[:, 0].min() >= 9.0


def test_geometry_flatten_rotation():
    from chroma_tpu.transform import make_rotation_matrix
    geo = Geometry()
    rot = make_rotation_matrix(np.pi / 2, (0, 0, 1))
    geo.add_solid(Solid(make.box(2.0, 1.0, 1.0), vacuum, vacuum), rotation=rot)
    geo.flatten()
    lo = geo.mesh.vertices.min(axis=0)
    hi = geo.mesh.vertices.max(axis=0)
    # the long (x) axis rotates onto y
    np.testing.assert_allclose(hi - lo, [1, 2, 1], atol=1e-5)


def test_solid_weld():
    a = Solid(make.cube(1.0), vacuum, vacuum, color=1)
    b = Solid(make.cube(1.0), vacuum, vacuum, color=2)
    na = len(a.mesh.triangles)
    a.weld(b)
    # all triangles are shared, so no new ones are added
    assert len(a.mesh.triangles) == na
