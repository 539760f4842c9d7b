"""Intersection op tests: analytic cases + brute-force cross-check of the
BVH traversal (reference test strategy: test/test_ray_intersection.py)."""
import numpy as np
import jax.numpy as jnp

from chroma_tpu import make
from chroma_tpu.loader import create_geometry_from_obj
from chroma_tpu.ops.types import build_geometry_arrays
from chroma_tpu.ops.intersect import intersect_triangle, intersect_box
from chroma_tpu.ops.mesh import intersect_mesh, distance_to_mesh
from chroma_tpu.tools import from_film


def test_triangle_hit_and_miss():
    v0 = jnp.array([[0., 0., 1.], [0., 0., 1.]])
    v1 = jnp.array([[1., 0., 1.], [1., 0., 1.]])
    v2 = jnp.array([[0., 1., 1.], [0., 1., 1.]])
    origin = jnp.array([[0.2, 0.2, 0.], [5., 5., 0.]])
    direction = jnp.array([[0., 0., 1.], [0., 0., 1.]])
    hit, t = intersect_triangle(origin, direction, v0, v1, v2)
    assert bool(hit[0]) and not bool(hit[1])
    np.testing.assert_allclose(t[0], 1.0, rtol=1e-6)


def test_triangle_parallel_ray():
    v0 = jnp.array([[0., 0., 1.]])
    v1 = jnp.array([[1., 0., 1.]])
    v2 = jnp.array([[0., 1., 1.]])
    origin = jnp.array([[0., 0., 0.]])
    direction = jnp.array([[1., 0., 0.]])  # parallel to triangle plane
    hit, _ = intersect_triangle(origin, direction, v0, v1, v2)
    assert not bool(hit[0])


def test_box():
    lower = jnp.array([[-1., -1., -1.]])
    upper = jnp.array([[1., 1., 1.]])

    def box(origin, direction):
        origin = jnp.asarray([origin])
        direction = jnp.asarray([direction])
        inv = 1.0 / direction
        hit, d = intersect_box(origin, -origin * inv, inv, lower, upper)
        return bool(hit[0]), float(d[0])

    hit, d = box([0., 0., -5.], [0., 0., 1.])
    assert hit and abs(d - 4.0) < 1e-6
    hit, _ = box([0., 0., -5.], [0., 0., -1.])
    assert not hit
    hit, d = box([0., 0., 0.], [0., 0., 1.])  # inside
    assert hit and d == 0.0
    # zero direction components degrade to an exact containment test on
    # their axis (IEEE evaluation of the reference's (lo - o)/d form):
    # this offset ray's x never enters [-1, 1], so it must MISS — the
    # old always-hit fallback made axis-aligned rays sweep every node
    # overlapping their 1-D slab
    hit, d = box([5., 0., -5.], [0., 0., 1.])
    assert not hit
    hit, d = box([-0., 0., -5.], [-0., -0., 1.])  # negative zeros
    assert hit and abs(d - 4.0) < 1e-6
    # a diagonal ray misses the offset box outright
    hit, _ = box([5., 0., -5.], [0.001, 0.001, 1.])
    assert not hit
    # axis-aligned ray with zero components
    hit, d = box([0.5, 0.5, -3.], [0., 0., 1.])
    assert hit and abs(d - 2.0) < 1e-6


def _brute_force(origin, direction, mesh):
    "Nearest triangle per ray by testing every triangle."
    tri = mesh.vertices[mesh.triangles]  # (T,3,3)
    o = jnp.asarray(origin)[:, None, :]
    d = jnp.asarray(direction)[:, None, :]
    hit, t = intersect_triangle(o, d,
                                jnp.asarray(tri[:, 0])[None],
                                jnp.asarray(tri[:, 1])[None],
                                jnp.asarray(tri[:, 2])[None])
    t = jnp.where(hit, t, jnp.inf)
    best = jnp.argmin(t, axis=1)
    best_t = t[jnp.arange(len(origin)), best]
    return np.where(np.isfinite(best_t), best, -1), np.asarray(best_t)


def test_mesh_traversal_matches_brute_force():
    mesh = make.sphere(10.0, nsteps=12)
    geo = create_geometry_from_obj(mesh, update_bvh_cache=False)
    ga = build_geometry_arrays(geo)

    rng = np.random.RandomState(42)
    n = 256
    origin = rng.uniform(-30, 30, (n, 3)).astype(np.float32)
    # half the rays are aimed near the sphere, half are random
    target = rng.uniform(-12, 12, (n, 3))
    direction = np.where(np.arange(n)[:, None] % 2 == 0,
                         target - origin, rng.normal(size=(n, 3)))
    direction /= np.linalg.norm(direction, axis=1, keepdims=True)
    direction = direction.astype(np.float32)

    tri, dist = intersect_mesh(jnp.asarray(origin), jnp.asarray(direction),
                               ga)
    tri = np.asarray(tri)
    dist = np.asarray(dist)

    bf_tri, bf_dist = _brute_force(origin, direction, geo.mesh)

    hit = bf_tri >= 0
    assert (tri >= 0).sum() > 20  # sanity: a decent number of rays hit
    np.testing.assert_array_equal(tri >= 0, hit)
    np.testing.assert_allclose(dist[hit], bf_dist[hit], rtol=1e-4)
    # triangle ids can differ at shared edges; distances must agree


def test_distance_to_mesh_film():
    mesh = make.cube(2.0)
    geo = create_geometry_from_obj(mesh, update_bvh_cache=False)
    ga = build_geometry_arrays(geo)
    # the default film axes view along +y; narrow the film so the cube
    # fills a good fraction of the frame
    origin, direction = from_film(position=(0, -10, 0), size=(16, 12),
                                  width=4.0)
    d = np.asarray(distance_to_mesh(jnp.asarray(origin, dtype=jnp.float32),
                                    jnp.asarray(direction,
                                                dtype=jnp.float32), ga))
    assert np.isfinite(d).sum() > 10
    # central rays hit the front face at y=-1, ~9 units from the camera
    assert abs(np.nanmin(np.where(np.isfinite(d), d, np.nan)) - 9.0) < 0.2


def test_last_hit_triangle_excluded():
    mesh = make.cube(2.0)
    geo = create_geometry_from_obj(mesh, update_bvh_cache=False)
    ga = build_geometry_arrays(geo)
    # a ray from inside hits a face; re-intersecting from that face with
    # last_hit set must find a different triangle (or none), not distance 0
    origin = jnp.array([[0., 0., 0.]], dtype=jnp.float32)
    direction = jnp.array([[0., 0., 1.]], dtype=jnp.float32)
    tri, dist = intersect_mesh(origin, direction, ga)
    assert int(tri[0]) >= 0
    surface_point = origin + dist[:, None] * direction
    tri2, dist2 = intersect_mesh(surface_point, direction, ga,
                                 last_hit_triangle=tri)
    assert int(tri2[0]) != int(tri[0])
