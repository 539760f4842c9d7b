"""The Pallas visit kernel must reproduce the jnp traversal exactly.

Runs the instanced traversal twice on the same rays — once with the pure
XLA body, once with the Pallas body (interpret mode off-TPU) — and
demands identical triangles and distances."""
import os

import numpy as np
import pytest
import jax

from chroma_tpu.geometry import Geometry, Solid
from chroma_tpu.demo.optics import water, glass
from chroma_tpu.loader import create_geometry_from_obj
from chroma_tpu.make import box, sphere
from chroma_tpu.ops.types import build_geometry_arrays
from chroma_tpu.bvh.wide import InstancedBVH


@pytest.fixture(scope='module')
def wide():
    geo = Geometry(water)
    geo.add_solid(Solid(box(100.0, 80.0, 60.0), glass, water))
    geo.add_solid(Solid(sphere(30.0, nsteps=24), glass, water),
                  displacement=(120.0, 0.0, 0.0))
    geo.add_solid(Solid(box(40.0, 40.0, 40.0), glass, water),
                  displacement=(-120.0, 30.0, 0.0))
    ga = build_geometry_arrays(create_geometry_from_obj(
        geo, update_bvh_cache=False))
    assert isinstance(ga.wide, InstancedBVH)
    return ga.wide


def _rays(n, seed):
    rs = np.random.RandomState(seed)
    origin = rs.uniform(-200, 200, (n, 3)).astype(np.float32)
    d = rs.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return origin, d


@pytest.mark.slow
def test_pallas_visit_matches_jnp(wide, monkeypatch):
    from chroma_tpu.ops import mesh_wide, visit_kernel
    n = 2048
    # TB must divide n/128 or enabled() refuses even under 'force' (the
    # default TB=32 needs n >= 4096 and made this test silently vacuous)
    monkeypatch.setattr(visit_kernel, 'TB', 8)
    origin, d = _rays(n, 3)

    monkeypatch.setattr(visit_kernel, 'PALLAS_VISIT', '0')
    tri_ref, dist_ref = jax.jit(
        lambda o, dd: mesh_wide.intersect_mesh_wide(o, dd, wide,
                                                    two_phase=False))(
        origin, d)

    monkeypatch.setattr(visit_kernel, 'PALLAS_VISIT', 'force')
    assert visit_kernel.enabled(n)
    tri_pal, dist_pal = jax.jit(
        lambda o, dd: mesh_wide.intersect_mesh_wide(o, dd, wide,
                                                    two_phase=False))(
        origin, d)

    assert np.array_equal(np.asarray(tri_ref), np.asarray(tri_pal))
    hit = np.asarray(tri_ref) >= 0
    # interpreted kernels may fuse multiplies differently than XLA; on
    # the real TPU the kernel matched the jnp body bitwise
    np.testing.assert_allclose(np.asarray(dist_ref)[hit],
                               np.asarray(dist_pal)[hit], rtol=1e-5)
