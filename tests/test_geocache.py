"""Lean instanced geometry arrays + on-disk GeometryArrays cache.

Covers the InstanceArrays resolution path (searchsorted owner, unique-soup
codes/normals, rotated normals) against the dense per-triangle arrays, and
the geocache npz round trip (reference analog: chroma/cache.py pickles).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from chroma_tpu import demo
from chroma_tpu.loader import create_geometry_from_obj
from chroma_tpu.ops.types import build_geometry_arrays


@pytest.fixture(scope='module')
def tiny_arrays():
    det = demo.tiny()
    geo = create_geometry_from_obj(det, auto_build_bvh=False)
    return geo, build_geometry_arrays(geo)


def test_lean_codes_and_solids_match_dense(tiny_arrays):
    geo, ga = tiny_arrays
    assert ga.inst is not None
    ntri = int(ga.inst.tri_base[-1])
    tri = jnp.arange(ntri, dtype=jnp.int32)
    iidx = jnp.searchsorted(ga.inst.tri_base, tri,
                            side='right').astype(jnp.int32) - 1
    u = tri + ga.inst.soup_off[iidx]
    assert np.array_equal(np.asarray(ga.inst.codes_u[u]),
                          np.asarray(ga.material_codes))
    # the owning instance IS the per-triangle solid id
    assert np.array_equal(np.asarray(iidx), np.asarray(ga.solid_id))


def test_lean_normals_match_dense(tiny_arrays):
    geo, ga = tiny_arrays
    ntri = int(ga.inst.tri_base[-1])
    tri = jnp.arange(ntri, dtype=jnp.int32)
    iidx = jnp.searchsorted(ga.inst.tri_base, tri,
                            side='right').astype(jnp.int32) - 1
    u = tri + ga.inst.soup_off[iidx]
    nloc = np.asarray(ga.inst.normals_u[u])
    R = np.asarray(ga.inst.rot_n[iidx]).reshape(-1, 3, 3)
    nw = np.einsum('nij,nj->ni', R, nloc)
    nd = np.asarray(ga.tri_normals)
    err = np.abs(nw - nd).max(axis=1)
    # identical up to f32 rounding of the flattened world vertices; only
    # near-degenerate sliver triangles exceed 1e-2
    assert np.percentile(err, 99) < 1e-3
    assert (err > 1e-1).sum() <= 0.001 * ntri


@pytest.mark.slow
def test_geocache_roundtrip(tiny_arrays, tmp_path):
    from chroma_tpu.io.geocache import (save_geometry_arrays,
                                        load_geometry_arrays)
    geo, ga = tiny_arrays
    path = str(tmp_path / 'geo')
    save_geometry_arrays(path, ga)
    ga2 = load_geometry_arrays(path)
    assert ga2 is not None
    assert type(ga2.wide).__name__ == type(ga.wide).__name__
    np.testing.assert_array_equal(np.asarray(ga2.wide.rows),
                                  np.asarray(ga.wide.rows))
    assert ga2.wide.fanout == ga.wide.fanout
    assert ga2.wide.max_depth == ga.wide.max_depth
    np.testing.assert_array_equal(np.asarray(ga2.inst.codes_u),
                                  np.asarray(ga.inst.codes_u))
    np.testing.assert_array_equal(np.asarray(ga2.materials.props),
                                  np.asarray(ga.materials.props))
    assert ga2.surfaces.models_present == ga.surfaces.models_present
    assert ga2.detector.nchannels == ga.detector.nchannels
    assert ga2.materials.has_reemission == ga.materials.has_reemission

    # identical propagation through original and reloaded arrays
    from chroma_tpu.ops.propagate import propagate
    from chroma_tpu.ops.sample import make_key
    from chroma_tpu.ops.photon import PhotonState
    import jax
    n = 512
    key = jax.random.key(7)
    k1, k2 = jax.random.split(key)
    d = jax.random.normal(k1, (n, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    pol = jnp.cross(jax.random.normal(k2, (n, 3)), d)
    pol = pol / jnp.linalg.norm(pol, axis=1, keepdims=True)
    ps = PhotonState(
        pos=jnp.zeros((n, 3), jnp.float32), dir=d.astype(jnp.float32),
        pol=pol.astype(jnp.float32),
        wavelength=jnp.full(n, 400.0, jnp.float32),
        t=jnp.zeros(n, jnp.float32), weight=jnp.ones(n, jnp.float32),
        flags=jnp.zeros(n, jnp.uint32),
        last_hit_triangle=jnp.full(n, -1, jnp.int32),
        evidx=jnp.zeros(n, jnp.uint32),
        cur_mat=jnp.full(n, -1, jnp.int32))
    r1 = propagate(ps, ga, make_key(3), max_steps=12)
    r2 = propagate(ps, ga2, make_key(3), max_steps=12)
    np.testing.assert_array_equal(np.asarray(r1.flags),
                                  np.asarray(r2.flags))
    np.testing.assert_array_equal(np.asarray(r1.last_hit_triangle),
                                  np.asarray(r2.last_hit_triangle))


@pytest.mark.slow
def test_lean_mode_drops_world_arrays(tiny_arrays):
    geo, _ = tiny_arrays
    ga = build_geometry_arrays(geo, lean=True)
    assert ga.vertices is None and ga.tri_normals is None
    assert ga.material_codes is None and ga.solid_id is None
    assert ga.inst is not None
    # propagation works without any per-triangle world array
    from chroma_tpu.ops.propagate import propagate
    from chroma_tpu.ops.sample import make_key
    from chroma_tpu.ops.photon import PhotonState
    import jax
    n = 256
    d = jax.random.normal(jax.random.key(0), (n, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    ps = PhotonState(
        pos=jnp.zeros((n, 3), jnp.float32), dir=d.astype(jnp.float32),
        pol=d.astype(jnp.float32),
        wavelength=jnp.full(n, 400.0, jnp.float32),
        t=jnp.zeros(n, jnp.float32), weight=jnp.ones(n, jnp.float32),
        flags=jnp.zeros(n, jnp.uint32),
        last_hit_triangle=jnp.full(n, -1, jnp.int32),
        evidx=jnp.zeros(n, jnp.uint32),
        cur_mat=jnp.full(n, -1, jnp.int32))
    res = propagate(ps, ga, make_key(1), max_steps=8)
    flags = np.asarray(res.flags)
    assert (flags != 0).all()
