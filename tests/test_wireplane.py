"""Analytic wire-plane intersection tests (reference behavior:
chroma/cuda/photon.h:96-270 wire-plane branch of fill_state)."""
import numpy as np
import jax.numpy as jnp
import pytest

from chroma_tpu.geometry import (Geometry, Solid, Material, Surface,
                                 WirePlane, vacuum)
from chroma_tpu.loader import create_geometry_from_obj
from chroma_tpu.make import box
from chroma_tpu.ops.types import build_geometry_arrays
from chroma_tpu.ops.wireplane import intersect_wireplanes


@pytest.fixture(scope='module')
def geometry():
    lar = Material('lar')
    lar.set('refractive_index', 1.38)
    lar.set('absorption_length', 1e6)
    lar.set('scattering_length', 1e6)
    metal = Material('metal')
    metal.set('refractive_index', 1.5)
    metal.set('absorption_length', 1e-3)
    metal.set('scattering_length', 1e6)
    wire_surface = Surface('wire')
    wire_surface.set('absorb', 1)

    geo = Geometry(vacuum)
    geo.add_solid(Solid(box(2000, 2000, 2000), lar, vacuum))
    # wires along x, repeating along y with 3mm pitch, plane at z=0
    geo.add_wireplane(WirePlane(
        origin=(0, 0, 0), u=(1, 0, 0), v=(0, 1, 0),
        pitch=3.0, radius=0.15,
        umin=-500, umax=500, vmin=-500, vmax=500,
        surface=wire_surface, material_inner=metal, material_outer=lar))
    geo = create_geometry_from_obj(geo, update_bvh_cache=False)
    return build_geometry_arrays(geo)


def test_head_on_hit_and_miss(geometry):
    # ray along -z aimed straight at the wire center at y=0 hits the
    # cylinder surface at distance 100 - radius; a ray aimed between
    # wires (y=1.5mm) passes through
    pos = jnp.array([[0.0, 0.0, 100.0], [0.0, 1.5, 100.0]], jnp.float32)
    direction = jnp.array([[0, 0, -1], [0, 0, -1]], jnp.float32)
    active = jnp.ones(2, bool)
    hit = intersect_wireplanes(pos, direction, geometry, active)
    assert bool(hit.hit[0])
    np.testing.assert_allclose(float(hit.distance[0]), 100.0 - 0.15,
                               rtol=1e-4)
    assert not bool(hit.hit[1])
    # outward normal at the first crossing faces the photon (+z)
    np.testing.assert_allclose(np.asarray(hit.normal[0]), [0, 0, 1],
                               atol=1e-4)
    assert not bool(hit.inside_to_outside[0])


def test_oblique_rays_match_brute_force(geometry):
    # oblique rays crossing the plane at many offsets; every ray must
    # agree with a brute-force cylinder intersection over all wires
    rng = np.random.RandomState(7)
    n = 128
    pos = np.column_stack([rng.uniform(-50, 50, n),
                           rng.uniform(-30, 30, n),
                           np.full(n, 30.0)]).astype(np.float32)
    d = np.column_stack([rng.uniform(-0.3, 0.3, n),
                         rng.uniform(-1, 1, n),
                         -np.ones(n)]).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    hit = intersect_wireplanes(jnp.asarray(pos), jnp.asarray(d),
                               geometry, jnp.ones(n, bool))
    got_hit = np.asarray(hit.hit)
    got_d = np.asarray(hit.distance)

    r = 0.15
    for i in range(n):
        best = np.inf
        for k in range(-60, 60):
            oy, oz = pos[i, 1] - k * 3.0, pos[i, 2]
            dy, dz = d[i, 1], d[i, 2]
            a = dy * dy + dz * dz
            b = oy * dy + oz * dz
            c = oy * oy + oz * oz - r * r
            disc = b * b - a * c
            if disc < 0:
                continue
            t = (-b - np.sqrt(disc)) / a
            if t > 1e-4:
                # must land within the u extent (|x| <= 500)
                if abs(pos[i, 0] + d[i, 0] * t) <= 500:
                    best = min(best, t)
        assert bool(got_hit[i]) == bool(np.isfinite(best)), i
        if np.isfinite(best):
            np.testing.assert_allclose(got_d[i], best, rtol=2e-3)


def test_outside_extent_misses(geometry):
    # beyond umax the plane has no wires
    pos = jnp.array([[600.0, 0.0, 100.0]], jnp.float32)
    direction = jnp.array([[0, 0, -1]], jnp.float32)
    hit = intersect_wireplanes(pos, direction, geometry,
                               jnp.ones(1, bool))
    assert not bool(hit.hit[0])


@pytest.mark.slow
def test_propagation_absorbs_on_wires(geometry):
    "Photons aimed at wires terminate at the wire surface."
    import jax
    from chroma_tpu.ops.propagate import (propagate,
                                          photon_state_from_host)
    from chroma_tpu import event

    n = 64
    ys = np.linspace(-1.5, 1.5, n)
    pos = np.column_stack([np.zeros(n), ys, np.full(n, 100.0)])
    direction = np.tile([0.0, 0.0, -1.0], (n, 1))
    pol = np.tile([1.0, 0.0, 0.0], (n, 1))
    ph = event.Photons(pos, direction, pol, np.full(n, 400.0),
                       np.zeros(n))
    out = propagate(photon_state_from_host(ph), geometry,
                    jax.random.key(3), max_steps=10)
    flags = np.asarray(out.flags)
    absorbed = (flags & np.uint32(event.SURFACE_ABSORB)) > 0
    # photons within a wire radius of a wire center get absorbed there
    on_wire = np.abs(np.abs(ys) % 3.0) < 0.15
    assert absorbed[on_wire].all()
    # photons aimed at the middle of the gap pass through to the wall
    mid_gap = np.abs(np.abs(ys) - 1.5) < 0.1
    assert not absorbed[mid_gap].any()
