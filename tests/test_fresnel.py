"""Fresnel reflectance and Snell refraction vs the analytic formulas.

Statistical checks of propagate_at_boundary (reference: photon.h:572-632)
at a vacuum -> glass (n = 1.5) interface: s- and p-polarized reflectance
at 45 degrees, near-zero p reflectance at Brewster's angle, and the
refracted ray angle."""
import numpy as np
import jax.numpy as jnp

from chroma_tpu import event
from chroma_tpu.geometry import Geometry, Solid, Material, vacuum
from chroma_tpu.loader import create_geometry_from_obj
from chroma_tpu.make import box
from chroma_tpu.ops.types import build_geometry_arrays
from chroma_tpu.ops.propagate import propagate, photon_state_from_host
from chroma_tpu.ops.sample import make_key

N_GLASS = 1.5


def _glass_box_arrays():
    glass = Material('testglass')
    glass.set('refractive_index', N_GLASS)
    glass.set('absorption_length', 1e9)
    glass.set('scattering_length', 1e9)
    geo = Geometry(vacuum)
    geo.add_solid(Solid(box(1000.0, 1000.0, 1000.0), glass, vacuum))
    geo = create_geometry_from_obj(geo, update_bvh_cache=False,
                                   read_bvh_cache=False)
    return build_geometry_arrays(geo)


def _one_bounce(ga, theta_deg, s_pol, n=20000, seed=11):
    "One propagation step of a tilted beam onto the +z face; returns flags+dirs."
    th = np.radians(theta_deg)
    d = np.array([np.sin(th), 0.0, -np.cos(th)], np.float32)
    s_hat = np.array([0.0, -1.0, 0.0], np.float32)   # normalize(d x n)
    p_hat = np.cross(s_hat, d).astype(np.float32)    # in-plane, ortho to d
    pol = s_hat if s_pol else p_hat

    # start just above the face so the beam stays on it for any theta
    pos = np.zeros((n, 3), np.float32)
    pos[:, 2] = 510.0
    pos[:, 0] = np.linspace(-100.0, 100.0, n) - 10.0 * np.tan(th)
    ph = event.Photons(pos=pos, dir=np.tile(d, (n, 1)),
                       pol=np.tile(pol, (n, 1)),
                       wavelengths=np.full(n, 400.0, np.float32),
                       t=np.zeros(n, np.float32))
    res = propagate(photon_state_from_host(ph), ga, make_key(seed),
                    max_steps=1)
    return np.asarray(res.flags), np.asarray(res.dir)


def _analytic_r(theta_deg):
    ti = np.radians(theta_deg)
    tt = np.arcsin(np.sin(ti) / N_GLASS)
    r_s = (np.sin(ti - tt) / np.sin(ti + tt)) ** 2
    r_p = (np.tan(ti - tt) / np.tan(ti + tt)) ** 2
    return r_s, r_p, tt


def _reflected(flags):
    return (flags & np.uint32(event.REFLECT_SPECULAR)) != 0


def test_fresnel_reflectance_45deg():
    ga = _glass_box_arrays()
    r_s, r_p, _ = _analytic_r(45.0)
    n = 20000
    for s_pol, expect in ((True, r_s), (False, r_p)):
        flags, _ = _one_bounce(ga, 45.0, s_pol, n)
        frac = _reflected(flags).mean()
        sigma = np.sqrt(expect * (1 - expect) / n)
        assert abs(frac - expect) < 5 * sigma + 1e-3, \
            (s_pol, frac, expect)


def test_brewster_angle_p_polarized():
    "p-polarized light at Brewster's angle reflects (almost) nothing."
    ga = _glass_box_arrays()
    brewster = np.degrees(np.arctan(N_GLASS))
    flags, _ = _one_bounce(ga, brewster, s_pol=False)
    assert _reflected(flags).mean() < 2e-3


def test_snell_refraction_angle():
    ga = _glass_box_arrays()
    _, _, tt = _analytic_r(45.0)
    flags, dirs = _one_bounce(ga, 45.0, s_pol=True)
    # rare in-flight bulk interactions (p ~ 1e-5) are legal physics, not
    # boundary events — exclude them from the angle checks
    bulk = (flags & np.uint32(event.BULK_ABSORB
                              | event.RAYLEIGH_SCATTER
                              | event.NO_HIT)) != 0
    trans = ~_reflected(flags) & ~bulk
    assert trans.sum() > 10000
    # transmitted rays make angle theta_t with -z
    cos_t = -dirs[trans, 2]
    assert np.allclose(cos_t, np.cos(tt), atol=1e-4)
    # reflected rays mirror about the face plane
    refl = _reflected(flags)
    assert refl.sum() > 500
    assert np.allclose(dirs[refl, 2], np.cos(np.radians(45.0)),
                       atol=1e-4)
    # energy leaves the plane of incidence untouched
    assert np.allclose(dirs[~bulk, 1], 0.0, atol=1e-5)