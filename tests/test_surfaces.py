"""Surface model physics tests: WLS reemission, dichroic, angular,
thin-film complex, bulk reemission (reference test strategy:
test/test_reemission.py + distribution-level checks)."""
import numpy as np
import pytest

from chroma_tpu import event
from chroma_tpu.geometry import (Geometry, Solid, Material, Surface,
                                 DichroicProps, AngularProps, vacuum,
                                 SURFACE_WLS, SURFACE_DICHROIC,
                                 SURFACE_ANGULAR, SURFACE_COMPLEX,
                                 standard_wavelengths)
from chroma_tpu.loader import create_geometry_from_obj
from chroma_tpu.make import box
from chroma_tpu.sim import Simulation


def _beam(n, wavelength=350.0, t0=0.0):
    pos = np.tile([0, 0, 0], (n, 1)).astype(np.float32)
    dir = np.tile([0, 0, 1], (n, 1)).astype(np.float32)
    phi = np.random.uniform(0, 2 * np.pi, n).astype(np.float32)
    pol = np.column_stack([np.cos(phi), np.sin(phi),
                           np.zeros(n, np.float32)])
    return event.Photons(pos=pos, dir=dir, pol=pol,
                         wavelengths=np.full(n, wavelength, np.float32),
                         t=np.full(n, t0, np.float32))


def _box_sim(surface, seed=0, dims=(1000, 1000, 1000)):
    geo = Geometry(vacuum)
    geo.add_solid(Solid(box(*dims), vacuum, vacuum, surface=surface))
    geo = create_geometry_from_obj(geo, update_bvh_cache=False)
    return Simulation(geo, seed=seed)


@pytest.mark.slow
def test_wls_reemission_spectrum():
    """WLS surface: absorbed 350nm photons reemit with the configured
    spectrum (a gaussian at 500nm) isotropically."""
    wls = Surface('wls', model=SURFACE_WLS)
    wls.set('absorb', 1.0)
    wls.set('reemit', 1.0)
    wls.transmissive = 1

    # reemission CDF: gaussian around 500nm, sigma 20nm
    wl = standard_wavelengths
    pdf = np.exp(-0.5 * ((wl - 500.0) / 20.0) ** 2)
    cdf = np.concatenate([[0.0], np.cumsum((pdf[1:] + pdf[:-1]) / 2)])
    cdf /= cdf[-1]
    wls.set('reemission_cdf', cdf, wavelengths=wl)

    np.random.seed(0)
    sim = _box_sim(wls, seed=4)
    # a single step: reach the wall and reemit exactly once, so the
    # recorded directions are the pristine isotropic reemission sample
    ev = next(sim.simulate(_beam(20000), keep_photons_end=True,
                           max_steps=1))
    pe = ev.photons_end
    reemitted = (pe.flags & np.uint32(event.SURFACE_REEMIT)) > 0
    assert reemitted.sum() > 15000

    wvl = pe.wavelengths[reemitted]
    assert abs(wvl.mean() - 500.0) < 2.0
    assert abs(wvl.std() - 20.0) < 2.0
    # reemission is isotropic: mean direction cosine near zero
    assert abs(pe.dir[reemitted][:, 2].mean()) < 0.05


def test_dichroic_wavelength_split():
    """Dichroic filter: reflect short wavelengths, transmit long ones."""
    angles = np.array([0.0, np.pi / 2])
    wl_pts = np.array([300.0, 449.0, 451.0, 800.0])
    # reflect below 450nm, transmit above, independent of angle
    reflect = [np.column_stack([wl_pts, [1.0, 1.0, 0.0, 0.0]])] * 2
    transmit = [np.column_stack([wl_pts, [0.0, 0.0, 1.0, 1.0]])] * 2
    dichroic = Surface('dichroic', model=SURFACE_DICHROIC)
    dichroic.dichroic_props = DichroicProps(angles, reflect, transmit)
    dichroic.transmissive = 1

    np.random.seed(0)
    sim = _box_sim(dichroic, seed=5)

    for wavelength, expect_reflect in ((350.0, True), (550.0, False)):
        ev = next(sim.simulate(_beam(5000, wavelength),
                               keep_photons_end=True, max_steps=2))
        pe = ev.photons_end
        reflected = (pe.flags
                     & np.uint32(event.REFLECT_SPECULAR)) > 0
        transmitted = (pe.flags
                       & np.uint32(event.SURFACE_TRANSMIT)) > 0
        if expect_reflect:
            assert reflected.mean() > 0.99
        else:
            assert transmitted.mean() > 0.99


@pytest.mark.slow
def test_angular_surface():
    """Angular surface: transmission probability depends on incidence
    angle (here: transmit at normal incidence, absorb at grazing)."""
    angles = np.array([0.0, np.pi / 4, np.pi / 2])
    angular = Surface('angular', model=SURFACE_ANGULAR)
    angular.angular_props = AngularProps(
        angles, transmit=[1.0, 0.0, 0.0],
        reflect_specular=[0.0, 0.0, 0.0],
        reflect_diffuse=[0.0, 0.0, 0.0])
    angular.transmissive = 1

    np.random.seed(0)
    # flat slab so oblique rays still reach the z wall first
    sim = _box_sim(angular, seed=6, dims=(8000, 8000, 1000))
    # normal incidence -> transmitted
    ev = next(sim.simulate(_beam(2000), keep_photons_end=True,
                           max_steps=2))
    transmitted = (ev.photons_end.flags
                   & np.uint32(event.SURFACE_TRANSMIT)) > 0
    assert transmitted.mean() > 0.99

    # 60-degree incidence -> absorbed (interp between pi/4 and pi/2 is 0)
    n = 2000
    photons = _beam(n)
    d = np.tile([np.sin(np.pi / 3), 0.0, np.cos(np.pi / 3)], (n, 1))
    photons.dir = d.astype(np.float32)
    ev = next(sim.simulate(photons, keep_photons_end=True, max_steps=2))
    absorbed = (ev.photons_end.flags
                & np.uint32(event.SURFACE_ABSORB)) > 0
    assert absorbed.mean() > 0.99


def test_complex_surface_transparent_film():
    """Thin-film surface with n2 == n1 == n3 and zero extinction behaves
    as a transparent layer: photons transmit, none absorbed."""
    cx = Surface('film', model=SURFACE_COMPLEX)
    cx.set('eta', 1.0)
    cx.set('k', 0.0)
    cx.thickness = 100.0  # nm
    cx.transmissive = 1

    np.random.seed(0)
    sim = _box_sim(cx, seed=7)
    ev = next(sim.simulate(_beam(2000), keep_photons_end=True,
                           max_steps=2))
    pe = ev.photons_end
    transmitted = (pe.flags & np.uint32(event.SURFACE_TRANSMIT)) > 0
    absorbed = (pe.flags & np.uint32(event.SURFACE_ABSORB
                                     | event.SURFACE_DETECT)) > 0
    assert transmitted.mean() > 0.98
    assert absorbed.mean() < 0.01


def test_complex_surface_metallic_film():
    """A strongly absorbing film (large k) kills most photons."""
    cx = Surface('metal', model=SURFACE_COMPLEX)
    cx.set('eta', 1.5)
    cx.set('k', 3.0)
    cx.thickness = 200.0
    cx.transmissive = 1

    np.random.seed(0)
    sim = _box_sim(cx, seed=8)
    ev = next(sim.simulate(_beam(2000), keep_photons_end=True,
                           max_steps=3))
    pe = ev.photons_end
    terminated_at_surface = (pe.flags
                             & np.uint32(event.SURFACE_ABSORB
                                         | event.SURFACE_DETECT)) > 0
    reflected = (pe.flags & np.uint32(event.REFLECT_SPECULAR
                                      | event.REFLECT_DIFFUSE)) > 0
    assert (terminated_at_surface | reflected).mean() > 0.9


def test_bulk_reemission():
    """Scintillator-style bulk reemission: absorbed photons reemit at a
    shifted wavelength with the component's time distribution
    (reference: photon.h:501-538)."""
    wl = standard_wavelengths
    scint = Material('scint')
    scint.set('refractive_index', 1.5)
    scint.set('absorption_length', 100.0)  # absorb quickly
    scint.set('scattering_length', 1e9)
    def pairs(x, y):
        return np.array(list(zip(x, np.broadcast_to(y, len(x)))),
                        dtype=np.float32)

    pdf = np.exp(-0.5 * ((wl - 430.0) / 15.0) ** 2)
    cdf = np.concatenate([[0.0], np.cumsum((pdf[1:] + pdf[:-1]) / 2)])
    cdf /= cdf[-1]
    from chroma_tpu.geometry import standard_times
    tcdf = 1.0 - np.exp(-standard_times / 5.0)  # tau = 5 ns

    scint.comp_reemission_prob = [pairs(wl, 1.0)]
    scint.comp_reemission_wvl_cdf = [pairs(wl, cdf)]
    scint.comp_reemission_time_cdf = [pairs(standard_times, tcdf)]
    scint.comp_absorption_length = [pairs(wl, 100.0)]

    geo = Geometry(vacuum)
    geo.add_solid(Solid(box(5000, 5000, 5000), scint, vacuum))
    geo = create_geometry_from_obj(geo, update_bvh_cache=False)
    sim = Simulation(geo, seed=9)

    np.random.seed(0)
    ev = next(sim.simulate(_beam(20000, wavelength=350.0),
                           keep_photons_end=True, max_steps=2))
    pe = ev.photons_end
    reemitted = (pe.flags & np.uint32(event.BULK_REEMIT)) > 0
    assert reemitted.sum() > 15000
    wvl = pe.wavelengths[reemitted]
    assert abs(wvl.mean() - 430.0) < 3.0
