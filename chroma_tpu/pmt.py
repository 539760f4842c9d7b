"""PMT solid builders: revolve a measured half-profile into a glass shell
with an inner vacuum and a photocathode surface on the front half
(reference: chroma/pmt.py)."""
from __future__ import annotations

import numpy as np

from chroma_tpu.geometry import Solid
from chroma_tpu.make import rotate_extrude
from chroma_tpu.tools import read_csv, offset


def get_lc_profile(radii, a, b, d, rmin, rmax):
    "Elliptical light-collector profile evaluated at `radii`."
    c = -b * np.sqrt(1 - (rmin - d) ** 2 / a ** 2)
    return -c - b * np.sqrt(1 - (radii - d) ** 2 / a ** 2)


def _half_profile(filename):
    """Load a PMT profile CSV and reduce it to the x<0 half, mirrored to
    x>0, ordered base->face, and pinched closed at both ends."""
    profile = read_csv(filename)
    profile = profile[profile[:, 0] < 0]
    profile[:, 0] = -profile[:, 0]
    profile = profile[np.argsort(profile[:, 1])]
    profile[0, 0] = 0.0
    profile[-1, 0] = 0.0
    return profile


def build_pmt_shell(filename, outer_material, glass, nsteps=16):
    "Just the glass envelope of a PMT (no inner vacuum)."
    profile = _half_profile(filename)
    return Solid(rotate_extrude(profile[:, 0], profile[:, 1], nsteps),
                 glass, outer_material, color=0xeeffffff)


def build_pmt(filename, glass_thickness, outer_material, glass, vacuum,
              photocathode_surface, back_surface, nsteps=16):
    """Full PMT: glass shell of thickness `glass_thickness` around an inner
    vacuum; the inner surface is the photocathode on the front (+y) half and
    `back_surface` elsewhere."""
    profile = _half_profile(filename)
    offset_profile = offset(profile, -glass_thickness)

    outer_envelope_mesh = rotate_extrude(profile[:, 0], profile[:, 1], nsteps)
    inner_envelope_mesh = rotate_extrude(offset_profile[:, 0],
                                         offset_profile[:, 1], nsteps)

    outer_envelope = Solid(outer_envelope_mesh, glass, outer_material)

    photocathode = np.mean(inner_envelope_mesh.assemble(), axis=1)[:, 1] > 0
    inner_envelope = Solid(
        inner_envelope_mesh, vacuum, glass,
        surface=np.where(photocathode, photocathode_surface, back_surface),
        color=np.where(photocathode, 0xff00, 0xff0000))

    pmt = outer_envelope + inner_envelope

    # used downstream to construct a matching light collector
    pmt.profile = profile
    pmt.outer_material = outer_material
    pmt.nsteps = nsteps
    return pmt


def build_light_collector(pmt, a, b, d, rmin, rmax, surface, npoints=10):
    "Elliptical light collector sized to the given PMT."
    if not isinstance(pmt, Solid):
        raise Exception('`pmt` must be an instance of %s' % Solid)

    lc_radii = np.linspace(rmin, rmax, npoints)
    lc_profile = get_lc_profile(lc_radii, a, b, d, rmin, rmax)

    pmt_face_profile = pmt.profile[pmt.profile[:, 1] > -1e-3]
    lc_offset = np.interp(lc_radii[0],
                          list(reversed(pmt_face_profile[:, 0])),
                          list(reversed(pmt_face_profile[:, 1])))

    lc_mesh = rotate_extrude(lc_radii, lc_profile + lc_offset, pmt.nsteps)
    return Solid(lc_mesh, pmt.outer_material, pmt.outer_material,
                 surface=surface)


def build_light_collector_from_file(filename, outer_material, surface,
                                    nsteps=48):
    "Light collector revolved from a measured profile CSV."
    profile = read_csv(filename)
    mesh = rotate_extrude(profile[:, 0], profile[:, 1], nsteps)
    return Solid(mesh, outer_material, outer_material, surface=surface)
