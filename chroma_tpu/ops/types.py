"""Device geometry representation: flat arrays, no pointers.

This is the TPU replacement for the reference's pointer-based device structs
(reference: chroma/cuda/geometry_types.h, chroma/gpu/geometry.py). Key
transformations:

  * Material/surface property tables become dense (n, prop, wavelength)
    arrays resampled on the uniform standard wavelength grid, so a property
    lookup is one gather plus a fused multiply-add
    (reference resamples the same way: chroma/gpu/geometry.py:44-49).
  * Per-triangle material/surface indices keep the reference's packed code
    word: (material1 << 24) | (material2 << 16) | (surface << 8), with
    8-bit sign extension for "no surface" == -1
    (reference: chroma/gpu/geometry.py:401-404, cuda/photon.h:360-363).
  * The layered BVH is re-laid into DFS preorder with escape links
    (chroma_tpu.bvh.dfs) so traversal needs no per-lane stack.
  * Variable-length reemission component lists are padded to the maximum
    component count; dichroic/angular tables are stored compactly and
    indexed per surface.

All containers are flax.struct dataclasses, hence pytrees: they pass
through jit/shard_map unchanged and shard naturally.
"""
from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp
from flax import struct

from chroma_tpu.geometry import standard_wavelengths, standard_times
from chroma_tpu.bvh.dfs import flatten_to_dfs
from chroma_tpu.bvh.wide import (build_instanced_bvh,
                                 build_wide_bvh, InstancedBVH, WideBVH)

# property row indices in MaterialTables.props
MAT_REFRACTIVE_INDEX = 0
MAT_ABSORPTION_LENGTH = 1
MAT_SCATTERING_LENGTH = 2

# property row indices in SurfaceTables.props
SURF_DETECT = 0
SURF_ABSORB = 1
SURF_REEMIT = 2
SURF_REFLECT_DIFFUSE = 3
SURF_REFLECT_SPECULAR = 4
SURF_ETA = 5
SURF_K = 6
SURF_REEMISSION_CDF = 7


@struct.dataclass
class MaterialTables:
    # (n_materials, 3, n_wavelength) f32: rindex / absorption / scattering
    props: jnp.ndarray
    # wavelength-major copy (n_wavelength, n_materials, 3): the hot path
    # fetches one row per photon and gets every material's properties in
    # a single gather (one fat row ~= one 16-byte row in gather cost)
    props_wl: jnp.ndarray
    # (n_materials,) i32 number of reemission components
    num_comp: jnp.ndarray
    # (n_materials, max_comp, n_wavelength) f32, padded with +inf
    comp_absorption_length: jnp.ndarray
    # (n_materials, max_comp, n_wavelength) f32
    comp_reemission_prob: jnp.ndarray
    # (n_materials, max_comp, n_wavelength) f32 cumulative
    comp_reemission_wvl_cdf: jnp.ndarray
    # (n_materials, max_comp, n_time) f32 cumulative
    comp_reemission_time_cdf: jnp.ndarray

    wavelength0: float = struct.field(pytree_node=False)
    wavelength_step: float = struct.field(pytree_node=False)
    n_wavelength: int = struct.field(pytree_node=False)
    time0: float = struct.field(pytree_node=False)
    time_step: float = struct.field(pytree_node=False)
    n_time: int = struct.field(pytree_node=False)
    max_comp: int = struct.field(pytree_node=False)
    # static: any material has reemission components (lets the step skip
    # the component-sampling path entirely when false)
    has_reemission: bool = struct.field(pytree_node=False)


@struct.dataclass
class SurfaceTables:
    # static: which surface models actually occur — the step dispatcher
    # skips absent models' code paths entirely
    models_present: tuple = struct.field(pytree_node=False)
    # (n_surfaces, 8, n_wavelength) f32
    props: jnp.ndarray
    # wavelength-major copy (n_wavelength, n_surfaces, 8); see
    # MaterialTables.props_wl
    props_wl: jnp.ndarray
    model: jnp.ndarray         # (n_surfaces,) i32
    transmissive: jnp.ndarray  # (n_surfaces,) i32
    thickness: jnp.ndarray     # (n_surfaces,) f32

    # compact dichroic tables, selected by dichroic_index (-1 = none)
    dichroic_index: jnp.ndarray      # (n_surfaces,) i32
    dichroic_angles: jnp.ndarray     # (n_dichroic, max_angles) f32, pad +inf
    dichroic_nangles: jnp.ndarray    # (n_dichroic,) i32
    dichroic_reflect: jnp.ndarray    # (n_dichroic, max_angles, n_wavelength)
    dichroic_transmit: jnp.ndarray   # (n_dichroic, max_angles, n_wavelength)

    # compact angular tables, selected by angular_index (-1 = none)
    angular_index: jnp.ndarray       # (n_surfaces,) i32
    angular_angles: jnp.ndarray      # (n_angular, max_angles) f32, pad +inf
    angular_nangles: jnp.ndarray     # (n_angular,) i32
    angular_transmit: jnp.ndarray    # (n_angular, max_angles) f32
    angular_reflect_specular: jnp.ndarray
    angular_reflect_diffuse: jnp.ndarray


@struct.dataclass
class WirePlaneArrays:
    """Analytic wire-plane parameters, SoA over planes. The u/v frame is
    orthonormalized on the host so the device math stays in f32
    (reference computes the frame per-photon in FP64:
    chroma/cuda/photon.h:115-127)."""
    origin: jnp.ndarray  # (P,3) f32
    u: jnp.ndarray       # (P,3) f32 unit wire-axis
    v: jnp.ndarray       # (P,3) f32 unit in-plane normal to wires
    w: jnp.ndarray       # (P,3) f32 plane normal (u x v)
    pitch: jnp.ndarray   # (P,) f32
    radius: jnp.ndarray  # (P,) f32
    umin: jnp.ndarray
    umax: jnp.ndarray
    vmin: jnp.ndarray
    vmax: jnp.ndarray
    v0: jnp.ndarray
    surface_index: jnp.ndarray         # (P,) i32
    material_inner_index: jnp.ndarray  # (P,) i32
    material_outer_index: jnp.ndarray  # (P,) i32


@struct.dataclass
class DetectorArrays:
    """DAQ channel map + shared time/charge CDFs
    (reference: chroma/cuda/detector.h, chroma/gpu/detector.py)."""
    solid_id_to_channel_index: jnp.ndarray  # (n_solids,) i32
    time_cdf_x: jnp.ndarray    # (nt,) f32
    time_cdf_y: jnp.ndarray    # (nt,) f32
    charge_cdf_x: jnp.ndarray  # (nq,) f32
    charge_cdf_y: jnp.ndarray  # (nq,) f32
    charge_unit: jnp.ndarray   # () f32  (quantization step = qmax / 2^16)
    nchannels: int = struct.field(pytree_node=False)


@struct.dataclass
class InstanceArrays:
    """Per-instance lean geometry: replaces the O(triangles) world-frame
    arrays (tri_normals / material_codes / solid_id) with per-unique-mesh
    local arrays plus per-instance transforms. At the reference's headline
    scale (29k PMTs, ~170M triangles) this shrinks the device geometry
    from ~7 GB of per-triangle arrays to a few MB, and the hot-path
    gathers hit small tables (measured ~30% faster under ~60 MB).

    A global triangle id resolves as:
      i      = searchsorted(tri_base, tri, 'right') - 1   # owning instance
      local  = tri + soup_off[i]                          # unique-soup row
      code   = codes_u[local]; n_world = rot_n[i] @ normals_u[local]
    and the owning instance IS the reference's per-triangle solid id
    (reference: chroma/geometry.py flatten solid_id).
    """
    tri_base: jnp.ndarray   # (n_inst+1,) i32 first triangle per instance
    soup_off: jnp.ndarray   # (n_inst,) i32: soup index = tri + soup_off
    rot_n: jnp.ndarray      # (n_inst, 9) f32 det(R) * R_local->world
    codes_u: jnp.ndarray    # (U,) u32 packed material codes, unique soup
    normals_u: jnp.ndarray  # (U, 3) f32 unit local-frame normals
    n_instances: int = struct.field(pytree_node=False)


@struct.dataclass
class GeometryArrays:
    """The full device geometry. The per-triangle world-frame arrays
    (vertices..solid_id) are None for lean instanced geometries — every
    hot path then goes through `inst` instead."""
    vertices: jnp.ndarray        # (V,3) f32
    triangles: jnp.ndarray       # (T,3) i32
    # per-triangle geometric normals (winding convention of
    # cross(v1-v0, v2-v1), reference: photon.h:365-367), precomputed so
    # the hot loop resolves a hit with two gathers instead of five
    tri_normals: jnp.ndarray     # (T,3) f32
    material_codes: jnp.ndarray  # (T,) u32
    colors: jnp.ndarray          # (T,) u32
    solid_id: jnp.ndarray        # (T,) i32

    # DFS-ordered BVH: packed AABB + leaf triangle id, and escape links
    nodes: jnp.ndarray           # (M,4) u32
    escape: jnp.ndarray          # (M,) i32
    world_origin: jnp.ndarray    # (3,) f32
    world_scale: jnp.ndarray     # () f32

    # wide implicit BVH — the hot-path acceleration structure
    # (chroma_tpu.bvh.wide): instanced (TLAS/BLAS) when the
    # geometry still carries its placed solids, else monolithic;
    # None falls back to the DFS walk
    wide: InstancedBVH | WideBVH | None

    # lean per-instance arrays (None unless the wide BVH is instanced)
    inst: InstanceArrays | None

    materials: MaterialTables
    surfaces: SurfaceTables
    wireplanes: WirePlaneArrays | None
    detector: DetectorArrays | None

    n_nodes: int = struct.field(pytree_node=False)

    @property
    def has_wireplanes(self):
        return self.wireplanes is not None

    @property
    def has_detector(self):
        return self.detector is not None


def _interp_property(prop, grid):
    "Resample a (wavelength, value) pair table onto a uniform grid."
    assert prop is not None, 'material/surface property must not be None'
    return np.interp(grid, prop[:, 0], prop[:, 1]).astype(np.float32)


def build_material_tables(materials, wavelengths=None, times=None):
    if wavelengths is None:
        wavelengths = standard_wavelengths
    if times is None:
        times = standard_times
    n_wl = len(wavelengths)
    n_t = len(times)
    n_mat = len(materials)
    max_comp = max([len(m.comp_reemission_prob) for m in materials] + [1])

    props = np.zeros((n_mat, 3, n_wl), dtype=np.float32)
    num_comp = np.zeros(n_mat, dtype=np.int32)
    comp_abs = np.full((n_mat, max_comp, n_wl), np.inf, dtype=np.float32)
    comp_prob = np.zeros((n_mat, max_comp, n_wl), dtype=np.float32)
    comp_wvl = np.zeros((n_mat, max_comp, n_wl), dtype=np.float32)
    comp_time = np.zeros((n_mat, max_comp, n_t), dtype=np.float32)

    for i, m in enumerate(materials):
        if m is None:
            raise Exception('one or more triangles is missing a material.')
        props[i, MAT_REFRACTIVE_INDEX] = _interp_property(
            m.refractive_index, wavelengths)
        props[i, MAT_ABSORPTION_LENGTH] = _interp_property(
            m.absorption_length, wavelengths)
        props[i, MAT_SCATTERING_LENGTH] = _interp_property(
            m.scattering_length, wavelengths)
        nc = len(m.comp_reemission_prob)
        num_comp[i] = nc
        for c in range(nc):
            comp_prob[i, c] = _interp_property(m.comp_reemission_prob[c],
                                               wavelengths)
            comp_wvl[i, c] = _interp_property(m.comp_reemission_wvl_cdf[c],
                                              wavelengths)
            comp_time[i, c] = _interp_property(m.comp_reemission_time_cdf[c],
                                               times)
            comp_abs[i, c] = _interp_property(m.comp_absorption_length[c],
                                              wavelengths)

    return MaterialTables(
        props=jnp.asarray(props),
        props_wl=jnp.asarray(np.ascontiguousarray(props.transpose(2, 0, 1))),
        num_comp=jnp.asarray(num_comp),
        comp_absorption_length=jnp.asarray(comp_abs),
        comp_reemission_prob=jnp.asarray(comp_prob),
        comp_reemission_wvl_cdf=jnp.asarray(comp_wvl),
        comp_reemission_time_cdf=jnp.asarray(comp_time),
        wavelength0=float(wavelengths[0]),
        wavelength_step=float(wavelengths[1] - wavelengths[0]),
        n_wavelength=n_wl,
        time0=float(times[0]),
        time_step=float(times[1] - times[0]),
        n_time=n_t,
        max_comp=max_comp,
        has_reemission=bool((num_comp > 0).any()),
    )


def build_surface_tables(surfaces, wavelengths=None):
    if wavelengths is None:
        wavelengths = standard_wavelengths
    n_wl = len(wavelengths)
    real = [s for s in surfaces]
    n_surf = max(len(real), 1)

    props = np.zeros((n_surf, 8, n_wl), dtype=np.float32)
    model = np.zeros(n_surf, dtype=np.int32)
    transmissive = np.zeros(n_surf, dtype=np.int32)
    thickness = np.zeros(n_surf, dtype=np.float32)
    dichroic_index = np.full(n_surf, -1, dtype=np.int32)
    angular_index = np.full(n_surf, -1, dtype=np.int32)

    dichroics = []
    angulars = []

    prop_names = ['detect', 'absorb', 'reemit', 'reflect_diffuse',
                  'reflect_specular', 'eta', 'k', 'reemission_cdf']

    for i, s in enumerate(real):
        if s is None:
            continue  # index -1 is encoded in material_codes, row unused
        for j, name in enumerate(prop_names):
            props[i, j] = _interp_property(getattr(s, name), wavelengths)
        model[i] = s.model
        transmissive[i] = int(bool(getattr(s, 'transmissive', 0)))
        thickness[i] = float(getattr(s, 'thickness', 0.0))
        if s.dichroic_props is not None:
            dichroic_index[i] = len(dichroics)
            dichroics.append(s.dichroic_props)
        if s.angular_props is not None:
            angular_index[i] = len(angulars)
            angulars.append(s.angular_props)

    def pad_dichroic():
        n = max(len(dichroics), 1)
        max_ang = max([len(d.angles) for d in dichroics] + [2])
        angles = np.full((n, max_ang), np.inf, dtype=np.float32)
        nang = np.full(n, 2, dtype=np.int32)
        refl = np.zeros((n, max_ang, n_wl), dtype=np.float32)
        trans = np.zeros((n, max_ang, n_wl), dtype=np.float32)
        for k, d in enumerate(dichroics):
            na = len(d.angles)
            nang[k] = na
            angles[k, :na] = d.angles
            for a in range(na):
                refl[k, a] = _interp_property(
                    np.asarray(d.dichroic_reflect[a]), wavelengths)
                trans[k, a] = _interp_property(
                    np.asarray(d.dichroic_transmit[a]), wavelengths)
        return angles, nang, refl, trans

    def pad_angular():
        n = max(len(angulars), 1)
        max_ang = max([len(a.angles) for a in angulars] + [2])
        angles = np.full((n, max_ang), np.inf, dtype=np.float32)
        nang = np.full(n, 2, dtype=np.int32)
        trans = np.zeros((n, max_ang), dtype=np.float32)
        rspec = np.zeros((n, max_ang), dtype=np.float32)
        rdiff = np.zeros((n, max_ang), dtype=np.float32)
        for k, a in enumerate(angulars):
            na = len(a.angles)
            nang[k] = na
            angles[k, :na] = a.angles
            trans[k, :na] = a.transmit
            rspec[k, :na] = a.reflect_specular
            rdiff[k, :na] = a.reflect_diffuse
        return angles, nang, trans, rspec, rdiff

    d_ang, d_n, d_refl, d_trans = pad_dichroic()
    a_ang, a_n, a_trans, a_rspec, a_rdiff = pad_angular()

    return SurfaceTables(
        models_present=tuple(sorted(set(int(m) for m in model))),
        props=jnp.asarray(props),
        props_wl=jnp.asarray(np.ascontiguousarray(props.transpose(2, 0, 1))),
        model=jnp.asarray(model),
        transmissive=jnp.asarray(transmissive),
        thickness=jnp.asarray(thickness),
        dichroic_index=jnp.asarray(dichroic_index),
        dichroic_angles=jnp.asarray(d_ang),
        dichroic_nangles=jnp.asarray(d_n),
        dichroic_reflect=jnp.asarray(d_refl),
        dichroic_transmit=jnp.asarray(d_trans),
        angular_index=jnp.asarray(angular_index),
        angular_angles=jnp.asarray(a_ang),
        angular_nangles=jnp.asarray(a_n),
        angular_transmit=jnp.asarray(a_trans),
        angular_reflect_specular=jnp.asarray(a_rspec),
        angular_reflect_diffuse=jnp.asarray(a_rdiff),
    )


def pack_material_codes(material1_index, material2_index, surface_index):
    """The reference's packed per-triangle code word
    (reference: chroma/gpu/geometry.py:401-404)."""
    return (((material1_index.astype(np.uint32) & 0xff) << 24)
            | ((material2_index.astype(np.uint32) & 0xff) << 16)
            | ((surface_index.astype(np.uint32) & 0xff) << 8))


def _orthonormal_frame(u, v):
    "Gram-Schmidt (u, v) -> orthonormal (u, v, w=u x v)."
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    u = u / np.linalg.norm(u)
    v = v - np.dot(v, u) * u
    v = v / np.linalg.norm(v)
    w = np.cross(u, v)
    return u, v, w


def build_wireplane_arrays(wireplanes, material_lookup, surface_lookup):
    if not wireplanes:
        return None
    P = len(wireplanes)
    fields = {name: np.zeros(P, dtype=np.float32)
              for name in ('pitch', 'radius', 'umin', 'umax', 'vmin', 'vmax',
                           'v0')}
    origin = np.zeros((P, 3), dtype=np.float32)
    u = np.zeros((P, 3), dtype=np.float32)
    v = np.zeros((P, 3), dtype=np.float32)
    w = np.zeros((P, 3), dtype=np.float32)
    surface_index = np.full(P, -1, dtype=np.int32)
    mat_inner = np.zeros(P, dtype=np.int32)
    mat_outer = np.zeros(P, dtype=np.int32)

    for i, wp in enumerate(wireplanes):
        uu, vv, ww = _orthonormal_frame(wp.u, wp.v)
        origin[i] = wp.origin
        u[i], v[i], w[i] = uu, vv, ww
        for name in fields:
            fields[name][i] = getattr(wp, name)
        if wp.surface is not None:
            surface_index[i] = surface_lookup[id(wp.surface)]
        mat_inner[i] = material_lookup[id(wp.material_inner)]
        mat_outer[i] = material_lookup[id(wp.material_outer)]

    return WirePlaneArrays(
        origin=jnp.asarray(origin), u=jnp.asarray(u), v=jnp.asarray(v),
        w=jnp.asarray(w),
        pitch=jnp.asarray(fields['pitch']),
        radius=jnp.asarray(fields['radius']),
        umin=jnp.asarray(fields['umin']), umax=jnp.asarray(fields['umax']),
        vmin=jnp.asarray(fields['vmin']), vmax=jnp.asarray(fields['vmax']),
        v0=jnp.asarray(fields['v0']),
        surface_index=jnp.asarray(surface_index),
        material_inner_index=jnp.asarray(mat_inner),
        material_outer_index=jnp.asarray(mat_outer),
    )


def build_detector_arrays(detector):
    """Marshal channel map + CDFs. charge_unit quantizes summed charge to
    16 bits like the reference DAQ (reference: chroma/gpu/detector.py:30-39).
    """
    if not hasattr(detector, 'num_channels') or detector.num_channels() == 0:
        return None
    time_cdf_x, time_cdf_y = detector.time_cdf
    charge_cdf_x, charge_cdf_y = detector.charge_cdf
    charge_unit = float(np.max(charge_cdf_x)) / (2 ** 16)
    return DetectorArrays(
        solid_id_to_channel_index=jnp.asarray(
            np.asarray(detector.solid_id_to_channel_index, dtype=np.int32)),
        time_cdf_x=jnp.asarray(np.asarray(time_cdf_x, dtype=np.float32)),
        time_cdf_y=jnp.asarray(np.asarray(time_cdf_y, dtype=np.float32)),
        charge_cdf_x=jnp.asarray(np.asarray(charge_cdf_x, dtype=np.float32)),
        charge_cdf_y=jnp.asarray(np.asarray(charge_cdf_y, dtype=np.float32)),
        charge_unit=jnp.asarray(charge_unit, dtype=jnp.float32),
        nchannels=int(detector.num_channels()),
    )


def build_instance_arrays(meta, material_codes):
    """Build lean per-instance arrays from build_instanced_bvh metadata.

    Instances are grouped into a deduplicated "unique soup" keyed by
    (unique mesh, per-triangle material codes): N placements of the same
    PMT contribute its local normals and codes once. `material_codes` is
    the flat per-triangle packed-code array (only the slices of group
    representatives are read)."""
    mesh_index = meta['mesh_index']
    rot_l2w = meta['rot_l2w']
    tri_base = meta['tri_base']
    unique_meshes = meta['unique_meshes']
    n_inst = len(mesh_index)

    counts = np.asarray(
        [len(unique_meshes[mi].triangles) for mi in mesh_index], np.int64)

    # group instances by (mesh, codes content)
    group_of = np.empty(n_inst, np.int64)
    group_key = {}
    group_rep = []  # representative instance per group
    for i in range(n_inst):
        codes = material_codes[tri_base[i]:tri_base[i] + counts[i]]
        key = (int(mesh_index[i]), codes.tobytes())
        g = group_key.setdefault(key, len(group_rep))
        if g == len(group_rep):
            group_rep.append(i)
        group_of[i] = g

    ubase = np.cumsum([0] + [counts[r] for r in group_rep])
    codes_u = np.empty(ubase[-1], np.uint32)
    normals_u = np.empty((ubase[-1], 3), np.float32)
    for g, r in enumerate(group_rep):
        s = slice(ubase[g], ubase[g + 1])
        codes_u[s] = material_codes[tri_base[r]:tri_base[r] + counts[r]]
        mesh = unique_meshes[mesh_index[r]]
        pts = mesh.vertices[mesh.triangles.astype(np.int64)]
        raw = np.cross(pts[:, 1] - pts[:, 0], pts[:, 2] - pts[:, 1])
        ln = np.linalg.norm(raw, axis=1, keepdims=True)
        normals_u[s] = (raw / np.where(ln > 0, ln, 1.0)).astype(np.float32)

    # normal rotation: det(R) * R_l2w (improper placements flip winding)
    det = np.linalg.det(rot_l2w.astype(np.float64)).astype(np.float32)
    rot_n = (rot_l2w * det[:, None, None]).reshape(n_inst, 9)

    soup_off = (ubase[group_of] - tri_base).astype(np.int32)
    bases = np.concatenate(
        [tri_base, [tri_base[-1] + counts[-1]]]).astype(np.int32)

    return InstanceArrays(
        tri_base=jnp.asarray(bases),
        soup_off=jnp.asarray(soup_off),
        rot_n=jnp.asarray(rot_n.astype(np.float32)),
        codes_u=jnp.asarray(codes_u),
        normals_u=jnp.asarray(normals_u),
        n_instances=n_inst,
    )


def build_geometry_arrays(geometry, wavelengths=None, times=None,
                          use_wide_bvh=True, use_instancing=True,
                          lean=None):
    """Marshal a flattened host Geometry/Detector (with .bvh set) into
    device arrays. This is the analog of GPUGeometry.__init__
    (reference: chroma/gpu/geometry.py:14-526).

    When the geometry still carries its placed solids (anything built in
    this process; cached geometries are stored flattened-only), the
    acceleration structure is the two-level instanced wide BVH: solids
    sharing a mesh object share one BLAS, so PMT arrays store their mesh
    once. Set use_instancing=False (or CHROMA_NO_INSTANCING=1) to force
    the monolithic wide BVH over the flattened soup."""
    if not hasattr(geometry, 'mesh'):
        geometry.flatten()
    if geometry.bvh is None and not use_wide_bvh:
        raise ValueError('geometry has no BVH; use '
                         'chroma_tpu.loader.create_geometry_from_obj')

    materials = list(geometry.unique_materials)
    surfaces = list(geometry.unique_surfaces)
    material_lookup = {id(m): i for i, m in enumerate(materials)}
    surface_lookup = {id(s): i for i, s in enumerate(surfaces)}

    material_codes = pack_material_codes(geometry.material1_index,
                                         geometry.material2_index,
                                         geometry.surface_index)

    # the classic layered BVH (+ its DFS re-layout) is only needed for
    # the escape-pointer fallback traversal and format-compatible caching;
    # at large scales it is skipped and only the wide BVH is built
    if geometry.bvh is not None and (not use_wide_bvh
                                     or len(geometry.mesh.triangles)
                                     < 5_000_000):
        dfs_nodes, escape = flatten_to_dfs(geometry.bvh)
        wc_origin = geometry.bvh.world_coords.world_origin
        wc_scale = geometry.bvh.world_coords.world_scale
    else:
        dfs_nodes = np.zeros((1, 4), dtype=np.uint32)
        escape = np.ones(1, dtype=np.int32)
        wc_origin = geometry.mesh.vertices.min(axis=0)
        wc_scale = np.float32(1.0)
    wide = None
    inst_arrays = None
    if use_wide_bvh:
        solids = getattr(geometry, 'solids', None) or []
        n_solid_tris = sum(len(s.mesh.triangles) for s in solids)
        if (use_instancing and solids
                and not os.environ.get('CHROMA_NO_INSTANCING')
                and n_solid_tris == len(geometry.mesh.triangles)):
            tri_base = np.cumsum(
                [0] + [len(s.mesh.triangles) for s in solids])
            instances = [
                (s.mesh, geometry.solid_rotations[i],
                 geometry.solid_displacements[i], int(tri_base[i]))
                for i, s in enumerate(solids)]
            wide, inst_meta = build_instanced_bvh(
                instances, want_meta=True, material_codes=material_codes)
            inst_arrays = build_instance_arrays(inst_meta, material_codes)
        else:
            # flattened-only geometries (no live solids) still use the
            # tagged instanced table — as ONE identity instance over the
            # whole soup — so the hot path (Pallas visit kernel, baked
            # material codes/normals) is uniform
            wide = build_instanced_bvh(
                [(geometry.mesh, None, None, 0)],
                material_codes=material_codes)

    wireplanes = build_wireplane_arrays(
        getattr(geometry, 'wireplanes', None), material_lookup,
        surface_lookup)

    detector = build_detector_arrays(geometry)

    # lean mode: skip the O(triangles) world-frame device arrays entirely
    # — everything the hot path needs lives in `inst` (default at large
    # scales, where building/uploading multi-GB per-triangle arrays would
    # dominate; CHROMA_LEAN=0/1 forces it)
    if lean is None:
        env = os.environ.get('CHROMA_LEAN')
        if env is not None:
            lean = env != '0'
        else:
            lean = (inst_arrays is not None
                    and len(geometry.mesh.triangles) >= 5_000_000)
    lean = bool(lean) and inst_arrays is not None

    if lean:
        vertices = triangles = tri_normals_j = codes_j = None
        colors = solid_id = None
    else:
        tri_pts = geometry.mesh.vertices[geometry.mesh.triangles]
        raw_normals = np.cross(tri_pts[:, 1] - tri_pts[:, 0],
                               tri_pts[:, 2] - tri_pts[:, 1])
        lengths = np.linalg.norm(raw_normals, axis=1, keepdims=True)
        tri_normals = (raw_normals
                       / np.where(lengths > 0, lengths, 1.0)
                       ).astype(np.float32)
        vertices = jnp.asarray(geometry.mesh.vertices, dtype=jnp.float32)
        triangles = jnp.asarray(geometry.mesh.triangles, dtype=jnp.int32)
        tri_normals_j = jnp.asarray(tri_normals)
        codes_j = jnp.asarray(material_codes)
        colors = jnp.asarray(geometry.colors.astype(np.uint32))
        solid_id = jnp.asarray(geometry.solid_id.astype(np.int32))

    return GeometryArrays(
        vertices=vertices,
        triangles=triangles,
        tri_normals=tri_normals_j,
        material_codes=codes_j,
        colors=colors,
        solid_id=solid_id,
        nodes=jnp.asarray(dfs_nodes),
        escape=jnp.asarray(escape),
        world_origin=jnp.asarray(wc_origin, dtype=jnp.float32),
        world_scale=jnp.asarray(wc_scale, dtype=jnp.float32),
        wide=wide,
        inst=inst_arrays,
        materials=build_material_tables(materials, wavelengths, times),
        surfaces=build_surface_tables(surfaces, wavelengths),
        wireplanes=wireplanes,
        detector=detector,
        n_nodes=len(dfs_nodes),
    )
