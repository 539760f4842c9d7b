"""Photon physics state machine, vectorized over the photon batch.

Device analog of chroma/cuda/photon.h. The CUDA code is one divergent
thread per photon; here every phase of a step (geometry query, bulk
transport, surface interaction, Fresnel boundary) is computed branchlessly
for the whole batch and merged with masks. Terminated photons are carried
along as masked-out lanes until the driver compacts the batch
(chroma_tpu.ops.propagate).

Physics preserved from the reference, checked by distribution-level tests:
  * exponential sampling of absorption/scattering vs boundary distance,
    with weighted biasing modes (scatter_first / use_weights)
  * multi-component bulk reemission via wavelength & time CDFs
  * Rayleigh scattering with polarization (SNOMAN angle recipe)
  * polarized Fresnel reflection/refraction at dielectric boundaries
  * five surface models: default roulette, thin-film "complex" PMT,
    wavelength shifter, dichroic filter, angular-table surface
"""
from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp
from flax import struct

from chroma_tpu.event import (NO_HIT, BULK_ABSORB, SURFACE_DETECT,
                              SURFACE_ABSORB, RAYLEIGH_SCATTER,
                              REFLECT_DIFFUSE, REFLECT_SPECULAR,
                              SURFACE_REEMIT, SURFACE_TRANSMIT, BULK_REEMIT,
                              NAN_ABORT, TERMINAL_FLAGS)
from chroma_tpu.geometry import (SURFACE_DEFAULT, SURFACE_COMPLEX,
                                 SURFACE_WLS, SURFACE_DICHROIC,
                                 SURFACE_ANGULAR)
from chroma_tpu.ops.linalg import dot, cross, norm, normalize, rotate
from chroma_tpu.ops.mesh import intersect_mesh
from chroma_tpu.ops.sample import DrawPool, sample_cdf_uniform_rows
from chroma_tpu.ops.types import (MAT_REFRACTIVE_INDEX,
                                  MAT_ABSORPTION_LENGTH,
                                  MAT_SCATTERING_LENGTH, SURF_DETECT,
                                  SURF_ABSORB, SURF_REEMIT,
                                  SURF_REFLECT_DIFFUSE,
                                  SURF_REFLECT_SPECULAR, SURF_ETA, SURF_K,
                                  SURF_REEMISSION_CDF)

SPEED_OF_LIGHT = 299.792458  # mm/ns (reference: physical_constants.h)
PI = math.pi
WEIGHT_LOWER_THRESHOLD = 1e-4  # reference: photon.h:13

# renormalize default-surface probabilities so they sum to one and no
# photon silently PASSes; the reference injects this as an nvcc define
# (reference: photon.h:15-17, 979-994; gpu/tools.py:23-38)
FORCE_SCATTER_AT_PASS = bool(int(
    os.environ.get('CHROMA_FORCE_SCATTER_AT_PASS', '0')))

# interaction-length traversal pruning (see propagate_step); set to 0 for
# exact reference NO_HIT semantics in open geometries
PRUNE_TRAVERSAL = bool(int(os.environ.get('CHROMA_PRUNE_TRAVERSAL', '1')))

# step outcomes (reference: photon.h:70)
BREAK, CONTINUE, PASS = 0, 1, 2



@struct.dataclass
class PhotonState:
    """SoA photon batch on device (analog of the Photon struct,
    reference: photon.h:19-34)."""
    pos: jnp.ndarray         # (N,3) f32 mm
    dir: jnp.ndarray         # (N,3) f32
    pol: jnp.ndarray         # (N,3) f32
    wavelength: jnp.ndarray  # (N,) f32 nm
    t: jnp.ndarray           # (N,) f32 ns
    weight: jnp.ndarray      # (N,) f32
    flags: jnp.ndarray       # (N,) u32 history bits
    last_hit_triangle: jnp.ndarray  # (N,) i32
    evidx: jnp.ndarray       # (N,) u32
    # current-medium index (-1 = unknown), maintained across steps so the
    # next geometry query can be pruned by the sampled interaction length;
    # None disables medium tracking (and with it traversal pruning)
    cur_mat: jnp.ndarray = None  # (N,) i32 or None

    def __len__(self):
        return self.pos.shape[0]

    @property
    def alive(self):
        return (self.flags & jnp.uint32(TERMINAL_FLAGS)) == 0


@struct.dataclass
class StepState:
    """Per-step boundary context (analog of the State struct,
    reference: photon.h:36-51)."""
    hit: jnp.ndarray                # (N,) bool — a boundary was found
    distance: jnp.ndarray           # (N,) f32 distance to boundary
    normal: jnp.ndarray             # (N,3) f32, faces the incoming photon
    rindex1: jnp.ndarray            # (N,) f32
    rindex2: jnp.ndarray            # (N,) f32
    absorption_length: jnp.ndarray  # (N,) f32
    scattering_length: jnp.ndarray  # (N,) f32
    material1: jnp.ndarray          # (N,) i32
    material2: jnp.ndarray          # (N,) i32
    surface: jnp.ndarray            # (N,) i32, -1 = plain boundary
    inside_to_outside: jnp.ndarray  # (N,) bool


def select(mask, a, b):
    "Per-lane pytree select: mask -> a, else b."
    def pick(x, y):
        m = mask.reshape(mask.shape + (1,) * (x.ndim - mask.ndim))
        return jnp.where(m, x, y)
    return jax.tree_util.tree_map(pick, a, b)


def _sext8(x):
    "Sign-extend an 8-bit field to int32 (reference: photon.h:72-79)."
    x = x.astype(jnp.int32) & 0xFF
    return jnp.where(x >= 128, x - 256, x)


def get_theta(a, b):
    return jnp.arccos(jnp.clip(dot(a, b), -1.0, 1.0))


# ---------------------------------------------------------------------------
# property lookups on the uniform wavelength grid
# ---------------------------------------------------------------------------

def _interp_rows(table, row, x, x0, dx):
    """Linear interp of `x` on a uniform grid, one table row per lane
    (reference: geometry.h:61-74). table: (R, n); row, x: (N,)."""
    n = table.shape[1]
    xf = (x - x0) / dx
    jl = jnp.clip(xf.astype(jnp.int32), 0, n - 2)
    frac = jnp.clip(xf - jl.astype(jnp.float32), 0.0, 1.0)
    lo = table[row, jl]
    hi = table[row, jl + 1]
    return lo + frac * (hi - lo)


def material_property(materials, mat_idx, prop, wavelength):
    m = materials
    flat = m.props.reshape(-1, m.n_wavelength)
    return _interp_rows(flat, mat_idx * 3 + prop, wavelength,
                        m.wavelength0, m.wavelength_step)


def wavelength_lerp_rows(table_wl, wavelength, x0, dx):
    """Fetch + lerp one wavelength row per lane from a wavelength-major
    table (n_wl, ...). One fat-row gather returns EVERY material's or
    surface's properties at each photon's wavelength."""
    n_wl = table_wl.shape[0]
    xf = (wavelength - x0) / dx
    jl = jnp.clip(xf.astype(jnp.int32), 0, n_wl - 2)
    frac = jnp.clip(xf - jl.astype(jnp.float32), 0.0, 1.0)
    flat = table_wl.reshape(n_wl, -1)
    lo = flat[jl]
    hi = flat[jl + 1]
    out = lo + frac[:, None] * (hi - lo)
    return out.reshape((len(jl),) + table_wl.shape[1:])


def select_rows(rows, idx):
    """rows[lane, idx[lane]] via a static unroll over the (small) second
    axis — avoids lowering per-lane fancy indexing to a gather."""
    r = rows.shape[1]
    out = jnp.zeros(rows.shape[:1] + rows.shape[2:], dtype=rows.dtype)
    for i in range(r):
        sel = idx == i
        sel = sel.reshape(sel.shape + (1,) * (out.ndim - 1))
        out = jnp.where(sel, rows[:, i], out)
    return out


def select_small(vec, idx):
    "vec[idx[lane]] for a small constant vector, as a select chain."
    out = jnp.zeros(idx.shape, dtype=vec.dtype)
    for i in range(vec.shape[0]):
        out = jnp.where(idx == i, vec[i], out)
    return out


def material_comp_property(materials, table, mat_idx, comp, wavelength):
    m = materials
    flat = table.reshape(-1, table.shape[-1])
    return _interp_rows(flat, mat_idx * m.max_comp + comp, wavelength,
                        m.wavelength0, m.wavelength_step)


def surface_property(surfaces, surf_idx, prop, wavelength, wl0, wl_step):
    flat = surfaces.props.reshape(-1, surfaces.props.shape[-1])
    return _interp_rows(flat, surf_idx * 8 + prop, wavelength, wl0, wl_step)


# ---------------------------------------------------------------------------
# fill_state: geometry query + boundary material resolution
# ---------------------------------------------------------------------------

def fill_state(photons, geometry, active, best_limit=None, pruned=None,
               pre_props=None, mrows=None, trav_stages=None):
    """Find each photon's next boundary and resolve the optical context
    (reference: photon.h:87-397). Lanes not in `active` are skipped in the
    traversal. Returns (photons', StepState); photons' has NO_HIT flags and
    last_hit_triangle updated.

    Traversal pruning (chroma_tpu.ops.propagate_step): `best_limit` bounds
    the query by the lane's pre-sampled interaction distance; `pruned`
    marks lanes whose limit is genuinely binding — a missed query there
    means "no boundary before the bulk interaction", not NO_HIT, and the
    returned distance equals the limit. `pre_props` carries the
    current-medium (rindex, abslen, scatlen) rows those lanes' limits were
    sampled from, which override the mesh-resolved medium so transport is
    consistent with the pruned query. `mrows` is an optional precomputed
    wavelength_lerp_rows(materials.props_wl, ...) to share the gather."""
    hit_ctx = None
    if geometry.wide is not None:
        from chroma_tpu.ops.mesh_wide import intersect_mesh_wide
        # per-query tail compaction (two_phase) wins 1.7x on realistic
        # detectors whose traversal-length tails are heavy; on trivial
        # geometries it costs a few percent of permute overhead
        tri, dist, hit_code, hit_normal, hit_iid = intersect_mesh_wide(
            photons.pos, photons.dir, geometry.wide,
            photons.last_hit_triangle, mask=active,
            best_limit=best_limit, want_context=True,
            stages=trav_stages)
        hit_ctx = (hit_code, hit_normal, hit_iid)
    else:
        tri, dist = intersect_mesh(photons.pos, photons.dir, geometry,
                                   photons.last_hit_triangle, mask=active)
    hit = tri >= 0
    if pruned is None:
        pruned = jnp.zeros_like(hit)

    if geometry.has_wireplanes:
        from chroma_tpu.ops.wireplane import intersect_wireplanes
        wp = intersect_wireplanes(photons.pos, photons.dir, geometry,
                                  active)
        best = jnp.where(hit, dist, jnp.float32(1e30))
        # surface-less wireplanes are ignored, like the reference's
        # analytic_surface >= 0 gate (reference: photon.h:273-277)
        use_analytic = wp.hit & (wp.surface >= 0) \
            & (wp.distance + 1e-6 < best)
    else:
        wp = None
        use_analytic = jnp.zeros_like(hit)

    any_hit = hit | use_analytic

    # mesh boundary context. The wide-BVH traversal already returns the
    # winning hit's packed material code, local-frame geometric normal
    # and owning instance (baked into the leaf/instance rows,
    # chroma_tpu.bvh.wide), so resolving the context costs at most one
    # (n_inst, 9) rotation-row gather — the reference instead refetches
    # three vertices + the code per thread (photon.h:355-367), and the
    # previous design here paid a searchsorted (a ~15-deep binary-search
    # loop, measured ~56 ms/step at 1M lanes) plus three soup gathers.
    safe_tri = jnp.where(hit, tri, 0)
    if hit_ctx is not None:
        code, nvec, hit_iid = hit_ctx
        if geometry.inst is not None:
            R = geometry.inst.rot_n[hit_iid]     # (N,9) det * R_l2w
            nvec = jnp.stack(
                [R[:, 0] * nvec[:, 0] + R[:, 1] * nvec[:, 1]
                 + R[:, 2] * nvec[:, 2],
                 R[:, 3] * nvec[:, 0] + R[:, 4] * nvec[:, 1]
                 + R[:, 5] * nvec[:, 2],
                 R[:, 6] * nvec[:, 0] + R[:, 7] * nvec[:, 1]
                 + R[:, 8] * nvec[:, 2]], axis=1)
        # unnormalized cross(e1, e2); only the direction is ever used,
        # but downstream math (specular reflection, Fresnel) assumes a
        # unit normal
        ln = jnp.sqrt(jnp.sum(nvec * nvec, axis=1, keepdims=True))
        face_normal = nvec / jnp.where(ln > 0, ln, 1.0)
    elif geometry.inst is not None:
        ia = geometry.inst
        iidx = jnp.searchsorted(ia.tri_base, safe_tri,
                                side='right').astype(jnp.int32) - 1
        u_idx = safe_tri + ia.soup_off[iidx]
        code = ia.codes_u[u_idx]
        nloc = ia.normals_u[u_idx]
        R = ia.rot_n[iidx]                       # (N,9) det * R_l2w
        face_normal = jnp.stack(
            [R[:, 0] * nloc[:, 0] + R[:, 1] * nloc[:, 1]
             + R[:, 2] * nloc[:, 2],
             R[:, 3] * nloc[:, 0] + R[:, 4] * nloc[:, 1]
             + R[:, 5] * nloc[:, 2],
             R[:, 6] * nloc[:, 0] + R[:, 7] * nloc[:, 1]
             + R[:, 8] * nloc[:, 2]], axis=1)
    else:
        code = geometry.material_codes[safe_tri]
        face_normal = geometry.tri_normals[safe_tri]
    inner = _sext8(code >> jnp.uint32(24))
    outer = _sext8(code >> jnp.uint32(16))
    surf = _sext8(code >> jnp.uint32(8))

    outside = dot(face_normal, -photons.dir) > 0.0
    normal = jnp.where(outside[:, None], face_normal, -face_normal)
    mat1 = jnp.where(outside, outer, inner)
    mat2 = jnp.where(outside, inner, outer)
    inside_to_outside = ~outside

    if wp is not None:
        # analytic wire hit overrides the mesh hit
        dist = jnp.where(use_analytic, wp.distance, dist)
        normal = jnp.where(use_analytic[:, None], wp.normal, normal)
        mat1 = jnp.where(use_analytic, wp.material1, mat1)
        mat2 = jnp.where(use_analytic, wp.material2, mat2)
        surf = jnp.where(use_analytic, wp.surface, surf)
        inside_to_outside = jnp.where(use_analytic, wp.inside_to_outside,
                                      inside_to_outside)

    mat1 = jnp.where(any_hit, mat1, 0)
    mat2 = jnp.where(any_hit, mat2, 0)

    mats = geometry.materials
    # one fat-row gather yields every material's (rindex, abslen, scatlen)
    # at each photon's wavelength; per-lane material choice is then a
    # dense select
    if mrows is None:
        mrows = wavelength_lerp_rows(mats.props_wl, photons.wavelength,
                                     mats.wavelength0, mats.wavelength_step)
    m1p = select_rows(mrows, mat1)                 # (N,3)
    rindex1 = m1p[:, MAT_REFRACTIVE_INDEX]
    abslen = m1p[:, MAT_ABSORPTION_LENGTH]
    scatlen = m1p[:, MAT_SCATTERING_LENGTH]
    rindex2 = select_rows(mrows[:, :, MAT_REFRACTIVE_INDEX], mat2)

    if pre_props is not None:
        # lanes with a tracked medium keep the properties their interaction
        # distances were sampled from (identical for watertight geometry);
        # pre_props = ((N,) rindex, (N,) abslen, (N,) scatlen)
        known = photons.cur_mat >= 0
        rindex1 = jnp.where(known, pre_props[0], rindex1)
        abslen = jnp.where(known, pre_props[1], abslen)
        scatlen = jnp.where(known, pre_props[2], scatlen)
        mat1 = jnp.where(known, photons.cur_mat, mat1)

    # a pruned miss is NOT an escape: the bulk interaction (at the limit
    # distance the traversal returned) comes first
    no_hit_now = active & ~any_hit & ~pruned
    flags = photons.flags | jnp.where(no_hit_now, jnp.uint32(NO_HIT),
                                      jnp.uint32(0))
    last_hit = jnp.where(active,
                         jnp.where(use_analytic, -2,
                                   jnp.where(hit, tri, -1)),
                         photons.last_hit_triangle)
    photons = photons.replace(flags=flags, last_hit_triangle=last_hit)

    state = StepState(hit=active & (any_hit | pruned), distance=dist,
                      normal=normal, rindex1=rindex1, rindex2=rindex2,
                      absorption_length=abslen, scattering_length=scatlen,
                      material1=mat1, material2=mat2, surface=surf,
                      inside_to_outside=inside_to_outside)
    return photons, state


# ---------------------------------------------------------------------------
# direction sampling helpers
# ---------------------------------------------------------------------------

def pick_new_direction(axis, theta, phi):
    """Direction at polar angle (theta, phi) about `axis`
    (reference: photon.h:399-427, from SNOMAN rayscatter.for)."""
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
    cos_p, sin_p = jnp.cos(phi), jnp.sin(phi)
    ax, ay, az = axis[:, 0], axis[:, 1], axis[:, 2]
    sin_axis_theta = jnp.sqrt(jnp.maximum(1.0 - az * az, 0.0))
    degenerate = sin_axis_theta < 1e-5
    inv = 1.0 / jnp.where(degenerate, 1.0, sin_axis_theta)
    cos_axis_phi = jnp.where(degenerate, 1.0, ax * inv)
    sin_axis_phi = jnp.where(degenerate, 0.0, ay * inv)

    dirx = cos_t * ax + sin_t * (az * cos_p * cos_axis_phi
                                 - sin_p * sin_axis_phi)
    diry = cos_t * ay + sin_t * (cos_p * az * sin_axis_phi
                                 + sin_p * cos_axis_phi)
    dirz = cos_t * az - sin_t * cos_p * sin_axis_theta
    return jnp.stack([dirx, diry, dirz], axis=-1)


def rayleigh_scatter(photons, pool):
    """Rayleigh scattering: (1+cos^2) angular law via the closed-form
    inverse CDF, polarization updated (reference: photon.h:429-453).
    Returns (dir, pol)."""
    u = pool.draw()
    cos_theta = 2.0 * jnp.cos((jnp.arccos(1.0 - 2.0 * u) - 2.0 * PI) / 3.0)
    cos_theta = jnp.clip(cos_theta, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    phi = pool.draw(0.0, 2.0 * PI)

    new_dir = pick_new_direction(photons.pol, theta, phi)

    head_on = (1.0 - jnp.abs(cos_theta)) < 1e-6
    pol_perp = pick_new_direction(photons.pol, jnp.full_like(theta, PI / 2),
                                  phi)
    pol_mix = photons.pol - cos_theta[:, None] * new_dir
    new_pol = jnp.where(head_on[:, None], pol_perp, pol_mix)
    return normalize(new_dir), normalize(new_pol)


def _random_perpendicular_pol(pool, direction):
    "Polarization uniformly distributed perpendicular to `direction`."
    r = pool.uniform_sphere()
    return normalize(cross(r, direction))


def cosine_hemisphere(pool, normal):
    """Cosine-weighted direction about `normal` — the closed-form
    equivalent of the reference's rejection loop
    (reference: photon.h:648-667)."""
    u1 = pool.draw()
    u2 = pool.draw()
    z = jnp.sqrt(u1)
    r = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
    phi = 2.0 * PI * u2

    # branchless orthonormal frame about the normal (Duff et al. 2017)
    nx, ny, nz = normal[:, 0], normal[:, 1], normal[:, 2]
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    t1 = jnp.stack([1.0 + sign * nx * nx * a, sign * b, -sign * nx],
                   axis=-1)
    t2 = jnp.stack([b, sign + ny * ny * a, -ny], axis=-1)

    return (r[:, None] * jnp.cos(phi)[:, None] * t1
            + r[:, None] * jnp.sin(phi)[:, None] * t2
            + z[:, None] * normal)


# ---------------------------------------------------------------------------
# bulk transport
# ---------------------------------------------------------------------------

def propagate_to_boundary(photons, state, pool, use_weights=False,
                          scatter_first=0, materials=None, u_abs=None,
                          u_scat=None):
    """Transport each photon to its absorption/scattering point or the
    boundary (reference: photon.h:455-570).

    scatter_first is a batch-wide traced int (1 = force a scatter before
    the boundary, -1 = forbid it), used by likelihood-mode propagation;
    the reference's rejection resampling becomes closed-form truncated /
    shifted exponential sampling with the identical weight factors.

    Returns (photons', command (N,) in {BREAK, CONTINUE, PASS}).
    """
    n = len(photons)
    d_bound = state.distance

    # the uniforms may be pre-drawn by propagate_step so the traversal can
    # be pruned by the same sampled distances
    if u_abs is None:
        u_abs = pool.draw()
    if u_scat is None:
        u_scat = pool.draw()
    absorption_distance = -state.absorption_length * jnp.log(u_abs)
    scattering_distance = -state.scattering_length * jnp.log(u_scat)

    if use_weights:
        lane_weighted = photons.weight > WEIGHT_LOWER_THRESHOLD
        absorption_distance = jnp.where(lane_weighted, jnp.float32(1e30),
                                        absorption_distance)
    else:
        lane_weighted = jnp.zeros(n, dtype=bool)

    weight = photons.weight
    scatter_first = jnp.asarray(scatter_first, dtype=jnp.int32)
    u_force = pool.draw()

    # force scatter: truncated exponential on [0, boundary]
    scatter_prob = 1.0 - jnp.exp(-d_bound / state.scattering_length)
    force = (scatter_first == 1) & (scatter_prob > WEIGHT_LOWER_THRESHOLD)
    truncated = -state.scattering_length * jnp.log1p(-u_force * scatter_prob)
    scattering_distance = jnp.where(force, truncated, scattering_distance)
    weight = weight * jnp.where(force, scatter_prob, 1.0)

    # prevent scatter: memoryless shift past the boundary
    no_scatter_prob = jnp.exp(-d_bound / state.scattering_length)
    prevent = ((scatter_first == -1)
               & (no_scatter_prob > WEIGHT_LOWER_THRESHOLD))
    shifted = d_bound - state.scattering_length * jnp.log(u_force)
    scattering_distance = jnp.where(prevent, shifted, scattering_distance)
    weight = weight * jnp.where(prevent, no_scatter_prob, 1.0)

    absorb_first = absorption_distance <= scattering_distance
    absorbed = absorb_first & (absorption_distance <= d_bound)
    scattered = ~absorb_first & (scattering_distance <= d_bound)
    passed = ~absorbed & ~scattered

    step_dist = jnp.where(absorbed, absorption_distance,
                          jnp.where(scattered, scattering_distance,
                                    d_bound))
    speed = SPEED_OF_LIGHT / state.rindex1
    new_t = photons.t + step_dist / speed
    new_pos = photons.pos + step_dist[:, None] * photons.dir

    # --- absorbed: plain absorption or component reemission ---
    # (skipped statically when no material has reemission components)
    m = materials
    if m.has_reemission:
        num_comp = m.num_comp[state.material1]
        has_comp = num_comp > 0

        maxc = m.max_comp
        comp_abs = jnp.stack(
            [material_comp_property(m, m.comp_absorption_length,
                                    state.material1, c, photons.wavelength)
             for c in range(maxc)], axis=1)                   # (N, maxc)
        cum = jnp.cumsum(state.absorption_length[:, None] / comp_abs,
                         axis=1)
        u_comp = pool.draw()
        is_last = (jnp.arange(maxc)[None, :] == (num_comp - 1)[:, None])
        comp = jnp.argmax((u_comp[:, None] < cum) | is_last,
                          axis=1).astype(jnp.int32)

        reemit_prob = material_comp_property(m, m.comp_reemission_prob,
                                             state.material1, comp,
                                             photons.wavelength)
        u_reemit = pool.draw()
        reemits = absorbed & has_comp & (u_reemit < reemit_prob)

        comp_row = state.material1 * maxc + comp
        wvl_flat = m.comp_reemission_wvl_cdf.reshape(-1, m.n_wavelength)
        new_wavelength = sample_cdf_uniform_rows(
            pool.draw(), wvl_flat, comp_row,
            m.wavelength0, m.wavelength_step)
        time_flat = m.comp_reemission_time_cdf.reshape(-1, m.n_time)
        reemit_dt = sample_cdf_uniform_rows(
            pool.draw(), time_flat, comp_row, m.time0, m.time_step)
        reemit_dir = pool.uniform_sphere()
        reemit_pol = _random_perpendicular_pol(pool, reemit_dir)
    else:
        reemits = jnp.zeros(n, dtype=bool)
        new_wavelength = photons.wavelength
        reemit_dt = jnp.zeros(n, dtype=jnp.float32)
        reemit_dir = photons.dir
        reemit_pol = photons.pol

    # --- scattered: Rayleigh ---
    ray_dir, ray_pol = rayleigh_scatter(photons, pool)

    # --- merge ---
    bulk_absorbed = absorbed & ~reemits

    if use_weights:
        # weight *= survival probability along the traveled distance
        surv = jnp.exp(-step_dist / state.absorption_length)
        weight = weight * jnp.where(lane_weighted & (scattered | passed),
                                    surv, 1.0)

    new_dir = jnp.where(reemits[:, None], reemit_dir,
                        jnp.where(scattered[:, None], ray_dir, photons.dir))
    new_pol = jnp.where(reemits[:, None], reemit_pol,
                        jnp.where(scattered[:, None], ray_pol, photons.pol))
    wavelength = jnp.where(reemits, new_wavelength, photons.wavelength)
    new_t = new_t + jnp.where(reemits, reemit_dt, 0.0)

    flags = photons.flags
    flags = flags | jnp.where(bulk_absorbed, jnp.uint32(BULK_ABSORB),
                              jnp.uint32(0))
    flags = flags | jnp.where(reemits, jnp.uint32(BULK_REEMIT),
                              jnp.uint32(0))
    flags = flags | jnp.where(scattered, jnp.uint32(RAYLEIGH_SCATTER),
                              jnp.uint32(0))

    # the boundary triangle only remains "last hit" if we reached it
    last_hit = jnp.where(passed, photons.last_hit_triangle, -1)

    command = jnp.where(passed, PASS,
                        jnp.where(bulk_absorbed, BREAK, CONTINUE))

    photons = photons.replace(pos=new_pos, dir=new_dir, pol=new_pol,
                              wavelength=wavelength, t=new_t, weight=weight,
                              flags=flags, last_hit_triangle=last_hit)
    return photons, command


# ---------------------------------------------------------------------------
# boundary / surface interactions
# ---------------------------------------------------------------------------

def _incident_geometry(photons, state):
    """Incidence angle, refraction angle, plane-of-incidence normal and
    s-polarization fraction, shared by the Fresnel and thin-film models
    (reference: photon.h:575-592, 760-773)."""
    incident_angle = get_theta(state.normal, -photons.dir)
    sin_ratio = (jnp.sin(incident_angle) * state.rindex1 / state.rindex2)
    # NaN (total internal reflection) handled by callers via tir mask
    refracted_angle = jnp.arcsin(sin_ratio)
    tir = jnp.abs(sin_ratio) > 1.0

    ipn = cross(photons.dir, state.normal)
    ipn_len = norm(ipn)
    degenerate = ipn_len < 1e-6
    ipn = jnp.where(degenerate[:, None], photons.pol,
                    ipn / jnp.where(degenerate, 1.0, ipn_len)[:, None])

    normal_coefficient = dot(photons.pol, ipn)
    s_fraction = normal_coefficient * normal_coefficient
    return incident_angle, refracted_angle, tir, ipn, s_fraction


def propagate_at_boundary(photons, state, pool):
    """Polarized Fresnel reflect/refract at a plain dielectric boundary
    (reference: photon.h:572-632). Always CONTINUEs."""
    incident_angle, refracted_angle, tir, ipn, s_fraction = \
        _incident_geometry(photons, state)
    n = len(photons)

    s_polarized = pool.draw() < s_fraction

    sum_angle = incident_angle + refracted_angle
    diff_angle = incident_angle - refracted_angle
    refl_s = -jnp.sin(diff_angle) / jnp.sin(sum_angle)
    refl_p = jnp.tan(diff_angle) / jnp.tan(sum_angle)
    refl_coeff = jnp.where(s_polarized, refl_s, refl_p)

    u = pool.draw()
    reflects = (u < refl_coeff * refl_coeff) | tir

    reflect_dir = rotate(state.normal, incident_angle, ipn)
    safe_refr = jnp.where(tir, 0.0, refracted_angle)
    transmit_dir = rotate(state.normal, PI - safe_refr, ipn)
    new_dir = jnp.where(reflects[:, None], reflect_dir, transmit_dir)

    pol_s = ipn
    pol_p = normalize(cross(ipn, new_dir))
    new_pol = jnp.where(s_polarized[:, None], pol_s, pol_p)

    flags = photons.flags | jnp.where(reflects,
                                      jnp.uint32(REFLECT_SPECULAR),
                                      jnp.uint32(0))
    return photons.replace(dir=new_dir, pol=new_pol, flags=flags)


def _specular_reflect(photons, state):
    "Mirror reflection; polarization unchanged (reference: photon.h:634-646)."
    incident_angle = get_theta(state.normal, -photons.dir)
    ipn = normalize(cross(photons.dir, state.normal))
    new_dir = rotate(state.normal, incident_angle, ipn)
    flags = photons.flags | jnp.uint32(REFLECT_SPECULAR)
    return photons.replace(dir=new_dir, flags=flags)


def _diffuse_reflect(photons, state, pool):
    "Lambertian reflection (reference: photon.h:648-667)."
    new_dir = cosine_hemisphere(pool, state.normal)
    new_pol = _random_perpendicular_pol(pool, new_dir)
    flags = photons.flags | jnp.uint32(REFLECT_DIFFUSE)
    return photons.replace(dir=new_dir, pol=new_pol, flags=flags)


def _reflect_either(photons, state, pool, diffuse_mask):
    "Per-lane choice between diffuse and specular reflection."
    spec = _specular_reflect(photons, state)
    diff = _diffuse_reflect(photons, state, pool)
    return select(diffuse_mask, diff, spec)


def propagate_at_default_surface(photons, state, pool, sp,
                                 use_weights=False):
    """Default surface: roulette over detect/absorb/diffuse/specular with
    PASS for any residual (reference: photon.h:967-1035). `sp` is the
    (N,8) per-lane surface property row."""
    n = len(photons)
    detect = sp[:, SURF_DETECT]
    absorb = sp[:, SURF_ABSORB]
    rdiff = sp[:, SURF_REFLECT_DIFFUSE]
    rspec = sp[:, SURF_REFLECT_SPECULAR]

    if FORCE_SCATTER_AT_PASS:
        # numerically enforce sum-to-one; residual goes to specular
        # (reference: photon.h:980-994)
        total = detect + absorb + rdiff + rspec
        inv = 1.0 / jnp.where(total > 0, total, 1.0)
        scale = jnp.where(total > 0, inv, 1.0)
        detect = detect * scale
        absorb = absorb * scale
        rdiff = rdiff * scale
        rspec = rspec * scale
        rspec = rspec + (1.0 - (detect + absorb + rdiff + rspec))

    u = pool.draw()
    weight = photons.weight

    if use_weights:
        lane = ((photons.weight > WEIGHT_LOWER_THRESHOLD)
                & (absorb < 1.0 - WEIGHT_LOWER_THRESHOLD))
        survive = 1.0 - absorb
        weight = jnp.where(lane, weight * survive, weight)
        detect = jnp.where(lane, detect / survive, detect)
        rdiff = jnp.where(lane, rdiff / survive, rdiff)
        rspec = jnp.where(lane, rspec / survive, rspec)
        absorb = jnp.where(lane, 0.0, absorb)

        # reference forces detection whenever weighting is on and the
        # surface can detect at all (photon.h:1010-1014)
        forced_detect = detect > 0.0
    else:
        forced_detect = jnp.zeros(n, dtype=bool)

    absorbs = u < absorb
    detects = ~absorbs & (u < absorb + detect)
    diffuses = ~absorbs & ~detects & (u < absorb + detect + rdiff)
    speculars = (~absorbs & ~detects & ~diffuses
                 & (u < absorb + detect + rdiff + rspec))
    if FORCE_SCATTER_AT_PASS:
        # any rounding residual reflects specularly instead of passing
        speculars = ~absorbs & ~detects & ~diffuses
    passes = ~absorbs & ~detects & ~diffuses & ~speculars

    absorbs = absorbs & ~forced_detect
    detects = (detects | forced_detect) & ~absorbs
    diffuses = diffuses & ~forced_detect
    speculars = speculars & ~forced_detect
    passes = passes & ~forced_detect

    if use_weights:
        weight = jnp.where(forced_detect, weight * detect, weight)

    reflected = _reflect_either(photons, state, pool, diffuses)
    photons = select(diffuses | speculars, reflected, photons)

    flags = photons.flags
    flags = flags | jnp.where(detects, jnp.uint32(SURFACE_DETECT),
                              jnp.uint32(0))
    flags = flags | jnp.where(absorbs, jnp.uint32(SURFACE_ABSORB),
                              jnp.uint32(0))
    photons = photons.replace(flags=flags, weight=weight)

    command = jnp.where(absorbs | detects, BREAK,
                        jnp.where(passes, PASS, CONTINUE))
    return photons, command


def propagate_complex(photons, state, pool, sp, thickness, transmissive,
                      use_weights=False):
    """Thin-film "complex" PMT surface model: multilayer interference with
    a complex-index film, from the RAT PMT optical model
    (reference: photon.h:669-827)."""
    n = len(photons)
    wl = photons.wavelength
    detect = sp[:, SURF_DETECT]
    rdiff = sp[:, SURF_REFLECT_DIFFUSE]
    n2_eta = sp[:, SURF_ETA]
    n2_k = sp[:, SURF_K]

    n1 = state.rindex1.astype(jnp.complex64)
    n2 = n2_eta + 1j * n2_k
    n3 = state.rindex2.astype(jnp.complex64)

    cos_t1 = jnp.abs(dot(photons.dir, state.normal))
    theta = jnp.arccos(jnp.clip(cos_t1, -1.0, 1.0))
    cos1 = jnp.cos(theta).astype(jnp.complex64)
    sin1 = jnp.sin(theta).astype(jnp.complex64)

    e = 2.0 * PI * thickness / wl
    cos3 = jnp.sqrt(1.0 - (n1 / n3) ** 2 * sin1 ** 2)
    cos2 = jnp.sqrt(1.0 - (n1 / n2) ** 2 * sin1 ** 2)
    u_ = jnp.real(n2 * cos2)
    v_ = jnp.imag(n2 * cos2)

    def film(r12, r23, t12, t23, g):
        abs_r12, abs_r23 = jnp.abs(r12), jnp.abs(r23)
        abs_t12, abs_t23 = jnp.abs(t12), jnp.abs(t23)
        arg_r12, arg_r23 = jnp.angle(r12), jnp.angle(r23)
        exp1 = jnp.exp(2.0 * v_ * e)
        exp2 = 1.0 / exp1
        denom = (exp1 + abs_r12 ** 2 * abs_r23 ** 2 * exp2
                 + 2.0 * abs_r12 * abs_r23
                 * jnp.cos(arg_r23 + arg_r12 + 2.0 * u_ * e))
        r = (abs_r12 ** 2 * exp1 + abs_r23 ** 2 * exp2
             + 2.0 * abs_r12 * abs_r23
             * jnp.cos(arg_r23 - arg_r12 + 2.0 * u_ * e)) / denom
        t = jnp.real(g) * abs_t12 ** 2 * abs_t23 ** 2 / denom
        return r, t

    # s polarization
    s_n1c1, s_n2c2, s_n3c3 = n1 * cos1, n2 * cos2, n3 * cos3
    s_r, s_t = film((s_n1c1 - s_n2c2) / (s_n1c1 + s_n2c2),
                    (s_n2c2 - s_n3c3) / (s_n2c2 + s_n3c3),
                    2.0 * s_n1c1 / (s_n1c1 + s_n2c2),
                    2.0 * s_n2c2 / (s_n2c2 + s_n3c3),
                    s_n3c3 / s_n1c1)
    # p polarization
    p_n2c1, p_n3c2 = n2 * cos1, n3 * cos2
    p_n2c3, p_n1c2 = n2 * cos3, n1 * cos2
    p_r, p_t = film((p_n2c1 - p_n1c2) / (p_n2c1 + p_n1c2),
                    (p_n3c2 - p_n2c3) / (p_n3c2 + p_n2c3),
                    2.0 * n1 * cos1 / (p_n2c1 + p_n1c2),
                    2.0 * n2 * cos2 / (p_n3c2 + p_n2c3),
                    (n3 * cos3) / (n1 * cos1))

    incident_angle, refracted_angle, tir, ipn, s_fraction = \
        _incident_geometry(photons, state)

    transmit = s_fraction * s_t + (1.0 - s_fraction) * p_t
    transmit = jnp.where(transmissive, transmit, 0.0)
    reflect = s_fraction * s_r + (1.0 - s_fraction) * p_r
    absorb = 1.0 - transmit - reflect

    weight = photons.weight
    if use_weights:
        lane = ((photons.weight > WEIGHT_LOWER_THRESHOLD)
                & (absorb < 1.0 - WEIGHT_LOWER_THRESHOLD))
        survive = 1.0 - absorb
        weight = jnp.where(lane, weight * survive, weight)
        detect = jnp.where(lane, detect / survive, detect)
        reflect = jnp.where(lane, reflect / survive, reflect)
        transmit = jnp.where(lane, transmit / survive, transmit)
        absorb = jnp.where(lane, 0.0, absorb)
        forced_detect = detect > 0.0  # photon.h:793-797
        weight = jnp.where(forced_detect, weight * detect, weight)
    else:
        forced_detect = jnp.zeros(n, dtype=bool)

    u = pool.draw()
    absorbs = (u < absorb) & ~forced_detect
    u_det = pool.draw()
    detects = (absorbs & (u_det < detect)) | forced_detect
    absorbs = absorbs & ~detects

    reflects = (~absorbs & ~detects
                & ((u < absorb + reflect) | ~transmissive))
    transmits = ~absorbs & ~detects & ~reflects

    u_refl = pool.draw()
    diffuses = reflects & (u_refl < rdiff)

    reflected = _reflect_either(photons, state, pool, diffuses)
    photons = select(reflects, reflected, photons)

    safe_refr = jnp.where(tir, 0.0, refracted_angle)
    transmit_dir = rotate(state.normal, PI - safe_refr, ipn)
    transmit_pol = normalize(cross(ipn, transmit_dir))
    photons = select(transmits,
                     photons.replace(dir=transmit_dir, pol=transmit_pol),
                     photons)

    flags = photons.flags
    flags = flags | jnp.where(detects | forced_detect,
                              jnp.uint32(SURFACE_DETECT), jnp.uint32(0))
    flags = flags | jnp.where(absorbs, jnp.uint32(SURFACE_ABSORB),
                              jnp.uint32(0))
    flags = flags | jnp.where(transmits, jnp.uint32(SURFACE_TRANSMIT),
                              jnp.uint32(0))
    photons = photons.replace(flags=flags, weight=weight)

    command = jnp.where(absorbs | detects, BREAK, CONTINUE)
    return photons, command


def propagate_at_wls(photons, state, pool, sp, surfaces, wl0, wl_step,
                     use_weights=False):
    """Wavelength-shifting surface: absorb & reemit at a shifted
    wavelength, or reflect, or transmit (reference: photon.h:829-874)."""
    n = len(photons)
    s = jnp.maximum(state.surface, 0)
    absorb = sp[:, SURF_ABSORB]
    rspec = sp[:, SURF_REFLECT_SPECULAR]
    rdiff = sp[:, SURF_REFLECT_DIFFUSE]
    reemit = sp[:, SURF_REEMIT]

    weight = photons.weight
    if use_weights:
        lane = ((photons.weight > WEIGHT_LOWER_THRESHOLD)
                & (absorb < 1.0 - WEIGHT_LOWER_THRESHOLD))
        survive = 1.0 - absorb
        weight = jnp.where(lane, weight * survive, weight)
        rdiff = jnp.where(lane, rdiff / survive, rdiff)
        rspec = jnp.where(lane, rspec / survive, rspec)
        absorb = jnp.where(lane, 0.0, absorb)

    u = pool.draw()
    absorbs = u < absorb
    u_reemit = pool.draw()
    reemits = absorbs & (u_reemit < reemit)
    absorbs_dead = absorbs & ~reemits
    reflects = ~absorbs & (u < absorb + rspec + rdiff)
    passes = ~absorbs & ~reflects

    # reemission: new wavelength from the surface CDF, isotropic direction
    cdf_flat = surfaces.props[:, SURF_REEMISSION_CDF, :]
    new_wl = sample_cdf_uniform_rows(pool.draw(), cdf_flat, s, wl0,
                                     wl_step)
    new_dir = pool.uniform_sphere()
    new_pol = _random_perpendicular_pol(pool, new_dir)
    photons = select(reemits,
                     photons.replace(wavelength=new_wl, dir=new_dir,
                                     pol=new_pol),
                     photons)

    # reflection: specular vs diffuse in proportion
    u_refl = pool.draw() * (rspec + rdiff)
    diffuses = reflects & (u_refl >= rspec)
    reflected = _reflect_either(photons, state, pool, diffuses)
    photons = select(reflects, reflected, photons)

    flags = photons.flags
    flags = flags | jnp.where(reemits, jnp.uint32(SURFACE_REEMIT),
                              jnp.uint32(0))
    flags = flags | jnp.where(absorbs_dead, jnp.uint32(SURFACE_ABSORB),
                              jnp.uint32(0))
    flags = flags | jnp.where(passes, jnp.uint32(SURFACE_TRANSMIT),
                              jnp.uint32(0))
    photons = photons.replace(flags=flags, weight=weight)

    command = jnp.where(absorbs_dead, BREAK,
                        jnp.where(passes, PASS, CONTINUE))
    return photons, command


def _interp_angle_rows(angles, nangles, row, x):
    """Fractional index of incidence angle `x` in a per-row angle table
    padded with +inf (reference: interpolate.h interp_idx)."""
    below = jnp.sum((angles[row] <= x[:, None]).astype(jnp.int32), axis=1)
    iidx = jnp.clip(below - 1, 0, nangles[row] - 2)
    a_lo = angles[row, iidx]
    a_hi = angles[row, iidx + 1]
    frac = jnp.clip((x - a_lo) / jnp.where(a_hi > a_lo, a_hi - a_lo, 1.0),
                    0.0, 1.0)
    return iidx, frac


def propagate_at_dichroic(photons, state, pool, geometry):
    """Dichroic filter: angle x wavelength reflect/transmit tables
    (reference: photon.h:877-907)."""
    n = len(photons)
    surfaces = geometry.surfaces
    mats = geometry.materials
    s = state.surface
    didx = jnp.maximum(surfaces.dichroic_index[s], 0)

    incident_angle = get_theta(state.normal, -photons.dir)
    iidx, frac = _interp_angle_rows(surfaces.dichroic_angles,
                                    surfaces.dichroic_nangles, didx,
                                    incident_angle)

    n_ang = surfaces.dichroic_angles.shape[1]
    refl_flat = surfaces.dichroic_reflect.reshape(-1,
                                                  mats.n_wavelength)
    trans_flat = surfaces.dichroic_transmit.reshape(-1, mats.n_wavelength)
    row_lo = didx * n_ang + iidx
    wl = photons.wavelength
    r_lo = _interp_rows(refl_flat, row_lo, wl, mats.wavelength0,
                        mats.wavelength_step)
    r_hi = _interp_rows(refl_flat, row_lo + 1, wl, mats.wavelength0,
                        mats.wavelength_step)
    t_lo = _interp_rows(trans_flat, row_lo, wl, mats.wavelength0,
                        mats.wavelength_step)
    t_hi = _interp_rows(trans_flat, row_lo + 1, wl, mats.wavelength0,
                        mats.wavelength_step)
    reflect_prob = r_lo + (r_hi - r_lo) * frac
    transmit_prob = t_lo + (t_hi - t_lo) * frac

    u = pool.draw()
    reflects = u < reflect_prob
    transmits = ~reflects & (u < reflect_prob + transmit_prob)
    absorbs = ~reflects & ~transmits

    photons = select(reflects, _specular_reflect(photons, state), photons)
    flags = photons.flags
    flags = flags | jnp.where(transmits, jnp.uint32(SURFACE_TRANSMIT),
                              jnp.uint32(0))
    flags = flags | jnp.where(absorbs, jnp.uint32(SURFACE_ABSORB),
                              jnp.uint32(0))
    photons = photons.replace(flags=flags)

    command = jnp.where(absorbs, BREAK,
                        jnp.where(transmits, PASS, CONTINUE))
    return photons, command


def propagate_at_angular(photons, state, pool, surfaces,
                         use_weights=False):
    """Angular-table surface: transmit/reflect probabilities by incidence
    angle (reference: photon.h:909-951)."""
    n = len(photons)
    s = state.surface
    aidx = jnp.maximum(surfaces.angular_index[s], 0)

    incident_angle = get_theta(state.normal, -photons.dir)
    iidx, frac = _interp_angle_rows(surfaces.angular_angles,
                                    surfaces.angular_nangles, aidx,
                                    incident_angle)

    def lerp(table):
        lo = table[aidx, iidx]
        hi = table[aidx, iidx + 1]
        return lo + frac * (hi - lo)

    transmit_prob = lerp(surfaces.angular_transmit)
    rspec_prob = lerp(surfaces.angular_reflect_specular)
    rdiff_prob = lerp(surfaces.angular_reflect_diffuse)
    absorb_prob = 1.0 - transmit_prob - rspec_prob - rdiff_prob

    weight = photons.weight
    if use_weights:
        lane = ((photons.weight > WEIGHT_LOWER_THRESHOLD)
                & (absorb_prob < 1.0 - WEIGHT_LOWER_THRESHOLD))
        survive = 1.0 - absorb_prob
        weight = jnp.where(lane, weight * survive, weight)
        transmit_prob = jnp.where(lane, transmit_prob / survive,
                                  transmit_prob)
        rspec_prob = jnp.where(lane, rspec_prob / survive, rspec_prob)
        rdiff_prob = jnp.where(lane, rdiff_prob / survive, rdiff_prob)
        absorb_prob = jnp.where(lane, 0.0, absorb_prob)

    u = pool.draw()
    absorbs = u < absorb_prob
    transmits = ~absorbs & (u < absorb_prob + transmit_prob)
    speculars = (~absorbs & ~transmits
                 & (u < absorb_prob + transmit_prob + rspec_prob))
    diffuses = ~absorbs & ~transmits & ~speculars

    reflected = _reflect_either(photons, state, pool, diffuses)
    photons = select(speculars | diffuses, reflected, photons)

    flags = photons.flags
    flags = flags | jnp.where(absorbs, jnp.uint32(SURFACE_ABSORB),
                              jnp.uint32(0))
    flags = flags | jnp.where(transmits, jnp.uint32(SURFACE_TRANSMIT),
                              jnp.uint32(0))
    photons = photons.replace(flags=flags, weight=weight)

    command = jnp.where(absorbs, BREAK,
                        jnp.where(transmits, PASS, CONTINUE))
    return photons, command


def propagate_at_surface(photons, state, pool, geometry,
                         use_weights=False):
    """Dispatch over the five surface models (reference: photon.h:953-1037).
    All models are evaluated branchlessly; each lane keeps the result of
    its surface's model."""
    surfaces = geometry.surfaces
    mats = geometry.materials
    wl0, wl_step = mats.wavelength0, mats.wavelength_step
    sidx = jnp.maximum(state.surface, 0)
    model = select_small(surfaces.model, sidx)
    thickness = select_small(surfaces.thickness, sidx)
    transmissive = select_small(surfaces.transmissive, sidx) != 0

    # one fat-row gather: all surfaces' 8 properties at each photon's
    # wavelength, then a dense per-lane surface select
    srows = wavelength_lerp_rows(surfaces.props_wl, photons.wavelength,
                                 wl0, wl_step)
    sp = select_rows(srows, sidx)                   # (N,8)

    # evaluate only the models that exist in this geometry (static)
    present = surfaces.models_present
    out_ph = photons
    out_cmd = jnp.full(len(photons), PASS, dtype=jnp.int32)
    if SURFACE_DEFAULT in present:
        out_ph, out_cmd = propagate_at_default_surface(
            photons, state, pool, sp, use_weights)
    specials = []
    if SURFACE_COMPLEX in present:
        specials.append((SURFACE_COMPLEX, propagate_complex(
            photons, state, pool, sp, thickness, transmissive,
            use_weights)))
    if SURFACE_WLS in present:
        specials.append((SURFACE_WLS, propagate_at_wls(
            photons, state, pool, sp, surfaces, wl0, wl_step,
            use_weights)))
    if SURFACE_DICHROIC in present:
        specials.append((SURFACE_DICHROIC, propagate_at_dichroic(
            photons, state, pool, geometry)))
    if SURFACE_ANGULAR in present:
        specials.append((SURFACE_ANGULAR, propagate_at_angular(
            photons, state, pool, surfaces, use_weights)))
    for model_id, (ph_m, cmd_m) in specials:
        is_m = model == model_id
        out_ph = select(is_m, ph_m, out_ph)
        out_cmd = jnp.where(is_m, cmd_m, out_cmd)
    return out_ph, out_cmd


# ---------------------------------------------------------------------------
# one full step
# ---------------------------------------------------------------------------

def propagate_step(photons, geometry, key, use_weights=False,
                   scatter_first=0, prune=True, trav_stages=None):
    """One propagation step for the whole batch — the vectorized equivalent
    of one iteration of the per-thread loop in the propagate kernel
    (reference: chroma/cuda/propagate.cu:300-338).

    Returns photons'; termination is recorded in the history flags.

    `prune` (static) enables interaction-length traversal pruning: the
    absorption/scattering uniforms are drawn BEFORE the geometry query and,
    for lanes whose current medium is tracked (photons.cur_mat >= 0), the
    sampled interaction distance bounds the BVH traversal — boundaries
    beyond the point where the photon scatters or is absorbed are never
    searched for. Disabled under use_weights/scatter_first biasing, whose
    weight factors need the true boundary distance.
    """
    mats = geometry.materials
    alive = photons.alive

    # NaN guard (reference: propagate.cu:307-310)
    bad = jnp.isnan(jnp.sum(photons.dir, axis=-1)
                    + jnp.sum(photons.pos, axis=-1))
    nan_abort = alive & bad
    flags = photons.flags | jnp.where(nan_abort,
                                      jnp.uint32(NO_HIT | NAN_ABORT),
                                      jnp.uint32(0))
    photons = photons.replace(flags=flags)
    active = alive & ~nan_abort

    pool = DrawPool(key, len(photons))
    u_abs = pool.draw()
    u_scat = pool.draw()

    prune = (prune and not use_weights and photons.cur_mat is not None
             and geometry.wide is not None and PRUNE_TRAVERSAL)
    mrows = wavelength_lerp_rows(mats.props_wl, photons.wavelength,
                                 mats.wavelength0, mats.wavelength_step)
    if prune:
        known = active & (photons.cur_mat >= 0)
        safe_mat = jnp.maximum(photons.cur_mat, 0)
        # column-wise selects: (N,) streams, no (N, 3) padding waste
        pre_props = tuple(
            select_rows(mrows[:, :, p], safe_mat)
            for p in (MAT_REFRACTIVE_INDEX, MAT_ABSORPTION_LENGTH,
                      MAT_SCATTERING_LENGTH))
        pre_abs = -pre_props[1] * jnp.log(u_abs)
        pre_scat = -pre_props[2] * jnp.log(u_scat)
        interaction = jnp.minimum(pre_abs, pre_scat)
        # near-vacuum media never interact in practice; leave those lanes
        # unpruned so a genuine escape still reads as NO_HIT
        pruned = known & (interaction < jnp.float32(1e20))
        limit = jnp.where(pruned, interaction * jnp.float32(1.0 + 1e-4),
                          jnp.inf)
    else:
        pre_props = None
        pruned = None
        limit = None

    # geometry query; photons with no boundary get NO_HIT and terminate
    photons, state = fill_state(photons, geometry, active,
                                best_limit=limit, pruned=pruned,
                                pre_props=pre_props, mrows=mrows,
                                trav_stages=trav_stages)
    active = active & state.hit

    # bulk transport (one pooled RNG stream for the whole step)
    moved, cmd_bulk = propagate_to_boundary(photons, state, pool,
                                            use_weights, scatter_first,
                                            mats, u_abs=u_abs,
                                            u_scat=u_scat)
    photons = select(active, moved, photons)
    at_boundary = active & (cmd_bulk == PASS)

    # surface model where one is attached
    has_surface = state.surface != -1
    surf_lanes = at_boundary & has_surface
    ph_surf, cmd_surf = propagate_at_surface(photons, state, pool,
                                             geometry, use_weights)
    photons = select(surf_lanes, ph_surf, photons)

    # Fresnel at plain boundaries, and after surface PASS
    fresnel_lanes = at_boundary & (~has_surface
                                   | (has_surface & (cmd_surf == PASS)))
    ph_fres = propagate_at_boundary(photons, state, pool)
    photons = select(fresnel_lanes, ph_fres, photons)

    if photons.cur_mat is not None:
        # medium tracking: a photon that ended the step heading through the
        # boundary plane is now in material2; everything else (reflected,
        # scattered, reemitted, still in flight) stays in material1. The
        # normal faces the incoming photon, so "through" = dir . normal < 0.
        crossed = at_boundary & (dot(photons.dir, state.normal) < 0.0)
        mat_now = jnp.where(crossed, state.material2, state.material1)
        cur_mat = jnp.where(active, mat_now, photons.cur_mat)
        photons = photons.replace(cur_mat=cur_mat)

    return photons
