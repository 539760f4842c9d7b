"""Ray-traced geometry rendering on device.

Device analog of chroma/cuda/render.cu: per pixel, collect the
`alpha_depth` nearest surface crossings along the ray and alpha-composite
their cosine-shaded triangle colors front-to-back.

Instead of the reference's in-traversal sorted insertion (searchsorted +
insert into per-thread arrays, render.cu:104-120), the TPU version peels
depth layers: each pass re-traces from just past the previous hit with the
wide-BVH traversal, which keeps the hot loop identical to the simulation's
and needs no per-lane sorted buffers.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from chroma_tpu.ops.mesh_wide import intersect_mesh_wide


def _shade(direction, normal, rgba):
    "Cosine-shaded color + alpha from a packed ARGB color (render.cu:12-33)."
    cos_theta = jnp.abs(jnp.sum(normal * -direction, axis=-1))
    a0 = (rgba >> jnp.uint32(24)) & jnp.uint32(0xFF)
    r0 = ((rgba >> jnp.uint32(16)) & jnp.uint32(0xFF)).astype(jnp.float32)
    g0 = ((rgba >> jnp.uint32(8)) & jnp.uint32(0xFF)).astype(jnp.float32)
    b0 = (rgba & jnp.uint32(0xFF)).astype(jnp.float32)
    alpha = (255.0 - a0.astype(jnp.float32)) / 255.0
    return r0 * cos_theta, g0 * cos_theta, b0 * cos_theta, alpha


@partial(jax.jit, static_argnames=('alpha_depth', 'bg_color'))
def render(origin, direction, geometry, alpha_depth=10,
           bg_color=0xFFFFFFFF):
    """Render rays against the geometry.

    origin/direction: (N,3) f32 (direction need not be normalized).
    Returns (N,) uint32 ARGB pixels.
    """
    n = origin.shape[0]
    direction = direction / jnp.linalg.norm(direction, axis=-1,
                                            keepdims=True)
    bg = jnp.uint32(bg_color)

    fr = jnp.zeros(n, jnp.float32)
    fg = jnp.zeros(n, jnp.float32)
    fb = jnp.zeros(n, jnp.float32)
    scale = jnp.ones(n, jnp.float32)
    hits = jnp.zeros(n, jnp.int32)

    pos = origin
    last_tri = jnp.full(n, -1, jnp.int32)
    active = jnp.ones(n, bool)

    for _ in range(alpha_depth):  # static depth peeling
        tri, dist = intersect_mesh_wide(pos, direction, geometry.wide,
                                        last_hit_triangle=last_tri,
                                        mask=active)
        hit = tri >= 0
        safe = jnp.where(hit, tri, 0)
        normal = geometry.tri_normals[safe]
        rgba = geometry.colors[safe]
        r, g, b, alpha = _shade(direction, normal, rgba)

        fr = fr + jnp.where(hit, scale * r * alpha, 0.0)
        fg = fg + jnp.where(hit, scale * g * alpha, 0.0)
        fb = fb + jnp.where(hit, scale * b * alpha, 0.0)
        scale = jnp.where(hit, scale * (1.0 - alpha), scale)
        hits = hits + hit.astype(jnp.int32)

        pos = jnp.where(hit[:, None], pos + dist[:, None] * direction, pos)
        last_tri = jnp.where(hit, tri, last_tri)
        active = active & hit

    # composite the background
    bga = ((bg >> jnp.uint32(24)) & jnp.uint32(0xFF)).astype(jnp.float32) \
        / 255.0
    bgr = ((bg >> jnp.uint32(16)) & jnp.uint32(0xFF)).astype(jnp.float32)
    bgg = ((bg >> jnp.uint32(8)) & jnp.uint32(0xFF)).astype(jnp.float32)
    bgb = (bg & jnp.uint32(0xFF)).astype(jnp.float32)
    fr = fr + scale * bgr * bga
    fg = fg + scale * bgg * bga
    fb = fb + scale * bgb * bga
    scale = scale * (1.0 - bga)

    denom = jnp.maximum(1.0 - scale, 1e-20)
    a_out = jnp.where(hits < alpha_depth,
                      jnp.floor(255.0 * (1.0 - scale)), 255.0)
    red = jnp.floor(fr / denom)
    green = jnp.floor(fg / denom)
    blue = jnp.floor(fb / denom)

    pixel = (a_out.astype(jnp.uint32) << jnp.uint32(24)
             | red.astype(jnp.uint32) << jnp.uint32(16)
             | green.astype(jnp.uint32) << jnp.uint32(8)
             | blue.astype(jnp.uint32))
    return jnp.where(hits > 0, pixel, bg)


@partial(jax.jit, static_argnames=())
def distances(origin, direction, geometry):
    "Per-ray distance to the first surface (inf for misses)."
    direction = direction / jnp.linalg.norm(direction, axis=-1,
                                            keepdims=True)
    tri, dist = intersect_mesh_wide(origin, direction, geometry.wide)
    return jnp.where(tri >= 0, dist, jnp.inf)


# ---------------------------------------------------------------------------
# hybrid rendering: progressive photon mapping
# (device analog of chroma/cuda/hybrid_render.cu)
# ---------------------------------------------------------------------------

def to_diffuse(photons, geometry, key, max_steps=10):
    """Propagate photons until their first diffuse reflection (or
    termination), leaving them parked on the diffuse surface
    (reference: hybrid_render.cu:19-58 to_diffuse)."""
    from chroma_tpu.event import REFLECT_DIFFUSE, TERMINAL_FLAGS
    from chroma_tpu.ops.photon import propagate_step, select

    def parked(ph):
        return ((ph.flags & jnp.uint32(REFLECT_DIFFUSE | TERMINAL_FLAGS))
                != 0)

    def cond(carry):
        i, ph = carry
        return (i < max_steps) & jnp.any(~parked(ph))

    def body(carry):
        i, ph = carry
        stepped = propagate_step(ph, geometry,
                                 jax.random.fold_in(key, i))
        ph = select(parked(ph), ph, stepped)
        return i + 1, ph

    _, photons = jax.lax.while_loop(cond, body, (0, photons))
    return photons


@jax.jit
def update_xyz_lookup(photons, geometry, xyz_lookup):
    """Accumulate photon radiance (CIE-weighted by wavelength) onto the
    triangles where photons came to rest
    (reference: hybrid_render.cu:63-131 update_xyz_lookup, with the
    scatter-add replacing the atomic float adds)."""
    from chroma_tpu.event import REFLECT_DIFFUSE

    landed = (((photons.flags & jnp.uint32(REFLECT_DIFFUSE)) != 0)
              & (photons.last_hit_triangle >= 0))
    tri = jnp.where(landed, photons.last_hit_triangle, 0)

    # coarse CIE-like response from the wavelength (device-side analytic
    # approximation of chroma_tpu.color.map_wavelength)
    wl = photons.wavelength
    r = jnp.exp(-0.5 * ((wl - 600.0) / 50.0) ** 2)
    g = jnp.exp(-0.5 * ((wl - 550.0) / 40.0) ** 2)
    b = jnp.exp(-0.5 * ((wl - 450.0) / 40.0) ** 2)
    rgb = jnp.stack([r, g, b], axis=1) * photons.weight[:, None]
    rgb = jnp.where(landed[:, None], rgb, 0.0)

    return xyz_lookup.at[tri].add(rgb)


@jax.jit
def update_xyz_image(origin, direction, geometry, xyz_lookup, image):
    """Add the radiance of the first surface each camera ray sees
    (reference: hybrid_render.cu:133-166)."""
    direction = direction / jnp.linalg.norm(direction, axis=-1,
                                            keepdims=True)
    tri, dist = intersect_mesh_wide(origin, direction, geometry.wide)
    hit = tri >= 0
    radiance = xyz_lookup[jnp.where(hit, tri, 0)]
    return image + jnp.where(hit[:, None], radiance, 0.0)


@jax.jit
def process_image(image):
    """Tone-map an accumulated float image to ARGB pixels
    (reference: hybrid_render.cu:168-200)."""
    peak = jnp.maximum(jnp.max(image), 1e-20)
    scaled = jnp.clip(image / peak, 0.0, 1.0)
    rgb = (scaled * 255.0).astype(jnp.uint32)
    return (jnp.uint32(0xFF000000) | (rgb[:, 0] << jnp.uint32(16))
            | (rgb[:, 1] << jnp.uint32(8)) | rgb[:, 2])


def hybrid_render(origin, direction, geometry, key, nphotons=100000,
                  nbatches=4, max_steps=10):
    """Progressive photon-map render: fire isotropic photon batches from
    the camera position, park them on diffuse surfaces, accumulate their
    radiance per triangle, then composite along the camera rays
    (reference: camera.py hybrid render loop + hybrid_render.cu)."""
    from chroma_tpu.ops.photon import PhotonState
    from chroma_tpu.ops.sample import uniform_sphere

    n_tri = geometry.triangles.shape[0]
    xyz = jnp.zeros((n_tri, 3), jnp.float32)

    cam = jnp.asarray(origin[0])
    for b in range(nbatches):
        kb = jax.random.fold_in(key, b)
        dirs = uniform_sphere(jax.random.fold_in(kb, 0), (nphotons,))
        pols = jnp.cross(uniform_sphere(jax.random.fold_in(kb, 1),
                                        (nphotons,)), dirs)
        pols = pols / jnp.linalg.norm(pols, axis=1, keepdims=True)
        wl = jax.random.uniform(jax.random.fold_in(kb, 2), (nphotons,),
                                minval=380.0, maxval=680.0)
        ph = PhotonState(
            pos=jnp.tile(cam[None, :], (nphotons, 1)),
            dir=dirs, pol=pols, wavelength=wl,
            t=jnp.zeros(nphotons), weight=jnp.ones(nphotons),
            flags=jnp.zeros(nphotons, jnp.uint32),
            last_hit_triangle=jnp.full(nphotons, -1, jnp.int32),
            evidx=jnp.zeros(nphotons, jnp.uint32))
        ph = to_diffuse(ph, geometry, kb, max_steps=max_steps)
        xyz = update_xyz_lookup(ph, geometry, xyz)

    image = jnp.zeros((origin.shape[0], 3), jnp.float32)
    image = update_xyz_image(jnp.asarray(origin), jnp.asarray(direction),
                             geometry, xyz, image)
    return process_image(image)
