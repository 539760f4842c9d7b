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
