"""Small-vector helpers over (..., 3) arrays (device analog of
chroma/cuda/linalg.h, rotate.h)."""
from __future__ import annotations

import jax.numpy as jnp


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def norm(a):
    return jnp.sqrt(jnp.sum(a * a, axis=-1))


def normalize(a):
    return a / norm(a)[..., None]


def rotate(x, phi, n):
    """Rotate vectors `x` by angle `phi` counter-clockwise about unit axis
    `n` — Rodrigues' formula (reference: chroma/cuda/rotate.h:20-28).
    All args broadcast over leading axes; phi has shape (...,)."""
    cos_phi = jnp.cos(phi)[..., None]
    sin_phi = jnp.sin(phi)[..., None]
    return (x * cos_phi
            + n * dot(x, n)[..., None] * (1.0 - cos_phi)
            + cross(x, n) * sin_phi)
