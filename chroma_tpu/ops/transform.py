"""Device-side point/ray transforms (analog of chroma/cuda/transform.cu)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from chroma_tpu.ops.linalg import rotate as _rotate


@jax.jit
def rotate_points(points, phi, axis):
    "Rotate (N,3) points by angle phi about a unit axis through the origin."
    axis = axis / jnp.linalg.norm(axis)
    return _rotate(points, jnp.broadcast_to(phi, points.shape[:1]),
                   axis[None, :])


@jax.jit
def rotate_around_point(points, phi, axis, center):
    "Rotate (N,3) points by phi about an axis through `center`."
    return rotate_points(points - center, phi, axis) + center


@jax.jit
def translate_points(points, delta):
    return points + delta
