"""Host-side 3D transforms (reference: chroma/transform.py)."""
from __future__ import annotations

import numpy as np


def norm(x):
    "Euclidean norm along the last axis."
    x = np.asarray(x)
    return np.sqrt((x * x).sum(-1))


def normalize(x):
    "Unit vector(s) in the direction of `x`."
    x = np.atleast_2d(np.asarray(x, dtype=float))
    return (x / norm(x)[:, np.newaxis]).squeeze()


def get_perp(x):
    """An arbitrary vector perpendicular to `x`."""
    a = np.zeros(3)
    a[np.argmin(np.abs(x))] = 1
    return np.cross(a, x)


def make_rotation_matrix(phi, n):
    """Rotation matrix for angle `phi` counter-clockwise about axis `n`
    (looking towards +infinity). Rodrigues' rotation formula."""
    n = normalize(n)
    cross = np.array([[0, n[2], -n[1]],
                      [-n[2], 0, n[0]],
                      [n[1], -n[0], 0]])
    return (np.cos(phi) * np.identity(3)
            + (1 - np.cos(phi)) * np.outer(n, n)
            + np.sin(phi) * cross)


def rotate(x, phi, n):
    """Rotate points `x` by angle(s) `phi` counter-clockwise about axis `n`."""
    n = normalize(n)
    x = np.atleast_2d(x)
    phi = np.atleast_1d(phi)
    c = np.cos(phi)[:, np.newaxis]
    s = np.sin(phi)[:, np.newaxis]
    return (x * c + n * np.dot(x, n)[:, np.newaxis] * (1 - c)
            + np.cross(x, n) * s).squeeze()


def rotate_matrix(x, phi, n):
    """Like rotate() but via an explicit rotation matrix (scalar `phi` only)."""
    return np.inner(np.asarray(x), make_rotation_matrix(phi, n))


def gen_rot(a, b):
    """Rotation matrix taking unit(a) to -unit(b)."""
    a = a / np.linalg.norm(a)
    b = b / np.linalg.norm(b)
    if (a == -b).all():
        return np.identity(3)
    if (a == b).all():
        if a[1] == 0 and a[2] == 0:
            v = np.cross(a, [0, 1, 0])
        else:
            v = np.cross(a, [1, 0, 0])
        c = np.pi
    else:
        v = np.cross(a, b)
        c = np.arccos(-np.dot(a, b))
    return make_rotation_matrix(c, v)
