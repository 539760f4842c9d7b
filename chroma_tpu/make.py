"""Procedural mesh primitives (reference: chroma/make.py).

All builders return chroma_tpu.geometry.Mesh objects with counter-clockwise
outward-facing winding.
"""
from __future__ import annotations

import numpy as np

from chroma_tpu.geometry import Mesh
from chroma_tpu.transform import rotate


def mesh_grid(grid):
    """Triangulate a (rows, cols) grid of vertex indices into a closed strip
    mesh: each grid cell becomes two triangles. Columns wrap around."""
    begin = grid[:-1].flatten()
    end = grid[1:].flatten()
    begin_roll = np.roll(grid[:-1], -1, 1).flatten()
    end_roll = np.roll(grid[1:], -1, 1).flatten()

    mesh = np.empty(shape=(2 * len(begin), 3), dtype=begin.dtype)
    mesh[:len(begin), 0] = begin
    mesh[:len(begin), 1] = end
    mesh[:len(begin), 2] = end_roll
    mesh[len(begin):, 0] = begin
    mesh[len(begin):, 1] = end_roll
    mesh[len(begin):, 2] = begin_roll
    return mesh


def linear_extrude(x1, y1, height, x2=None, y2=None, center=None,
                   endcaps=True):
    """Extrude the polygon (x1,y1) along z by `height`. If (x2,y2) is given,
    connect (x1,y1) at -height/2 to (x2,y2) at +height/2 (tapered solid).
    With endcaps=False the ends are left open.

    The polygon path should run counter-clockwise, otherwise the mesh is
    inside out.
    """
    x1 = np.asarray(x1, dtype=float)
    y1 = np.asarray(y1, dtype=float)
    if len(x1) != len(y1):
        raise Exception('`x` and `y` arrays must have the same length.')
    x2 = x1 if x2 is None else np.asarray(x2, dtype=float)
    y2 = y1 if y2 is None else np.asarray(y2, dtype=float)
    if len(x2) != len(y2) or len(x2) != len(x1):
        raise Exception('`x` and `y` arrays must have the same length.')

    n = len(x1)
    rings = []
    if endcaps:
        rings.append(np.column_stack([np.zeros(n), np.zeros(n),
                                      np.full(n, -height / 2.0)]))
    rings.append(np.column_stack([x1, y1, np.full(n, -height / 2.0)]))
    rings.append(np.column_stack([x2, y2, np.full(n, height / 2.0)]))
    if endcaps:
        rings.append(np.column_stack([np.zeros(n), np.zeros(n),
                                      np.full(n, height / 2.0)]))

    # interleave rings so that vertex i of each ring is adjacent in memory,
    # then triangulate the transposed index grid
    nrings = len(rings)
    vertices = np.stack(rings, axis=1).reshape(-1, 3)
    if center is not None:
        vertices = vertices + np.asarray(center, dtype=float)

    grid = np.arange(len(vertices)).reshape((n, nrings)).transpose()[::-1]
    triangles = mesh_grid(grid)
    return Mesh(vertices, triangles, remove_duplicate_vertices=True)


def rotate_extrude(x, y, nsteps=64):
    """Revolve the profile (x,y) about the y axis in `nsteps` angular steps.

    The profile path should run counter-clockwise, otherwise the mesh is
    inside out.
    """
    x = np.asarray(x, dtype=float)
    y = np.asarray(y, dtype=float)
    if len(x) != len(y):
        raise Exception('`x` and `y` arrays must have the same length.')

    points = np.column_stack([x, y, np.zeros(len(x))])
    steps = np.linspace(0, 2 * np.pi, nsteps, endpoint=False)
    vertices = np.vstack([rotate(points, angle, (0, -1, 0))
                          for angle in steps])
    grid = np.arange(len(vertices)).reshape(
        (len(steps), len(points))).transpose()[::-1]
    triangles = mesh_grid(grid)
    return Mesh(vertices, triangles, remove_duplicate_vertices=True)


def box(dx, dy, dz, center=(0, 0, 0)):
    "Axis-aligned box with side lengths dx, dy, dz."
    return linear_extrude([-dx / 2.0, dx / 2.0, dx / 2.0, -dx / 2.0],
                          [-dy / 2.0, -dy / 2.0, dy / 2.0, dy / 2.0],
                          height=dz, center=center)


def cube(size, height=None, center=(0, 0, 0)):
    "Cube with side length `size`."
    return box(size, size, size if height is None else height, center=center)


def cylinder_along_z(radius, height, points=100):
    angles = np.linspace(0, 2 * np.pi, points, endpoint=False)
    return linear_extrude(radius * np.cos(angles), radius * np.sin(angles),
                          height)


def cylinder(radius, height, radius2=None, nsteps=64):
    """Cylinder of given radius/height; with `radius2`, a conical frustum
    from bottom radius `radius` to top radius `radius2`."""
    if radius2 is None:
        radius2 = radius
    return rotate_extrude([0, radius, radius2, 0],
                          [-height / 2.0, -height / 2.0,
                           height / 2.0, height / 2.0], nsteps)


def segmented_cylinder(radius, height, nsteps=64, nsegments=100):
    "Cylinder whose profile is subdivided into ~`nsegments` points."
    nseg_r = int((nsegments * radius / (2 * radius + height)) / 2)
    nseg_h = int((nsegments * height / (2 * radius + height)) / 2)
    x = np.concatenate([np.linspace(0, radius, nseg_r, endpoint=False),
                        [radius] * nseg_h,
                        np.linspace(radius, 0, nseg_r, endpoint=False),
                        [0]])
    y = np.concatenate([[-height / 2.0] * nseg_r,
                        np.linspace(-height / 2.0, height / 2.0, nseg_h,
                                    endpoint=False),
                        [height / 2.0] * (nseg_r + 1)])
    return rotate_extrude(x, y, nsteps)


def sphere(radius, nsteps=64):
    "Sphere of given radius."
    profile_angles = np.linspace(-np.pi / 2, np.pi / 2, nsteps)
    return rotate_extrude(radius * np.cos(profile_angles),
                          radius * np.sin(profile_angles), nsteps)


def torus(radius, offset, nsteps=64, circle_steps=None):
    """Torus with barrel radius `radius` whose barrel centerline is at
    distance `offset` from the axis."""
    if circle_steps is None:
        circle_steps = nsteps
    profile_angles = np.linspace(0, 2 * np.pi, circle_steps)
    return rotate_extrude(radius * np.cos(profile_angles) + offset,
                          radius * np.sin(profile_angles), nsteps)


def convex_polygon(x, y):
    """Fan-triangulated polygon in the x-y plane; requires a convex outline
    with points in order."""
    vertices = np.column_stack((x, y, np.zeros_like(x)))
    triangles = np.empty(shape=(len(vertices) - 2, 3), dtype=np.int32)
    triangles[:, 0] = 0
    triangles[:, 1] = np.arange(1, len(vertices) - 1)
    triangles[:, 2] = np.arange(2, len(vertices))
    return Mesh(vertices=vertices, triangles=triangles)
