"""Geometry/event viewer (reference: chroma/camera.py).

Two modes:
  * headless snapshots — render(geometry) to a numpy image / PNG, usable
    anywhere (tests, notebooks, servers);
  * interactive pygame viewer — orbit/zoom/pan with the same bindings as
    the reference (mouse drag rotates, wheel zooms), run inline or as a
    separate process like the reference Camera.

Both paths share the device ray tracer (chroma_tpu.ops.render), which is
the same wide-BVH traversal the simulation uses.
"""
from __future__ import annotations

import multiprocessing
import os

import numpy as np

from chroma_tpu.tools import from_film
from chroma_tpu.color import map_to_color


class Rays(object):
    """A bundle of device rays with rigid-motion updates
    (replaces GPURays, reference: chroma/gpu/render.py)."""

    def __init__(self, pos, dir):
        import jax.numpy as jnp
        self.pos = jnp.asarray(pos, dtype=jnp.float32)
        self.dir = jnp.asarray(dir, dtype=jnp.float32)

    def rotate(self, phi, n):
        from chroma_tpu.ops.transform import rotate_points
        import jax.numpy as jnp
        n = jnp.asarray(n, dtype=jnp.float32)
        self.pos = rotate_points(self.pos, phi, n)
        self.dir = rotate_points(self.dir, phi, n)

    def rotate_around_point(self, phi, n, point):
        from chroma_tpu.ops.transform import (rotate_around_point,
                                              rotate_points)
        import jax.numpy as jnp
        n = jnp.asarray(n, dtype=jnp.float32)
        point = jnp.asarray(point, dtype=jnp.float32)
        self.pos = rotate_around_point(self.pos, phi, n, point)
        self.dir = rotate_points(self.dir, phi, n)

    def translate(self, v):
        from chroma_tpu.ops.transform import translate_points
        import jax.numpy as jnp
        self.pos = translate_points(self.pos, jnp.asarray(v, jnp.float32))

    def render(self, geometry_arrays, alpha_depth=10, bg_color=0xFFFFFFFF):
        from chroma_tpu.ops.render import render
        return render(self.pos, self.dir, geometry_arrays,
                      alpha_depth=alpha_depth, bg_color=bg_color)


def _pixels_to_image(pixels, size):
    "ARGB uint32 (N,) -> (height, width, 3) uint8 RGB image."
    pixels = np.asarray(pixels, dtype=np.uint32).reshape(size[0], size[1]).T
    img = np.empty(pixels.shape + (3,), dtype=np.uint8)
    img[..., 0] = (pixels >> 16) & 0xFF
    img[..., 1] = (pixels >> 8) & 0xFF
    img[..., 2] = pixels & 0xFF
    return img


def snapshot(geometry, size=(800, 600), position=None, focal_length=18.0,
             alpha_depth=10, bg_color=0xFFFFFFFF, geometry_arrays=None):
    """Headless render of a flattened geometry. Returns an (h, w, 3) uint8
    RGB image. `position` defaults to outside the bounding sphere looking
    at the center."""
    from chroma_tpu.ops.types import build_geometry_arrays

    if geometry_arrays is None:
        geometry_arrays = build_geometry_arrays(geometry)

    lower, upper = geometry.mesh.get_bounds()
    scale = float(np.linalg.norm(upper - lower))
    center = (upper + lower) / 2.0
    if position is None:
        position = center - np.array([0.0, scale * 1.0, 0.0])

    origins, directions = from_film(position, size=size,
                                    focal_length=focal_length)
    rays = Rays(origins, directions)
    pixels = rays.render(geometry_arrays, alpha_depth, bg_color)
    return _pixels_to_image(pixels, size)


def save_png(filename, image):
    "Write an (h, w, 3) uint8 image to PNG (via matplotlib)."
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    plt.imsave(filename, image)


class Camera(multiprocessing.Process):
    """Interactive viewer in its own process (reference: camera.py:95-719).

    Controls: drag = orbit, shift-drag = pan, wheel = zoom, F11 = fullscreen,
    ESC/Q = quit."""

    def __init__(self, geometry, size=(800, 600), device_id=None,
                 alpha_depth=12):
        super().__init__()
        self.geometry = geometry
        self.size = size
        self.alpha_depth = alpha_depth
        self.done = multiprocessing.Event()

    def run(self):
        os.environ.setdefault('PYGAME_HIDE_SUPPORT_PROMPT', '1')
        import pygame
        from chroma_tpu.ops.types import build_geometry_arrays

        pygame.init()
        screen = pygame.display.set_mode(self.size)
        pygame.display.set_caption('chroma_tpu')
        clock = pygame.time.Clock()

        ga = build_geometry_arrays(self.geometry)
        lower, upper = self.geometry.mesh.get_bounds()
        scale = float(np.linalg.norm(upper - lower))
        center = (upper + lower) / 2.0
        position = center - np.array([0.0, scale, 0.0])

        origins, directions = from_film(position, size=self.size)
        rays = Rays(origins, directions)
        point = np.asarray(position, dtype=np.float64)

        def redraw():
            pixels = np.asarray(rays.render(ga, self.alpha_depth),
                                dtype=np.uint32)
            pygame.surfarray.blit_array(
                screen, pixels.reshape(self.size).astype(np.int64)
                & 0xFFFFFF)
            pygame.display.flip()

        redraw()
        dragging = False
        while not self.done.is_set():
            for ev in pygame.event.get():
                if ev.type == pygame.QUIT:
                    self.done.set()
                elif ev.type == pygame.KEYDOWN and \
                        ev.key in (pygame.K_ESCAPE, pygame.K_q):
                    self.done.set()
                elif ev.type == pygame.MOUSEBUTTONDOWN:
                    if ev.button == 1:
                        dragging = True
                    elif ev.button in (4, 5):
                        step = scale * 0.05 * (1 if ev.button == 4 else -1)
                        v = step * np.asarray(
                            np.mean(np.asarray(rays.dir), axis=0))
                        rays.translate(v)
                        point += v
                        redraw()
                elif ev.type == pygame.MOUSEBUTTONUP and ev.button == 1:
                    dragging = False
                elif ev.type == pygame.MOUSEMOTION and dragging:
                    dx, dy = ev.rel
                    if pygame.key.get_mods() & pygame.KMOD_SHIFT:
                        v = scale * 1e-3 * np.array([-dx, 0, dy])
                        rays.translate(v)
                        point += v
                    else:
                        if dx:
                            rays.rotate_around_point(
                                np.float32(dx * 1e-2),
                                np.array([0, 0, 1], np.float32), center)
                        if dy:
                            axis = np.cross([0, 0, 1],
                                            np.mean(np.asarray(rays.dir),
                                                    axis=0))
                            axis /= np.linalg.norm(axis)
                            rays.rotate_around_point(
                                np.float32(dy * 1e-2),
                                axis.astype(np.float32), center)
                    redraw()
            clock.tick(20)  # reference frame cap: camera.py:701
        pygame.quit()

    def stop(self):
        self.done.set()


def color_solids(geometry, solid_hit, solid_colors):
    """Per-triangle color array with hit solids recolored (host analog of
    the color_solids kernel, reference: chroma/cuda/mesh.h:162-174)."""
    colors = np.array(geometry.colors)
    hit_of_tri = solid_hit[geometry.solid_id]
    colors[hit_of_tri] = solid_colors[geometry.solid_id[hit_of_tri]]
    return colors


class EventViewer(Camera):
    """Event display: steps through events from a reader/list, coloring
    hit PMT solids by charge or time (reference: camera.py:753-1072).
    PAGEUP/PAGEDOWN navigate events; C/T switch charge/time coloring."""

    def __init__(self, geometry, events, size=(800, 600), mode='charge',
                 **kwargs):
        super().__init__(geometry, size=size, **kwargs)
        self.events = list(events)
        self.mode = mode
        self.event_index = 0

    def event_colors(self, ev):
        "Triangle color array for one event's channel readout."
        if ev is None or ev.channels is None:
            return np.asarray(self.geometry.colors)
        return self.color_hit_channels(self.geometry, ev.channels)

    def color_hit_channels(self, geometry, channels):
        "Recolor each hit PMT's triangles by its charge (or time)."
        solid_ids = np.asarray(geometry.channel_index_to_solid_id)
        hit, t, q = channels.hit_channels()
        if len(hit) == 0:
            return np.asarray(geometry.colors)
        values = q if self.mode == 'charge' else t
        rgb = map_to_color(values)
        nsolids = int(geometry.solid_id.max()) + 1
        solid_hit = np.zeros(nsolids, dtype=bool)
        solid_colors = np.zeros(nsolids, dtype=np.uint32)
        solid_hit[solid_ids[hit]] = True
        solid_colors[solid_ids[hit]] = rgb
        return color_solids(geometry, solid_hit, solid_colors)

    def run(self):
        os.environ.setdefault('PYGAME_HIDE_SUPPORT_PROMPT', '1')
        import pygame
        from chroma_tpu.ops.types import build_geometry_arrays
        import jax.numpy as jnp

        pygame.init()
        screen = pygame.display.set_mode(self.size)
        pygame.display.set_caption('chroma_tpu event viewer')
        clock = pygame.time.Clock()

        ga = build_geometry_arrays(self.geometry)
        lower, upper = self.geometry.mesh.get_bounds()
        scale = float(np.linalg.norm(upper - lower))
        center = (upper + lower) / 2.0
        position = center - np.array([0.0, scale, 0.0])
        origins, directions = from_film(position, size=self.size)
        rays = Rays(origins, directions)

        def load_event():
            ev = self.events[self.event_index] if self.events else None
            colors = self.event_colors(ev)
            return ga.replace(colors=jnp.asarray(colors.astype(np.uint32)))

        ga_ev = load_event()

        def redraw():
            pixels = np.asarray(rays.render(ga_ev, self.alpha_depth),
                                dtype=np.uint32)
            pygame.surfarray.blit_array(
                screen,
                pixels.reshape(self.size).astype(np.int64) & 0xFFFFFF)
            pygame.display.flip()

        redraw()
        while not self.done.is_set():
            for ev in pygame.event.get():
                if ev.type == pygame.QUIT:
                    self.done.set()
                elif ev.type == pygame.KEYDOWN:
                    if ev.key in (pygame.K_ESCAPE, pygame.K_q):
                        self.done.set()
                    elif ev.key == pygame.K_PAGEDOWN and self.events:
                        self.event_index = (self.event_index + 1) \
                            % len(self.events)
                        ga_ev = load_event()
                        redraw()
                    elif ev.key == pygame.K_PAGEUP and self.events:
                        self.event_index = (self.event_index - 1) \
                            % len(self.events)
                        ga_ev = load_event()
                        redraw()
                    elif ev.key == pygame.K_c:
                        self.mode = 'charge'
                        ga_ev = load_event()
                        redraw()
                    elif ev.key == pygame.K_t:
                        self.mode = 'time'
                        ga_ev = load_event()
                        redraw()
            clock.tick(20)
        pygame.quit()


def view(obj, size=(800, 600)):
    "Open an interactive viewer on a geometry/solid/mesh (blocks)."
    from chroma_tpu.loader import create_geometry_from_obj
    geometry = create_geometry_from_obj(obj)
    camera = Camera(geometry, size)
    camera.start()
    camera.join()
