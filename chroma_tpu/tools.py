"""Misc host utilities: timing, CSV/profile readers, ray-film projection,
Morton direction sorting (reference: chroma/tools.py)."""
from __future__ import annotations

import datetime
import math
import sys
import time

import numpy as np

from chroma_tpu.transform import normalize


def count_nonzero(array):
    return int((array != 0).sum())


def filled_array(value, shape, dtype):
    a = np.empty(shape=shape, dtype=dtype)
    a.fill(value)
    return a


def progress(seq):
    "Print progress dots while iterating over `seq`."
    n = len(seq)
    print('[' + ' ' * 21 + ']\r[', end=' ')
    sys.stdout.flush()
    update_interval = max(n // 10, 1)
    for i, item in enumerate(seq):
        if i % update_interval == 0:
            print('.', end=' ')
            sys.stdout.flush()
        yield item
    print(']')
    sys.stdout.flush()


def debugger_hook(type, value, tb):
    if hasattr(sys, 'ps1') or not sys.stderr.isatty():
        sys.__excepthook__(type, value, tb)
    else:
        import traceback
        import pdb
        traceback.print_exception(type, value, tb)
        print()
        pdb.pm()


def enable_debug_on_crash():
    "Drop into PDB when an uncaught exception reaches the top level."
    sys.excepthook = debugger_hook


# no-op unless running under kernprof
try:
    profile_if_possible = profile  # noqa: F821
except NameError:
    def profile_if_possible(x):
        return x


def timeit(func):
    "Decorator printing the wall time of each call."
    def wrapper(*args, **kwargs):
        t0 = time.time()
        retval = func(*args, **kwargs)
        elapsed = time.time() - t0
        print('%s elapsed in %s().'
              % (datetime.timedelta(seconds=elapsed), func.__name__))
        return retval
    return wrapper


def ufloat_to_str(x):
    msd = -int(math.floor(math.log10(x.std_dev())))
    return '%.*f +/- %.*f' % (msd, round(x.nominal_value, msd),
                              msd, round(x.std_dev(), msd))


def read_csv(filename):
    """Array of comma-separated float rows from `filename` (non-numeric
    lines skipped)."""
    points = []
    with open(filename) as f:
        for line in f:
            try:
                points.append([float(s) for s in line.split(',')])
            except ValueError:
                pass
    return np.array(points)


def offset(points, x, tol=1e-9):
    """Offset the open 2-D profile `points` perpendicular to its path by
    distance `x` (positive = path direction rotated 90 deg clockwise).
    Consecutive duplicate points within `tol` are dropped first."""
    points = np.asarray(points)

    keep = np.ones(len(points), dtype=bool)
    keep[1:] = np.linalg.norm(points[1:] - points[:-1], axis=1) > tol
    points = points[keep]

    # extrapolate one point at each end so every original point has two edges
    points = np.vstack([points[0] - (points[1] - points[0]),
                        points,
                        points[-1] - (points[-2] - points[-1])])

    offset_points = []
    for i in range(1, len(points) - 1):
        v1 = np.cross(points[i] - points[i - 1], (0, 0, 1))[:2]
        v1 = v1 / np.linalg.norm(v1) * x
        a = points[i - 1] + v1
        b = points[i] + v1

        v2 = np.cross(points[i + 1] - points[i], (0, 0, 1))[:2]
        v2 = v2 / np.linalg.norm(v2) * x
        c = points[i] + v2
        d = points[i + 1] + v2

        m = np.empty((2, 2))
        m[:, 0] = b - a
        m[:, 1] = c - d
        try:
            j = np.linalg.solve(m, c - a)[0]
        except np.linalg.LinAlgError:
            offset_points.append(b)
            continue
        offset_points.append(a + j * (b - a))

    return np.array(offset_points)


def memoize_method_with_dictionary_arg(func):
    def lookup(*args):
        assert len(args) == 2
        hashable_args = (args[0], tuple(args[1].items()))
        try:
            return func._memoize_dic[hashable_args]
        except AttributeError:
            result = func(*args)
            func._memoize_dic = {hashable_args: result}
            return result
        except KeyError:
            result = func(*args)
            func._memoize_dic[hashable_args] = result
            return result
    return lookup


def interleave3d(arr, bits):
    """Interleave the low `bits` bits of quantized 3-D integer points into
    Morton codes (x highest)."""
    if len(arr.shape) != 2 or arr.shape[1] != 3:
        raise Exception('shape mismatch')
    z = np.zeros(arr.shape[0], dtype=np.uint64)
    arr = arr.astype(np.uint64)
    for i in range(bits):
        z |= ((arr[:, 2] & (1 << i)) << (2 * i)
              | (arr[:, 1] & (1 << i)) << (2 * i + 1)
              | (arr[:, 0] & (1 << i)) << (2 * i + 2))
    return z


def argsort_direction(dir):
    """argsort of direction vectors by Morton order of their spherical
    coordinates; groups coherent rays for better memory locality in the
    traversal kernels."""
    bits = 16
    maxint = 2 ** bits - 1
    theta = (np.arccos(np.clip(dir[:, 2], -1, 1)) / np.pi
             * maxint).astype(np.uint32)
    phi = ((np.arctan2(dir[:, 1], dir[:, 0]) / np.pi / 2.0 + 0.5)
           * maxint).astype(np.uint32)
    morton = np.zeros(len(dir), dtype=np.uint64)
    theta = theta.astype(np.uint64)
    phi = phi.astype(np.uint64)
    for i in range(bits):
        morton |= (theta & (1 << i)) << i | (phi & (1 << i)) << (i + 1)
    return np.argsort(morton)


def from_film(position=(0, 0, 0), axis1=(0, 0, 1), axis2=(1, 0, 0),
              size=(800, 600), width=35.0, focal_length=18.0):
    """Pinhole-camera ray bundle: rays from a film plane through a focal
    point at `position`. Returns (origins (n,3), directions (n,3))."""
    height = width * (size[1] / float(size[0]))
    axis1 = normalize(axis1)
    axis2 = normalize(axis2)
    dx0 = width / size[0]
    dx1 = height / size[1]

    x = np.arange(size[0])
    y = np.arange(size[1])
    yy, xx = np.meshgrid(y, x)
    n = size[0] * size[1]

    grid = (-np.tile(axis2, (n, 1)) * xx.ravel()[:, np.newaxis] * dx0
            + np.tile(axis1, (n, 1)) * yy.ravel()[:, np.newaxis] * dx1)
    grid += axis2 * width / 2 - axis1 * height / 2
    grid -= np.cross(axis1, axis2) * focal_length

    return np.tile(position, (n, 1)), normalize(-grid)
