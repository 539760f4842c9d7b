"""ctypes bindings for the native host geometry kit (csrc/geometry_kit.cpp).

Builds the shared library on first use if a compiler is available;
callers fall back to the numpy implementations when it is not. This is
the framework's native runtime layer for host-side hot spots (vertex
dedupe, Morton coding, key sorting) — the device compute path stays in
JAX/XLA."""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from chroma_tpu.log import logger

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'csrc')
_LIB_PATH = os.path.join(_CSRC, 'libchroma_tpu_native.so')

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    # always run make: it is a no-op when the library is current, rebuilds
    # when geometry_kit.cpp is newer, and ensures the binary was compiled
    # on THIS machine (-march=native output is not portable, so the .so is
    # never committed)
    try:
        subprocess.run(['make', '-C', _CSRC], check=True,
                       capture_output=True)
    except Exception as e:  # no compiler / no make: numpy fallback
        if not os.path.exists(_LIB_PATH):
            logger.info('native geometry kit unavailable (%s)' % e)
            return None
        logger.info('native geometry kit rebuild failed (%s); '
                    'using existing library' % e)
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        logger.info('native geometry kit failed to load (%s)' % e)
        return None

    i64 = ctypes.c_int64
    lib.chroma_dedupe_vertices.restype = i64
    lib.chroma_dedupe_vertices.argtypes = [
        ctypes.c_void_p, i64, ctypes.c_void_p, ctypes.c_void_p]
    lib.chroma_morton_codes.restype = None
    lib.chroma_morton_codes.argtypes = [
        ctypes.c_void_p, i64, ctypes.c_void_p, ctypes.c_float,
        ctypes.c_void_p]
    lib.chroma_argsort_u64.restype = None
    lib.chroma_argsort_u64.argtypes = [ctypes.c_void_p, i64,
                                       ctypes.c_void_p]
    lib.chroma_group_bounds.restype = None
    lib.chroma_group_bounds.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, i64, ctypes.c_void_p, i64,
        ctypes.c_void_p, ctypes.c_void_p]
    if hasattr(lib, 'chroma_collapse_dp'):
        lib.chroma_collapse_dp.restype = None
        lib.chroma_collapse_dp.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, i64, i64,
            ctypes.c_void_p, ctypes.c_void_p]
    _lib = lib
    return _lib


def available():
    return _load() is not None


def dedupe_vertices(vertices):
    """Exact (bit-pattern) row dedupe of (n,3) float32 vertices.
    Returns (unique (m,3), inverse (n,)) or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    v = np.ascontiguousarray(vertices, dtype=np.float32)
    n = len(v)
    inverse = np.empty(n, dtype=np.int64)
    unique = np.empty((n, 3), dtype=np.float32)
    m = lib.chroma_dedupe_vertices(v.ctypes.data, n, inverse.ctypes.data,
                                   unique.ctypes.data)
    return unique[:m].copy(), inverse


def morton_codes(tri_verts, origin, scale):
    "48-bit Morton codes of (n,3,3) triangle vertices, or None."
    lib = _load()
    if lib is None:
        return None
    t = np.ascontiguousarray(tri_verts, dtype=np.float32).reshape(-1, 9)
    origin = np.ascontiguousarray(origin, dtype=np.float32)
    codes = np.empty(len(t), dtype=np.uint64)
    lib.chroma_morton_codes(t.ctypes.data, len(t), origin.ctypes.data,
                            ctypes.c_float(scale), codes.ctypes.data)
    return codes


def argsort_u64(keys):
    "Stable argsort of uint64 keys, or None."
    lib = _load()
    if lib is None:
        return None
    k = np.ascontiguousarray(keys, dtype=np.uint64)
    order = np.empty(len(k), dtype=np.int64)
    lib.chroma_argsort_u64(k.ctypes.data, len(k), order.ctypes.data)
    return order


def group_bounds(child_lo, child_hi, first):
    "Per-group AABB reduction, or None."
    lib = _load()
    if lib is None:
        return None
    lo = np.ascontiguousarray(child_lo, dtype=np.float32)
    hi = np.ascontiguousarray(child_hi, dtype=np.float32)
    f = np.ascontiguousarray(first, dtype=np.int64)
    g_lo = np.empty((len(f), 3), dtype=np.float32)
    g_hi = np.empty((len(f), 3), dtype=np.float32)
    lib.chroma_group_bounds(lo.ctypes.data, hi.ctypes.data, len(lo),
                            f.ctypes.data, len(f), g_lo.ctypes.data,
                            g_hi.ctypes.data)
    return g_lo, g_hi


def collapse_dp(left, right, area, fanout):
    """Optimal BVH2->wide collapse DP tables (see csrc/geometry_kit.cpp
    chroma_collapse_dp). Returns (forcost (n,F+1) f64, jch (n,F+1) u8)
    or None when the native kit is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, 'chroma_collapse_dp'):
        return None
    ln = np.ascontiguousarray(left, dtype=np.int64)
    rn = np.ascontiguousarray(right, dtype=np.int64)
    ar = np.ascontiguousarray(area, dtype=np.float64)
    n = len(ln)
    forcost = np.empty((n, fanout + 1), dtype=np.float64)
    jch = np.empty((n, fanout + 1), dtype=np.uint8)
    lib.chroma_collapse_dp(ln.ctypes.data, rn.ctypes.data, ar.ctypes.data,
                           n, fanout, forcost.ctypes.data,
                           jch.ctypes.data)
    return forcost, jch
