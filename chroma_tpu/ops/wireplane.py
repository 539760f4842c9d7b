"""Analytic wire-plane intersection: periodic array of parallel cylinders.

Device analog of the wire-plane branch of fill_state
(reference: chroma/cuda/photon.h:96-270). The reference does this in FP64;
TPU f64 is emulated and slow, so the math here is reformulated to stay
accurate in f32:

  * the (u, v, n) wire frame is orthonormalized once on the host
    (chroma_tpu.ops.types.build_wireplane_arrays), not per photon;
  * all positions are expressed relative to the plane origin, and the
    candidate wire's center (k * pitch) is subtracted before any squaring,
    so the quadratic's coefficients involve only wire-scale quantities.

The candidate-wire loop runs as a lockstep lax.while_loop over each
photon's own [k_lo, k_hi] window, mirroring the reference's k loop.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from chroma_tpu.ops.linalg import dot

T_MIN = 1e-4        # self-hit epsilon, mm (reference: photon.h:225)
PAD_EPS = 1e-6


@struct.dataclass
class WirePlaneHit:
    hit: jnp.ndarray                # (N,) bool
    distance: jnp.ndarray           # (N,) f32
    normal: jnp.ndarray             # (N,3) f32 faces the incoming photon
    material1: jnp.ndarray          # (N,) i32
    material2: jnp.ndarray          # (N,) i32
    surface: jnp.ndarray            # (N,) i32
    inside_to_outside: jnp.ndarray  # (N,) bool


def _intersect_one_plane(pos, direction, wp, ip, active):
    """Nearest wire hit for plane `ip`. Returns (t (N,), vn (N,), nn (N,))
    with t=+inf when there is no hit; (vn, nn) are the hit point's local
    transverse coordinates relative to the hit wire's axis, which give the
    outward cylinder normal."""
    n = pos.shape[0]
    u_ax = wp.u[ip]
    v_ax = wp.v[ip]
    n_ax = wp.w[ip]
    pitch = wp.pitch[ip]
    radius = wp.radius[ip]
    umin, umax = wp.umin[ip], wp.umax[ip]
    vmin, vmax = wp.vmin[ip], wp.vmax[ip]
    v0 = wp.v0[ip]

    w = pos - wp.origin[ip]
    du = dot(direction, u_ax)
    dv = dot(direction, v_ax)
    dn = dot(direction, n_ax)
    wu = dot(w, u_ax)
    wv0 = dot(w, v_ax) - v0
    wn0 = dot(w, n_ax)

    pad = 0.5 * (2.0 * radius) + PAD_EPS

    # --- u-extent slab (reference: photon.h:137-148) ---
    parallel_u = jnp.abs(du) < 1e-12
    inv_du = 1.0 / jnp.where(parallel_u, 1.0, du)
    tu1 = (umin - wu) * inv_du
    tu2 = (umax - wu) * inv_du
    t_in = jnp.where(parallel_u, -jnp.inf, jnp.minimum(tu1, tu2))
    t_out = jnp.where(parallel_u, jnp.inf, jnp.maximum(tu1, tu2))
    valid = jnp.where(parallel_u, (wu >= umin) & (wu <= umax),
                      t_in <= t_out) & active

    # --- candidate window in t and wire index k (photon.h:157-213) ---
    kmin = jnp.ceil((vmin - v0) / pitch)
    kmax = jnp.floor((vmax - v0) / pitch)

    t_lo = jnp.maximum(t_in, T_MIN)
    t_hi = t_out

    parallel_n = jnp.abs(dn) <= 1e-9
    inv_dn = 1.0 / jnp.where(parallel_n, 1.0, dn)
    tn1 = (-pad - wn0) * inv_dn
    tn2 = (pad - wn0) * inv_dn
    t_lo = jnp.where(parallel_n, t_lo,
                     jnp.maximum(t_lo, jnp.minimum(tn1, tn2)))
    t_hi = jnp.where(parallel_n, t_hi,
                     jnp.minimum(t_hi, jnp.maximum(tn1, tn2)))
    valid &= jnp.where(parallel_n, jnp.abs(wn0) <= pad, True)
    valid &= t_hi >= t_lo

    # grazing in-plane rays only need to look one period ahead
    grazing = parallel_n & (jnp.abs(dv) > 1e-9)
    span = (pitch + 2.0 * radius) / jnp.maximum(jnp.abs(dv), 1e-12)
    t_hi = jnp.where(grazing, jnp.minimum(t_hi, t_lo + span), t_hi)

    v_entry = wv0 + dv * t_lo
    v_exit = wv0 + dv * t_hi
    v_lo = jnp.minimum(jnp.minimum(v_entry, v_exit), wv0) - pad
    v_hi = jnp.maximum(jnp.maximum(v_entry, v_exit), wv0) + pad

    k_lo = jnp.maximum(jnp.floor(v_lo / pitch), kmin)
    k_hi = jnp.minimum(jnp.ceil(v_hi / pitch), kmax)
    valid &= k_lo <= k_hi
    # clamp to a finite iteration count even for degenerate rays
    k_hi = jnp.minimum(k_hi, k_lo + 4096.0)

    a_coef = dv * dv + dn * dn
    r2 = radius * radius
    eps0 = jnp.maximum(1e-12, 1e-6 * r2)

    def body(state):
        k, best_t, best_vn, best_nn = state
        live = valid & (k <= k_hi)
        wv = wv0 - k * pitch
        b_coef = wv * dv + wn0 * dn
        c_coef = wv * wv + wn0 * wn0 - r2
        disc = b_coef * b_coef - a_coef * c_coef
        ok = live & (disc >= 0.0) & (a_coef > 0.0)
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        inv_a = 1.0 / jnp.where(a_coef > 0.0, a_coef, 1.0)
        t_small = (-b_coef - sq) * inv_a
        t_large = (-b_coef + sq) * inv_a

        r2_0 = wv * wv + wn0 * wn0
        outside = r2_0 > r2 + eps0
        inside = r2_0 < r2 - eps0
        t = jnp.where(outside, t_small,
                      jnp.where(inside, t_large, T_MIN))
        ok &= jnp.where(outside, t_small > T_MIN,
                        jnp.where(inside, t_large > T_MIN, True))

        uc = wu + du * t
        ok &= (uc >= umin) & (uc <= umax)
        ok &= (t >= t_in) & (t <= t_out)
        ok &= t < best_t

        best_t = jnp.where(ok, t, best_t)
        best_vn = jnp.where(ok, wv + dv * t, best_vn)
        best_nn = jnp.where(ok, wn0 + dn * t, best_nn)
        return k + 1.0, best_t, best_vn, best_nn

    def cond(state):
        k = state[0]
        return jnp.any(valid & (k <= k_hi))

    k_init = jnp.where(valid, k_lo, k_hi + 1.0)
    init = (k_init, jnp.full(n, jnp.inf, dtype=jnp.float32),
            jnp.zeros(n, dtype=jnp.float32), jnp.zeros(n, dtype=jnp.float32))
    _, best_t, best_vn, best_nn = jax.lax.while_loop(cond, body, init)
    return best_t, best_vn, best_nn


def intersect_wireplanes(pos, direction, geometry, active):
    """Nearest analytic wire hit over all planes, with material/surface
    classification (reference: photon.h:272-354)."""
    wp = geometry.wireplanes
    n = pos.shape[0]
    n_planes = wp.pitch.shape[0]

    best_t = jnp.full(n, jnp.inf, dtype=jnp.float32)
    best_plane = jnp.full(n, -1, dtype=jnp.int32)
    best_vn = jnp.zeros(n, dtype=jnp.float32)
    best_nn = jnp.zeros(n, dtype=jnp.float32)

    for ip in range(n_planes):  # static plane count
        t, vn, nn = _intersect_one_plane(pos, direction, wp, ip, active)
        closer = t < best_t
        best_t = jnp.where(closer, t, best_t)
        best_plane = jnp.where(closer, ip, best_plane)
        best_vn = jnp.where(closer, vn, best_vn)
        best_nn = jnp.where(closer, nn, best_nn)

    hit = best_plane >= 0
    plane = jnp.maximum(best_plane, 0)

    # outward cylinder normal in world coordinates
    length = jnp.sqrt(best_vn ** 2 + best_nn ** 2)
    inv_len = 1.0 / jnp.where(length > 0, length, 1.0)
    n_world = (best_vn * inv_len)[:, None] * wp.v[plane] \
        + (best_nn * inv_len)[:, None] * wp.w[plane]

    dot_raw = dot(n_world, -direction)
    outside_now = dot_raw > 0.0

    mat_in = wp.material_inner_index[plane]
    mat_out = wp.material_outer_index[plane]
    material1 = jnp.where(outside_now, mat_out, mat_in)
    material2 = jnp.where(outside_now, mat_in, mat_out)
    normal = jnp.where(outside_now[:, None], n_world, -n_world)
    inside_to_outside = ~outside_now

    return WirePlaneHit(hit=hit, distance=best_t, normal=normal,
                        material1=material1, material2=material2,
                        surface=wp.surface_index[plane],
                        inside_to_outside=inside_to_outside)
