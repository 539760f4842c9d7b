"""BVH traversal: stackless escape-pointer walk, lockstep over the batch.

The reference traverses with a per-thread explicit stack
(reference: chroma/cuda/mesh.h:45-126). Here every photon carries a single
node index into a DFS-ordered node array (chroma_tpu.bvh.dfs):

    hit internal node -> descend to idx+1 (first child is adjacent)
    miss, or leaf     -> jump to escape[idx] (skip the subtree)

One loop iteration costs one 16-byte node gather plus VPU mask algebra per
lane; lanes run in lockstep until all reach the end sentinel. Nearest-hit
pruning (skip boxes farther than the best triangle so far) and the
"can't hit the same triangle twice in a row" rule match the reference.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from chroma_tpu.ops.intersect import intersect_box, intersect_triangle

CHILD_BITS = 28
CHILD_MASK = (1 << CHILD_BITS) - 1


def decode_bounds(node_xyz, world_origin, world_scale):
    """Unpack 16-bit fixed-point AABB words (reference:
    chroma/cuda/geometry.h:28-45). node_xyz: (...,3) uint32."""
    lo = (node_xyz & jnp.uint32(0xFFFF)).astype(jnp.float32)
    hi = (node_xyz >> jnp.uint32(16)).astype(jnp.float32)
    return (world_origin + lo * world_scale,
            world_origin + hi * world_scale)


def intersect_mesh(origin, direction, geometry, last_hit_triangle=None,
                   mask=None):
    """Nearest triangle intersection for a batch of rays.

    origin/direction: (N,3) f32 (direction normalized).
    last_hit_triangle: (N,) i32 or None; that triangle is excluded
    (a photon can't hit the triangle it is sitting on).
    mask: (N,) bool or None; lanes outside the mask skip traversal.

    Returns (triangle (N,) i32 — -1 for no hit, distance (N,) f32 — +inf
    for no hit).
    """
    n = origin.shape[0]
    m = geometry.n_nodes
    if last_hit_triangle is None:
        last_hit_triangle = jnp.full(n, -1, dtype=jnp.int32)

    inv_dir = 1.0 / direction
    neg_origin_inv_dir = -origin * inv_dir

    def cond(state):
        cur, _, _ = state
        return jnp.any(cur < m)

    def body(state):
        cur, best_tri, best_d = state
        active = cur < m
        safe = jnp.where(active, cur, 0)

        node = geometry.nodes[safe]  # (N,4) gather
        lower, upper = decode_bounds(node[:, :3], geometry.world_origin,
                                     geometry.world_scale)
        box_hit, box_d = intersect_box(origin, neg_origin_inv_dir,
                                       inv_dir, lower, upper)
        # nearest-hit pruning (reference: mesh.h:16-38)
        hit = box_hit & (box_d <= best_d) & active

        w = node[:, 3]
        nchild = w >> jnp.uint32(CHILD_BITS)
        tri_id = (w & jnp.uint32(CHILD_MASK)).astype(jnp.int32)
        is_leaf = nchild == 0

        leaf_test = hit & is_leaf & (tri_id != last_hit_triangle)
        t_idx = jnp.where(leaf_test, tri_id, 0)
        tri = geometry.triangles[t_idx]          # (N,3)
        v0 = geometry.vertices[tri[:, 0]]
        v1 = geometry.vertices[tri[:, 1]]
        v2 = geometry.vertices[tri[:, 2]]
        tri_hit, t = intersect_triangle(origin, direction, v0, v1, v2)

        closer = leaf_test & tri_hit & (t < best_d)
        best_d = jnp.where(closer, t, best_d)
        best_tri = jnp.where(closer, tri_id, best_tri)

        descend = hit & ~is_leaf
        nxt = jnp.where(descend, cur + 1, geometry.escape[safe])
        cur = jnp.where(active, nxt, m)
        return cur, best_tri, best_d

    # derive init values from the inputs so they inherit any shard_map
    # "varying" axes (a literal jnp.zeros would be replicated and fail
    # the while_loop carry type check under shard_map)
    izero = (origin[:, 0] * 0).astype(jnp.int32)
    start = izero
    if mask is not None:
        start = jnp.where(mask, start, m)
    init = (start, izero - 1, origin[:, 0] * 0 + jnp.inf)
    _, best_tri, best_d = jax.lax.while_loop(cond, body, init)
    return best_tri, best_d


def distance_to_mesh(origin, direction, geometry):
    """Distance from each ray origin to the mesh, +inf for no hit
    (device analog of the distance_to_mesh kernel,
    reference: chroma/cuda/mesh.h:131-159)."""
    direction = direction / jnp.linalg.norm(direction, axis=-1,
                                            keepdims=True)
    if getattr(geometry, 'wide', None) is not None:
        from chroma_tpu.ops.mesh_wide import intersect_mesh_wide
        tri, dist = intersect_mesh_wide(origin, direction, geometry.wide)
    else:
        tri, dist = intersect_mesh(origin, direction, geometry)
    return jnp.where(tri >= 0, dist, jnp.inf)
