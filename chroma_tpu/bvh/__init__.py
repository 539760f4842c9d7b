"""chroma_tpu.bvh: bounding volume hierarchy construction and layout."""
from chroma_tpu.bvh.bvh import (BVH, BVHLayerSlice, WorldCoords,  # noqa: F401
                                OutOfRangeError, CHILD_BITS, NCHILD_MASK,
                                uint4, unpack_nodes, pack_nodes, node_areas)
from chroma_tpu.bvh.build import (make_recursive_grid_bvh,  # noqa: F401
                                  make_simple_bvh, create_leaf_nodes,
                                  merge_nodes_detailed, concatenate_layers,
                                  collapse_chains)
from chroma_tpu.bvh.dfs import flatten_to_dfs, validate_dfs  # noqa: F401
