"""Learned-performance machinery: wide-node collapse occupancy, the
cost-model traversal-stage tuner, and the flat-hit gather width."""
import numpy as np


def _shell_boxes(n, seed=1):
    "Spherical shell of PMT-like AABBs (the headline TLAS shape)."
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    c = d * 14000
    return (c - 200).astype(np.float32), (c + 200).astype(np.float32)


def test_wide_collapse_occupancy():
    """Collapsing a binary SAH tree into fanout-F rows must produce
    well-filled nodes: the round-3 area-greedy expansion left most of
    the 29k-instance headline TLAS as 2-child fanout-32 nodes (mean 5.0
    children, 7.0 TLAS visits/ray where a balanced cut needs ~3)."""
    from chroma_tpu.bvh.wide import _binary_sah_build, _emit_wide_rows

    lo, hi = _shell_boxes(8192)
    bn = _binary_sah_build(lo, hi, max_leaf=1)
    F, width = 32, 200

    leaf_ids = []

    def make_leaf(node_id):
        leaf_ids.append(node_id)
        return np.zeros(width, np.float32)

    rows, lri, depth = _emit_wide_rows(bn, F, width, make_leaf,
                                       packed=True, b0=14)
    # every binary leaf emitted exactly once
    assert len(lri) == 8192 and len(set(leaf_ids)) == 8192

    # expected internal visits for random rays ~ sum over wide nodes of
    # P(ray hits the node's box) ~ sum(area)/area(scene). The round-3
    # builder's area-greedy expansion scored ~6.9 on this shape (and the
    # r3 geometry cache's even older tree walked 7.0 TLAS visits/ray at
    # headline scale); the leafcount expansion scores ~5.4 with depth 2.
    # node-count proxy: the broken collapse emitted ~2.6x more internal
    # rows (tiny 2-child nodes) than the balanced cut needs
    internal_rows = len(rows) - len(set(lri.values()))
    assert internal_rows <= 1300, internal_rows
    assert depth <= 3


def test_best_stage_spec_constraints():
    """The cost-model spec picker only emits boundaries whose compaction
    slice holds the margin x still-walking lanes, quantizes slice widths
    the staged traversal accepts, and leaves floor-dominated small
    buckets unstaged."""
    from chroma_tpu.ops.propagate import _best_stage_spec, STAGE_MARGIN

    rng = np.random.default_rng(0)
    v = np.clip(rng.lognormal(np.log(25), 0.4, 20000), 8, 120).astype(int)
    for width, a_frac in ((1 << 20, 1.0), (1 << 19, 0.7), (262144, 0.8)):
        spec = _best_stage_spec(width, a_frac, v)
        w = width
        walked = 0
        for b, div in spec:
            walked += b
            frac = a_frac * float(np.mean(v > walked))
            w //= div
            assert frac * STAGE_MARGIN <= w / width, (spec, width)
            assert w >= 1024 and w % 256 == 0
    # tiny bucket: per-iteration floor dominates, staging can't pay
    assert _best_stage_spec(2048, 0.8, v) == ()


def test_learned_hit_gather_width():
    "Quarter-octave gather widths: bounded head-room, bounded programs."
    from chroma_tpu.ops.daq import _learned_m, MIN_HIT_M

    n = 1 << 20
    for n_det in (100, 5000, 33000, 87000, 400000):
        m = _learned_m(n_det, n)
        assert m >= min(max(int(n_det * 1.07), MIN_HIT_M), n)
        if m > MIN_HIT_M:
            assert m <= int(n_det * 1.07) * 1.15 + 1024, (n_det, m)
        step = 1 << max(int(int(n_det * 1.07) + 1).bit_length() - 3, 10)
        assert m % step == 0 or m in (MIN_HIT_M, n)
    assert _learned_m(2 * n, n) == n
