"""Matplotlib colormap -> packed RGB ints
(reference: chroma/color/colormap.py)."""
from __future__ import annotations

import numpy as np


def map_to_color(a, range=None, map=None, weights=None):
    "Map scalars to 0xRRGGBB ints through a matplotlib colormap."
    import matplotlib.cm as cm
    if map is None:
        map = cm.jet_r
    a = np.asarray(a, dtype=np.float32)
    if range is None:
        range = (a.min(), a.max())
    span = float(range[1]) - float(range[0])
    ax = (a - float(range[0])) / (span if span else 1.0)

    frgba = map(ax)
    if weights is not None:
        frgba = np.array(frgba)
        frgba[:, 0] *= weights
        frgba[:, 1] *= weights
        frgba[:, 2] *= weights

    rgba = (frgba * 255).astype(np.uint32)
    return rgba[:, 0] << 16 | rgba[:, 1] << 8 | rgba[:, 2]
