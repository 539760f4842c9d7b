"""Histogramming (reference: chroma/histogram/)."""
from chroma_tpu.histogram.histogram import Histogram  # noqa: F401
from chroma_tpu.histogram.histogramdd import HistogramDD  # noqa: F401
from chroma_tpu.histogram.graph import Graph  # noqa: F401
