"""Event I/O (reference: chroma/io/).

The native format here is a portable zip-of-npz event file (no ROOT
dependency); chroma_tpu.io.root provides a PyROOT bridge with the
reference's reader/writer API when ROOT is installed."""
from chroma_tpu.io.npz import EventWriter, EventReader  # noqa: F401
