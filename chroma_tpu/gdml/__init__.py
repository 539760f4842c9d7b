"""GDML geometry import (reference: chroma/gdml/)."""
from chroma_tpu.gdml.loader import GDMLLoader, Volume  # noqa: F401
