"""Framework logger (reference: chroma/log.py)."""
import logging

logger = logging.getLogger("chroma_tpu")
logger.addHandler(logging.NullHandler())
