"""TPU backend helpers.

The tunneled single-chip TPU backend used in this environment admits one
client process at a time and takes O(1 min) to release a claim after the
previous process exits, so anything that needs the real chip should
acquire it through wait_for_tpu().
"""
from __future__ import annotations

import time


def wait_for_tpu(timeout=360, poll=15):
    """Block until a JAX backend with devices initializes; returns the
    device list. Raises RuntimeError on timeout."""
    deadline = time.time() + timeout
    last_err = None
    while time.time() < deadline:
        try:
            import jax
            devices = jax.devices()
            if devices:
                return devices
        except RuntimeError as e:
            last_err = e
            # the backend list is cached on failure; clear and retry
            import jax._src.xla_bridge as xb
            try:
                xb.backends_flush()
            except AttributeError:
                xb._backends.clear()
                xb._backend_errors.clear()
        time.sleep(poll)
    raise RuntimeError('no JAX backend became available: %s' % last_err)
