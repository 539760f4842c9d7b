"""TPU backend helpers.

The tunneled single-chip TPU backend used in this environment admits one
client process at a time and takes O(1 min) to release a claim after the
previous process exits, so anything that needs the real chip should
acquire it through wait_for_tpu().
"""
from __future__ import annotations

import time


def apply_platform_env():
    """Honor JAX_PLATFORMS / CHROMA_PLATFORM in CLI entry points.

    Some environments (incl. this one) import jax eagerly from
    sitecustomize with a preconfigured remote backend, which latches the
    platform before the entry point runs — a user's
    `JAX_PLATFORMS=cpu chroma-profile ...` would otherwise still target
    (and block on) the remote device. Call this first in bin/ scripts."""
    import os
    plat = os.environ.get('CHROMA_PLATFORM') \
        or os.environ.get('JAX_PLATFORMS')
    if not plat:
        return
    try:
        import jax
        jax.config.update('jax_platforms', plat)
    except Exception:
        pass


def enable_persistent_cache(path=None):
    """Point JAX at an on-disk compilation cache so repeated runs skip
    the 10-40 s/shape remote compiles (the reference pays an analogous
    one-time nvcc cost through PyCUDA's compiler cache,
    reference: chroma/gpu/tools.py:45-63). Safe to call repeatedly.
    Disable with CHROMA_JIT_CACHE=0."""
    import os
    env = os.environ.get('CHROMA_JIT_CACHE')
    if env == '0':
        return None
    path = path or env or os.path.expanduser('~/.chroma/jax_cache')
    try:
        import jax
        os.makedirs(path, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', path)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.2)
    except Exception:
        return None
    return path


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
