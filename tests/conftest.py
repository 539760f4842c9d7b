"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI, so sharding code paths are
validated on host devices. Set CHROMA_TPU_TEST_PLATFORM=tpu to run the
suite against real hardware instead.
"""
import os

_platform = os.environ.get('CHROMA_TPU_TEST_PLATFORM', 'cpu')
if _platform == 'cpu':
    # override unconditionally: the machine environment may pre-set
    # JAX_PLATFORMS to a tunneled TPU backend, which would make every
    # jit in the suite a slow remote compile
    os.environ['JAX_PLATFORMS'] = 'cpu'
    flags = os.environ.get('XLA_FLAGS', '')
    if 'host_platform_device_count' not in flags:
        os.environ['XLA_FLAGS'] = (
            flags + ' --xla_force_host_platform_device_count=8').strip()
    # sitecustomize may have imported jax already (with JAX_PLATFORMS
    # pointing at a remote TPU backend baked into the config), so update
    # the live config too
    import jax
    jax.config.update('jax_platforms', 'cpu')

# keep tests from polluting the user's real cache
os.environ.setdefault('CHROMA_CACHE_DIR', '/tmp/chroma_tpu_test_cache')
