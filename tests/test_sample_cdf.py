"""CDF sampler statistical test (reference: test/test_sample_cdf.py —
GPU sampler vs a binned Gaussian, ROOT KS test replaced by scipy)."""
import numpy as np
import jax
import jax.numpy as jnp

from chroma_tpu.ops.sample import (sample_cdf_pairs,
                                   sample_cdf_uniform_rows, uniform)


def _binned_gaussian_cdf(nbins=100, lo=-5.0, hi=5.0):
    edges = np.linspace(lo, hi, nbins + 1)
    centers = 0.5 * (edges[:-1] + edges[1:])
    pdf = np.exp(-0.5 * centers ** 2)
    cdf_y = np.concatenate([[0.0], np.cumsum(pdf)])
    cdf_y /= cdf_y[-1]
    return edges.astype(np.float32), cdf_y.astype(np.float32)


def test_sample_cdf_pairs_matches_distribution():
    "Nonuniform-grid inverse-CDF sampling reproduces a binned Gaussian."
    from scipy import stats
    cdf_x, cdf_y = _binned_gaussian_cdf()
    n = 200000
    u = uniform(jax.random.key(0), (n,))
    samples = np.asarray(sample_cdf_pairs(u, jnp.asarray(cdf_x),
                                          jnp.asarray(cdf_y)))
    # compare with samples drawn by numpy from the same binned CDF
    u2 = np.random.RandomState(1).uniform(size=n)
    ref = np.interp(u2, cdf_y, cdf_x)
    d, p = stats.ks_2samp(samples, ref)
    assert p > 0.01, (d, p)
    # against the true truncated normal: binned, so compare moments
    assert abs(samples.mean()) < 0.02
    assert abs(samples.std() - 1.0) < 0.01


def test_sample_cdf_uniform_rows_bisection():
    "Uniform-grid bisection sampler matches the shared-grid interp sampler."
    from scipy import stats
    nbins = 128
    x0, dx = 0.0, 0.1
    xs = x0 + dx * np.arange(nbins)
    pdf = np.exp(-0.5 * ((xs - 6.0) / 1.5) ** 2)
    cdf = np.cumsum(pdf)
    cdf = (cdf - cdf[0]) / (cdf[-1] - cdf[0])
    table = jnp.asarray(np.stack([cdf, cdf]).astype(np.float32))

    n = 100000
    u = uniform(jax.random.key(2), (n,))
    rows = jnp.asarray(np.random.RandomState(0).randint(0, 2, n),
                       dtype=jnp.int32)
    samples = np.asarray(sample_cdf_uniform_rows(u, table, rows, x0, dx))

    ref = np.interp(np.asarray(u), cdf, xs)
    d, p = stats.ks_2samp(samples, ref)
    assert p > 0.01, (d, p)


def test_uniform_never_zero():
    "uniform() must be in (0, 1] so -log(u) is always finite."
    u = np.asarray(uniform(jax.random.key(3), (1000000,)))
    assert u.min() > 0.0
    assert u.max() <= 1.0
