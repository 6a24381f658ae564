"""Distributional checks of the jittable primitive samplers."""
import numpy as np
import jax
import jax.numpy as jnp
import scipy.stats as stats

from dynetlsm_tpu.math import (
    sample_dirichlet, dirichlet_logpdf,
    truncated_normal, truncated_normal_logpdf,
    sample_inv_gamma, sample_beta,
)


def test_dirichlet_moments():
    key = jax.random.PRNGKey(0)
    alphas = jnp.asarray([2.0, 5.0, 1.0])
    draws = sample_dirichlet(key, jnp.broadcast_to(alphas, (4000, 3)))
    mean = np.asarray(draws).mean(axis=0)
    np.testing.assert_allclose(mean, np.asarray(alphas) / 8.0, atol=0.02)
    assert np.all(np.asarray(draws) > 0)


def test_dirichlet_logpdf_matches_scipy():
    x = np.array([0.2, 0.5, 0.3])
    a = np.array([1.5, 2.0, 0.7])
    got = float(dirichlet_logpdf(jnp.asarray(x), jnp.asarray(a)))
    want = stats.dirichlet.logpdf(x, a)
    # atol absorbs float32 gammaln error
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_truncated_normal_moments():
    key = jax.random.PRNGKey(1)
    mean, var = 0.85, 0.01
    draws = truncated_normal(key, jnp.full((8000,), mean), jnp.asarray(var))
    d = np.asarray(draws)
    assert np.all((d > 0) & (d < 1))
    a, b = (0 - mean) / np.sqrt(var), (1 - mean) / np.sqrt(var)
    want = stats.truncnorm.mean(a, b, loc=mean, scale=np.sqrt(var))
    np.testing.assert_allclose(d.mean(), want, atol=5e-3)


def test_truncated_normal_logpdf_matches_scipy():
    mean, var = 0.85, 0.01
    a, b = (0 - mean) / np.sqrt(var), (1 - mean) / np.sqrt(var)
    for x in [0.1, 0.5, 0.9]:
        got = float(truncated_normal_logpdf(jnp.asarray(x), mean, var))
        want = stats.truncnorm.logpdf(x, a, b, loc=mean, scale=np.sqrt(var))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)


def test_inv_gamma_moments():
    key = jax.random.PRNGKey(2)
    shape, rate = 5.0, 2.0
    draws = sample_inv_gamma(key, jnp.full((8000,), shape), jnp.asarray(rate))
    # InvGamma(a, b) mean = b / (a - 1)
    np.testing.assert_allclose(np.asarray(draws).mean(), rate / (shape - 1),
                               rtol=0.05)


def test_beta_moments():
    key = jax.random.PRNGKey(3)
    a, b = 8.0, 2.0
    draws = sample_beta(key, jnp.full((8000,), a), jnp.full((8000,), b))
    np.testing.assert_allclose(np.asarray(draws).mean(), a / (a + b),
                               atol=0.01)
