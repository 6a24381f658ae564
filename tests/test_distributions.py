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


def test_gamma_fixed_matches_gamma_distribution():
    """KS test of the fixed-round Marsaglia-Tsang sampler against the exact
    Gamma CDF across the shape regimes the sweeps use (tiny inactive-stick
    concentrations, O(1) priors, count-sized posteriors)."""
    import scipy.stats as stats
    from dynetlsm_tpu.math.distributions import sample_gamma_fixed

    n = 20000
    for i, shape in enumerate([0.05, 0.5, 1.0, 2.5, 30.0, 400.0]):
        key = jax.random.PRNGKey(100 + i)
        draws = np.asarray(sample_gamma_fixed(key, jnp.full((n,), shape)),
                           np.float64)
        assert (draws >= 0).all()
        # float32 underflow maps ultra-tiny draws to 0 for shape << 1;
        # KS on the positive part (the mass near 0 is checked by count)
        if shape < 0.1:
            frac_tiny = (draws < 1e-12).mean()
            want_tiny = stats.gamma.cdf(1e-12, shape)
            assert abs(frac_tiny - want_tiny) < 0.02
            draws = draws[draws >= 1e-12]
            _, p = stats.kstest(draws, lambda x: (
                (stats.gamma.cdf(x, shape) - want_tiny) / (1 - want_tiny)))
        else:
            _, p = stats.kstest(draws, stats.gamma(shape).cdf)
        assert p > 1e-3, (shape, p)


def test_truncated_normal_stays_strictly_inside_bounds():
    """Extreme mean/variance combinations must still draw strictly inside
    the open interval — the inverse-CDF p-clip can otherwise land a draw
    on (or past) a bound, where the truncated logpdf is -inf (the bench's
    mid-chain logp = -inf regression)."""
    from dynetlsm_tpu.math.distributions import (
        truncated_normal, truncated_normal_logpdf)
    for i, (mean, var) in enumerate([(5.0, 1e-4), (-3.0, 1e-6),
                                     (0.99999, 1e-8), (1.5, 4.0)]):
        key = jax.random.PRNGKey(i)
        draws = truncated_normal(key, jnp.full((4096,), mean),
                                 jnp.full((4096,), var))
        d = np.asarray(draws)
        assert (d > 0.0).all() and (d < 1.0).all(), (mean, var)
        lp = np.asarray(truncated_normal_logpdf(draws, mean, var))
        assert np.isfinite(lp).all(), (mean, var)
