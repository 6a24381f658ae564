"""Forecaster tests: the posterior-predictive one-step forecaster against a
NumPy oracle that mirrors the reference's per-sample / per-group loops
(reference hdp_lpcm.py:590-630)."""
import numpy as np
import jax
import jax.numpy as jnp

from scipy.special import expit
from scipy.spatial.distance import pdist, squareform

from dynetlsm_tpu.ops.forecast import (
    _pp_forecast_step, posterior_predictive_forecast)


def _oracle_pp_step(u, eps, x_last, z_full, trans, mu, sigma, b, lam):
    """Reference-shaped single-sample oracle (hdp_lpcm.py:600-629): compact
    to the active clusters, renormalise the transition rows, inverse-CDF
    label draws, per-group position resampling."""
    active = np.unique(z_full)
    wt = trans[np.ix_(active, active)].astype(np.float64)
    wt /= wt.sum(axis=1, keepdims=True)
    z_last = np.searchsorted(active, z_full[-1])

    n = x_last.shape[0]
    zt = np.zeros(n, dtype=int)
    for i in range(n):
        cdf = np.cumsum(wt[z_last[i]])
        zt[i] = min(int(np.sum(u[i] > cdf)), active.shape[0] - 1)

    xt = np.zeros_like(x_last)
    for g in range(active.shape[0]):
        mask = zt == g
        xt[mask] = (sigma[active[g]] * eps[mask]
                    + lam * mu[active[g]] + (1 - lam) * x_last[mask])
    dist = squareform(pdist(xt))
    return expit(b - dist)


def test_pp_forecast_step_matches_reference_oracle(rng):
    n, d, K, T = 12, 2, 6, 4
    for trial in range(5):
        active = rng.choice(K, size=rng.randint(2, K + 1), replace=False)
        z_full = rng.choice(active, size=(T, n))
        # ensure every chosen cluster actually appears
        z_full[0, :active.shape[0]] = active
        x_last = rng.randn(n, d)
        trans = rng.dirichlet(np.ones(K), size=K)
        mu = rng.randn(K, d)
        sigma = rng.uniform(0.1, 0.8, K)
        b, lam = rng.randn() + 1.0, rng.uniform(0.3, 0.95)
        u = rng.uniform(size=n)
        eps = rng.randn(n, d)

        active_mask = np.zeros(K, np.float32)
        active_mask[active] = 1.0
        got = np.asarray(_pp_forecast_step(
            jnp.asarray(u, jnp.float32), jnp.asarray(eps, jnp.float32),
            jnp.asarray(x_last, jnp.float32), jnp.asarray(active_mask),
            jnp.asarray(z_full[-1], jnp.int32),
            jnp.asarray(trans, jnp.float32), jnp.asarray(mu, jnp.float32),
            jnp.asarray(sigma, jnp.float32), jnp.float32(b),
            jnp.float32(lam)))
        want = _oracle_pp_step(u, eps, x_last, z_full, trans, mu, sigma,
                               b, lam)
        np.testing.assert_allclose(got, want, atol=2e-5)


def test_posterior_predictive_forecast_shapes_and_range(rng):
    S, T, n, d, K = 20, 3, 10, 2, 5
    z_full = rng.randint(0, K, size=(S, T, n))
    probas = np.asarray(posterior_predictive_forecast(
        jax.random.PRNGKey(0),
        rng.randn(S, n, d), z_full,
        rng.dirichlet(np.ones(K), size=(S, K)),
        rng.randn(S, K, d), rng.uniform(0.1, 0.5, (S, K)),
        rng.randn(S) + 1.0, rng.uniform(0.5, 0.95, S)))
    assert probas.shape == (n, n)
    assert np.isfinite(probas).all()
    assert (probas > 0).all() and (probas < 1).all()


def test_posterior_predictive_forecast_degenerate_limit(rng):
    """With one active cluster, sigma -> 0 and a point-mass transition the
    forecast is the deterministic plug-in probability."""
    S, T, n, d, K = 8, 2, 6, 2, 4
    x_last = np.tile(rng.randn(1, n, d), (S, 1, 1))
    z_full = np.full((S, T, n), 2)
    trans = np.zeros((S, K, K))
    trans[:, :, 2] = 1.0
    mu = np.tile(rng.randn(1, K, d), (S, 1, 1))
    sigma = np.full((S, K), 1e-7)
    b = np.full(S, 0.7)
    lam = np.full(S, 0.4)
    probas = np.asarray(posterior_predictive_forecast(
        jax.random.PRNGKey(1), x_last, z_full, trans, mu, sigma, b, lam))
    xt = lam[0] * mu[0, 2] + (1 - lam[0]) * x_last[0]
    want = expit(b[0] - squareform(pdist(xt)))
    np.testing.assert_allclose(probas, want, atol=1e-4)
