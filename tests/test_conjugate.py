"""Moment tests of the conjugate Gibbs blocks against transcriptions of the
reference update formulas (hdp_lpcm.py:901-954)."""
import numpy as np
import jax
import jax.numpy as jnp

from dynetlsm_tpu.mcmc.conjugate import (
    sample_cluster_means, sample_cluster_variances, sample_lambda)


def _setup(rng, T=3, n=20, d=2, K=4):
    X = rng.randn(T, n, d)
    z = rng.randint(0, K, size=(T, n))
    resp = np.zeros((T, n, K))
    resp[np.arange(T)[:, None], np.arange(n)[None, :], z] = 1
    nk = resp.sum(1)
    sigma = rng.rand(K) + 0.3
    return X, z, resp, nk, sigma


def test_cluster_mean_posterior_moments(rng):
    T, n, d, K = 3, 20, 2, 4
    X, z, resp, nk, sigma = _setup(rng, T, n, d, K)
    lam, mvp = 0.7, 0.6

    def oracle(k):
        pk = 1 / mvp
        mk = np.zeros(d)
        for t in range(T):
            if nk[t, k] > 0:
                mask = resp[t, :, k].astype(bool)
                if t == 0:
                    pk += nk[0, k] / sigma[k]
                    mk += (1 / sigma[k]) * X[t, mask].sum(0)
                else:
                    pk += (lam ** 2 / sigma[k]) * nk[t, k]
                    mk += (lam / sigma[k]) * (
                        X[t, mask] - (1 - lam) * X[t - 1, mask]).sum(0)
        return 1 / pk, mk / pk

    keys = jax.random.split(jax.random.PRNGKey(0), 4000)
    draws = np.asarray(jax.vmap(lambda k: sample_cluster_means(
        k, jnp.asarray(X, jnp.float32), jnp.asarray(resp, jnp.float32),
        jnp.asarray(nk, jnp.float32), jnp.asarray(sigma, jnp.float32),
        jnp.float32(lam), jnp.float32(mvp)))(keys))
    for k in range(K):
        var, mean = oracle(k)
        np.testing.assert_allclose(draws[:, k].mean(0), mean, atol=0.03)
        np.testing.assert_allclose(draws[:, k].var(0), var, rtol=0.15)


def test_cluster_variance_posterior_moments(rng):
    T, n, d, K = 3, 20, 2, 4
    X, z, resp, nk, sigma = _setup(rng, T, n, d, K)
    lam, a, b = 0.7, 2.0, 2.4
    mu = rng.randn(K, d)

    def oracle(k):
        ak = 0.5 * (nk[:, k].sum() * d + a)
        bk = 0.5 * b
        for t in range(T):
            if nk[t, k] > 0:
                mask = resp[t, :, k].astype(bool)
                if t == 0:
                    bk += 0.5 * ((X[t, mask] - mu[k]) ** 2).sum()
                else:
                    bk += 0.5 * ((X[t, mask] - (1 - lam) * X[t - 1, mask]
                                  - lam * mu[k]) ** 2).sum()
        return ak, bk

    keys = jax.random.split(jax.random.PRNGKey(1), 4000)
    draws = np.asarray(jax.vmap(lambda k: sample_cluster_variances(
        k, jnp.asarray(X, jnp.float32), jnp.asarray(resp, jnp.float32),
        jnp.asarray(nk, jnp.float32), jnp.asarray(mu, jnp.float32),
        jnp.float32(lam), a, jnp.float32(b)))(keys))
    for k in range(K):
        ak, bk = oracle(k)
        np.testing.assert_allclose(draws[:, k].mean(), bk / (ak - 1),
                                   rtol=0.1)


def test_lambda_posterior_moments(rng):
    T, n, d, K = 4, 25, 2, 3
    X, z, resp, nk, sigma = _setup(rng, T, n, d, K)
    mu = rng.randn(K, d)
    lp, lvp = 0.9, 0.01

    # reference hdp_lpcm.py:939-954
    ml, sl = 0.0, 1.0 / lvp
    for t in range(1, T):
        ml_diff = (mu[z[t]] - X[t - 1]) / sigma[z[t]].reshape(-1, 1)
        ml += np.sum(ml_diff * (X[t] - X[t - 1]))
        sl += np.sum(((mu[z[t]] - X[t - 1])
                      / np.sqrt(sigma[z[t]].reshape(-1, 1))) ** 2)
    sl = 1.0 / sl
    ml = sl * (ml + lp / lvp)

    keys = jax.random.split(jax.random.PRNGKey(2), 4000)
    draws = np.asarray(jax.vmap(lambda k: sample_lambda(
        k, jnp.asarray(X, jnp.float32), jnp.asarray(z, jnp.int32),
        jnp.asarray(mu, jnp.float32), jnp.asarray(sigma, jnp.float32),
        lp, lvp))(keys))
    assert ((draws > 0) & (draws < 1)).all()
    import scipy.stats as stats
    a_, b_ = (0 - ml) / np.sqrt(sl), (1 - ml) / np.sqrt(sl)
    want = stats.truncnorm.mean(a_, b_, loc=ml, scale=np.sqrt(sl))
    np.testing.assert_allclose(draws.mean(), want, atol=0.02)
