"""Unit tests of the batched FFBS label sampler and HDP auxiliary blocks."""
import numpy as np
import jax
import jax.numpy as jnp

from sklearn.metrics import adjusted_rand_score

from dynetlsm_tpu.mcmc.labels import (
    sample_labels_block, sample_labels_block_lpcm,
    latent_marginal_loglikelihood)
from dynetlsm_tpu.mcmc.hdp import (
    sample_tables, sample_mbar, sample_concentration_param)
from dynetlsm_tpu.ops.emissions import emission_likelihoods


def _mixture_trajectory(rng, mus, sig, z_true, T, lam=0.9, noise=0.3):
    n, d = z_true.shape[0], mus.shape[1]
    X = np.zeros((T, n, d))
    X[0] = mus[z_true] + noise * rng.randn(n, d)
    for t in range(1, T):
        X[t] = lam * mus[z_true] + (1 - lam) * X[t - 1] + noise * rng.randn(n, d)
    return X


def test_ffbs_recovers_separated_clusters(rng):
    K, T, n = 5, 3, 60
    mus = np.array([[-5, 0], [5, 0], [0, 5], [0, 0], [0, -5]], float)
    sig = np.full(K, 0.3)
    z_true = rng.randint(0, 3, size=n)
    X = _mixture_trajectory(rng, mus, 0.3, z_true, T)

    w = np.zeros((T, K, K))
    w[0, 0] = np.full(K, 1 / K)
    for t in range(1, T):
        w[t] = 0.2 * np.ones((K, K)) / K + 0.8 * np.eye(K)

    z, n_trans, nk, resp = sample_labels_block(
        jax.random.PRNGKey(0), jnp.asarray(X, jnp.float32),
        jnp.asarray(mus, jnp.float32), jnp.asarray(sig, jnp.float32),
        jnp.float32(0.9), jnp.asarray(w, jnp.float32))
    z = np.asarray(z)
    assert adjusted_rand_score(z_true, z[0]) == 1.0
    assert adjusted_rand_score(z_true, z[-1]) == 1.0
    # statistics consistency
    nk = np.asarray(nk)
    assert nk.sum(axis=1).tolist() == [n] * T
    n_trans = np.asarray(n_trans)
    np.testing.assert_allclose(n_trans[0, 0], nk[0])
    np.testing.assert_allclose(n_trans[1].sum(), n)
    resp = np.asarray(resp)
    np.testing.assert_allclose(resp.sum(axis=-1), 1.0)


def test_ffbs_lpcm_variant(rng):
    K, T, n = 4, 3, 40
    mus = np.array([[-4, 0], [4, 0], [0, 4], [0, -4]], float)
    sig = np.full(K, 0.25)
    z_true = rng.randint(0, K, size=n)
    X = _mixture_trajectory(rng, mus, 0.25, z_true, T)

    z, n_trans, nk, resp = sample_labels_block_lpcm(
        jax.random.PRNGKey(1), jnp.asarray(X, jnp.float32),
        jnp.asarray(mus, jnp.float32), jnp.asarray(sig, jnp.float32),
        jnp.float32(0.9), jnp.full((K,), 1 / K, jnp.float32),
        jnp.asarray(0.1 * np.ones((K, K)) / K + 0.9 * np.eye(K), jnp.float32))
    assert adjusted_rand_score(z_true, np.asarray(z)[0]) == 1.0


def test_latent_marginal_loglik_matches_bruteforce(rng):
    """Forward-algorithm marginal vs brute-force per-node sum over label
    paths (oracle for reference approx_bic.py:56-76)."""
    K, T, n, d = 3, 3, 4, 2
    X = rng.randn(T, n, d)
    mu = rng.randn(K, d)
    sigma = rng.rand(K) + 0.5
    lam = 0.7
    init_w = np.array([0.5, 0.3, 0.2])
    trans = rng.dirichlet(np.ones(K), size=(T, K))

    lik = np.asarray(emission_likelihoods(
        jnp.asarray(X, jnp.float32), jnp.asarray(mu, jnp.float32),
        jnp.asarray(sigma, jnp.float32), lam, normalize=False))

    import itertools
    want = 0.0
    for i in range(n):
        total = 0.0
        for path in itertools.product(range(K), repeat=T):
            p = init_w[path[0]] * lik[0, i, path[0]]
            for t in range(1, T):
                p *= trans[t, path[t - 1], path[t]] * lik[t, i, path[t]]
            total += p
        want += np.log(total)

    got = float(latent_marginal_loglikelihood(
        jnp.asarray(X, jnp.float32), jnp.asarray(init_w, jnp.float32),
        jnp.asarray(trans, jnp.float32), jnp.asarray(mu, jnp.float32),
        jnp.asarray(sigma, jnp.float32), lam))
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_sample_tables_bounds(rng):
    """Table counts satisfy 1 <= m <= n when counts are positive and p > 0."""
    T, K, n = 3, 4, 25
    n_trans = rng.randint(0, n // 2, size=(T, K, K)).astype(np.float64)
    beta = rng.dirichlet(np.ones(K))
    m = np.asarray(sample_tables(
        jax.random.PRNGKey(2), jnp.asarray(n_trans, jnp.float32),
        jnp.asarray(beta, jnp.float32), 1.0, 1.0, 4.0, n_max=n))
    assert (m <= n_trans).all()
    assert (m[n_trans > 0] >= 1).all()   # first customer always opens a table
    assert (m[n_trans == 0] == 0).all()


def test_sample_mbar_consistency(rng):
    T, K, n = 3, 4, 25
    m = rng.randint(0, 5, size=(T, K, K)).astype(np.float64)
    beta = rng.dirichlet(np.ones(K))
    m_bar, w = sample_mbar(jax.random.PRNGKey(3), jnp.asarray(m, jnp.float32),
                           jnp.asarray(beta, jnp.float32), 4.0, 1.0, n_max=n)
    m_bar, w = np.asarray(m_bar), np.asarray(w)
    diag_m = np.einsum('tkk->tk', m[1:])
    assert (w <= diag_m + 1e-6).all() and (w >= 0).all()
    want = m[1:].sum(axis=(0, 1)) - w.sum(axis=0) + m[0, 0]
    np.testing.assert_allclose(m_bar, want, rtol=1e-5)


def test_concentration_sampler_moments():
    """Escobar-West update stays positive and in a sane range."""
    keys = jax.random.split(jax.random.PRNGKey(4), 2000)
    draws = jax.vmap(lambda k: sample_concentration_param(
        k, jnp.float32(1.0), jnp.float32(4.0), jnp.float32(100.0),
        prior_shape=1.0, prior_rate=1.0))(keys)
    d = np.asarray(draws)
    assert (d > 0).all()
    assert 0.1 < d.mean() < 10.0
