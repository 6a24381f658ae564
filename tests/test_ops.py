"""Unit tests of the likelihood kernels against dense NumPy oracles that
transcribe the reference Cython formulas (SURVEY.md §2.1)."""
import numpy as np
import jax.numpy as jnp
import pytest

from dynetlsm_tpu.ops import (
    pairwise_distances, undirected_loglik_full, directed_loglik_full,
    undirected_partial_loglik, directed_partial_loglik,
    directed_network_probas, undirected_network_probas,
    emission_logliks, emission_likelihoods,
)


def np_distances(X):
    T, n, d = X.shape
    out = np.zeros((T, n, n))
    for t in range(T):
        for i in range(n):
            for j in range(n):
                out[t, i, j] = np.sqrt(((X[t, i] - X[t, j]) ** 2).sum())
    return out


def np_undirected_loglik(Y, dist, intercept):
    T, n, _ = Y.shape
    ll = 0.0
    for t in range(T):
        for i in range(n):
            for j in range(i + 1, n):
                eta = intercept - dist[t, i, j]
                ll += Y[t, i, j] * eta - np.log1p(np.exp(eta))
    return ll


def np_directed_loglik(Y, dist, radii, b_in, b_out):
    # oracle for directed_network_loglikelihood_fast
    # (reference directed_likelihoods_fast.pyx:185-205)
    T, n, _ = Y.shape
    ll = 0.0
    for t in range(T):
        for i in range(n):
            for j in range(n):
                if i != j:
                    eta = (b_in * (1 - dist[t, i, j] / radii[j])
                           + b_out * (1 - dist[t, i, j] / radii[i]))
                    ll += Y[t, i, j] * eta - np.log1p(np.exp(eta))
    return ll


@pytest.fixture
def net(rng):
    T, n, d = 3, 12, 2
    X = rng.randn(T, n, d)
    Y = rng.binomial(1, 0.3, size=(T, n, n)).astype(np.float64)
    for t in range(T):
        np.fill_diagonal(Y[t], 0)
    Ysym = np.triu(Y, 1) + np.transpose(np.triu(Y, 1), (0, 2, 1))
    radii = rng.dirichlet(np.ones(n))
    return X, Y, Ysym, radii


def test_pairwise_distances(net):
    X = net[0]
    got = np.asarray(pairwise_distances(jnp.asarray(X)))
    np.testing.assert_allclose(got, np_distances(X), rtol=1e-5, atol=1e-5)


def test_undirected_loglik_full(net):
    X, _, Y, _ = net
    dist = np_distances(X)
    want = np_undirected_loglik(Y, dist, 0.7)
    got = float(undirected_loglik_full(
        jnp.asarray(Y), jnp.asarray(dist), 0.7))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_directed_loglik_full(net):
    X, Y, _, radii = net
    dist = np_distances(X)
    want = np_directed_loglik(Y, dist, radii, 0.3, 0.7)
    got = float(directed_loglik_full(
        jnp.asarray(Y), jnp.asarray(dist), jnp.asarray(radii), 0.3, 0.7))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_undirected_partial_matches_full_delta(net):
    """Moving one node: sum of masked partial terms must change the full
    log-lik by the same amount (the property the MH ratio relies on)."""
    X, _, Y, _ = net
    T, n, d = X.shape
    j = 4
    X2 = X.copy()
    X2[:, j] += 0.3
    b = 0.9

    full_delta = (np_undirected_loglik(Y, np_distances(X2), b)
                  - np_undirected_loglik(Y, np_distances(X), b))

    mask = (np.arange(n) != j).astype(np.float64)[None, :]
    t_cur = np.asarray(undirected_partial_loglik(
        jnp.asarray(Y[:, j, :]), jnp.asarray(X), jnp.asarray(X[:, j]), b))
    t_new = np.asarray(undirected_partial_loglik(
        jnp.asarray(Y[:, j, :]), jnp.asarray(X), jnp.asarray(X2[:, j]), b))
    partial_delta = ((t_new - t_cur) * mask).sum()
    # atol absorbs XLA's approximate f32 exp (~2e-6 relative per term)
    np.testing.assert_allclose(partial_delta, full_delta, atol=5e-3)


def test_directed_partial_matches_full_delta(net):
    X, Y, _, radii = net
    T, n, d = X.shape
    j = 3
    X2 = X.copy()
    X2[:, j] += 0.25
    b_in, b_out = 0.3, 0.7

    full_delta = (np_directed_loglik(Y, np_distances(X2), radii, b_in, b_out)
                  - np_directed_loglik(Y, np_distances(X), radii, b_in, b_out))

    mask = (np.arange(n) != j).astype(np.float64)[None, :]
    args = dict(Y_row=jnp.asarray(Y[:, j, :]), Y_col=jnp.asarray(Y[:, :, j]),
                radii=jnp.asarray(radii), r_node=jnp.asarray(radii[j]),
                intercept_in=b_in, intercept_out=b_out)
    t_cur = np.asarray(directed_partial_loglik(
        X=jnp.asarray(X), x_new=jnp.asarray(X[:, j]), **args))
    t_new = np.asarray(directed_partial_loglik(
        X=jnp.asarray(X), x_new=jnp.asarray(X2[:, j]), **args))
    partial_delta = ((t_new - t_cur) * mask).sum()
    np.testing.assert_allclose(partial_delta, full_delta, atol=5e-3)


def test_probas(net):
    X, Y, _, radii = net
    dist = np_distances(X)
    from scipy.special import expit
    want = expit(0.5 - dist)
    for t in range(Y.shape[0]):
        np.fill_diagonal(want[t], 0)
    got = np.asarray(undirected_network_probas(jnp.asarray(dist), 0.5))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    eta = (0.3 * (1 - dist / radii[None, None, :])
           + 0.7 * (1 - dist / radii[None, :, None]))
    want_d = expit(eta)
    for t in range(Y.shape[0]):
        np.fill_diagonal(want_d[t], 0)
    got_d = np.asarray(directed_network_probas(
        jnp.asarray(dist), jnp.asarray(radii), 0.3, 0.7))
    np.testing.assert_allclose(got_d, want_d, rtol=1e-5, atol=1e-6)


def test_emissions_against_reference_formula(rng):
    """Oracle transcribing compute_gaussian_likelihood
    (reference gaussian_likelihood_fast.pyx:30-54) for a single node."""
    T, d, K = 4, 2, 3
    X = rng.randn(T, 5, d)
    mu = rng.randn(K, d)
    sigma = rng.rand(K) + 0.5
    lam = 0.8

    def oracle(x_traj):
        out = np.zeros((T, K))
        for t in range(T):
            for k in range(K):
                m = mu[k] if t == 0 else lam * mu[k] + (1 - lam) * x_traj[t - 1]
                ss = ((x_traj[t] - m) ** 2).sum()
                out[t, k] = (-0.5 * d * np.log(2 * np.pi * sigma[k])
                             - 0.5 * ss / sigma[k])
        return out

    got = np.asarray(emission_logliks(
        jnp.asarray(X), jnp.asarray(mu), jnp.asarray(sigma), lam))
    for i in range(5):
        np.testing.assert_allclose(got[:, i, :], oracle(X[:, i]),
                                   rtol=1e-4, atol=1e-5)

    # normalised variant: max per (t, node) row is exp(0) = 1
    lik = np.asarray(emission_likelihoods(
        jnp.asarray(X), jnp.asarray(mu), jnp.asarray(sigma), lam))
    np.testing.assert_allclose(lik.max(axis=-1), 1.0, rtol=1e-5)


def test_int8_adjacency_bit_identical(rng):
    """The TPU path stores fixed adjacencies as int8 (mcmc/sweeps.py
    _int8_adjacency); 0/1 int8 must promote back to the identical float
    values through every likelihood expression."""
    import jax
    from dynetlsm_tpu.ops.likelihoods import (
        undirected_loglik_full, directed_loglik_full, undirected_loglik_pair)
    from dynetlsm_tpu.ops.distances import pairwise_distances

    T, n = 3, 20
    Y = (rng.rand(T, n, n) < 0.3).astype(np.float32)
    Y = np.triu(Y, 1)
    Y = Y + np.swapaxes(Y, 1, 2)
    X = rng.randn(T, n, 2).astype(np.float32)
    dist = pairwise_distances(jnp.asarray(X))
    radii = jnp.asarray(rng.rand(n).astype(np.float32) + 0.5)

    Yf = jnp.asarray(Y)
    Yi = Yf.astype(jnp.int8)
    np.testing.assert_array_equal(
        np.asarray(undirected_loglik_full(Yf, dist, 1.0)),
        np.asarray(undirected_loglik_full(Yi, dist, 1.0)))
    np.testing.assert_array_equal(
        np.asarray(directed_loglik_full(Yf, dist, radii, 1.0, 0.5)),
        np.asarray(directed_loglik_full(Yi, dist, radii, 1.0, 0.5)))
    a = undirected_loglik_pair(Yf, dist, 1.0, 1.1)
    b = undirected_loglik_pair(Yi, dist, 1.0, 1.1)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))

    # a full HDP sweep built from int8 Y matches the f32-built sweep
    # bit-for-bit under a shared key (what the TPU gate relies on)
    from dynetlsm_tpu.mcmc.sweeps import SweepConfig, make_hdp_sweep
    from dynetlsm_tpu.mcmc.states import MixtureState
    K = 4
    cfg = SweepConfig(n_components=K, latent_update='parallel')
    state = MixtureState(
        key=jax.random.PRNGKey(0), it=jnp.zeros((), jnp.int32),
        X=jnp.asarray(X), intercept=jnp.ones(1), radii=None, Y=None,
        z=jnp.asarray(rng.randint(0, K, (T, n)), jnp.int32),
        mu=jnp.asarray(rng.randn(K, 2), jnp.float32),
        sigma=jnp.ones(K), lmbda=jnp.asarray(0.9),
        weights=jnp.full((T, K, K), 1.0 / K),
        beta=jnp.full(K, 1.0 / K), gamma=jnp.asarray(1.0),
        alpha_init=jnp.asarray(1.0), alpha=jnp.asarray(1.0),
        kappa=jnp.asarray(4.0), init_weights=None, trans_weights=None,
        mean_var=jnp.asarray(1.0), b_scale=jnp.asarray(2.0),
        step_X=jnp.full((T, n), 0.1), acc_X=jnp.zeros((T, n)),
        step_int=jnp.full((1,), 0.1), acc_int=jnp.zeros((1,)),
        step_radii=None, acc_radii=None,
        logp=jnp.zeros(()), missing_sum=None)
    prior = np.zeros(1, np.float32)
    out_f = make_hdp_sweep(Yf, None, prior, cfg)(state)
    out_i = make_hdp_sweep(Yi, None, prior, cfg)(state)
    np.testing.assert_array_equal(np.asarray(out_f.X), np.asarray(out_i.X))
    np.testing.assert_array_equal(np.asarray(out_f.z), np.asarray(out_i.z))
    np.testing.assert_array_equal(np.asarray(out_f.logp),
                                  np.asarray(out_i.logp))
