"""Joint MALA latent-position update (latent_update='mala').

Beyond-reference capability: the rebuilt likelihood is differentiable end
to end, so the position field can be updated with one joint Langevin move
instead of 2n sequential single-site steps.  These tests pin (a) the MH
kernel's correctness — same posterior as the exact scan, (b) gradient
safety at coincident positions, and (c) the tuning schedule.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynetlsm_tpu import DynamicNetworkLSM, DynamicNetworkHDPLPCM
from dynetlsm_tpu.datasets import (
    load_monks, simple_splitting_dynamic_network)
from dynetlsm_tpu.mcmc.latent import (
    _joint_latent_logp, sample_latent_positions)


def test_mala_lsm_matches_exact_posterior():
    # the joint Langevin proposal is MH-corrected, so the sampled posterior
    # must agree with the exact single-site scan's
    Y, _, _ = load_monks(is_directed=False)
    kw = dict(n_iter=1200, tune=400, burn=400, random_state=11, n_chains=4)
    exact = DynamicNetworkLSM(latent_update='exact', **kw).fit(Y)
    mala = DynamicNetworkLSM(latent_update='mala', **kw).fit(Y)

    assert np.isfinite(mala.logps_).all()
    # posterior mean of the intercept within 3 pooled posterior sds
    tol = 3.0 * max(exact.intercepts_.std(), 0.05)
    assert abs(exact.intercepts_.mean() - mala.intercepts_.mean()) < tol
    # logp level agrees (same joint density, same typical set)
    assert (abs(exact.logps_.mean() - mala.logps_.mean())
            < 3.0 * exact.logps_.std())
    # distance geometry agrees up to rotation (compare distances, not X)
    r = np.corrcoef(exact.distances_.ravel(), mala.distances_.ravel())[0, 1]
    assert r > 0.7
    assert mala.auc_ > 0.8


@pytest.mark.slow  # mala LSM fit + Geweke cover the kernel in-tier
def test_mala_hdp_fit_runs():
    Y, _ = simple_splitting_dynamic_network(n_nodes=24, n_time_steps=2,
                                            random_state=4)
    m = DynamicNetworkHDPLPCM(n_iter=150, tune=150, burn=150,
                              n_components=6, random_state=3,
                              latent_update='mala').fit(Y)
    assert np.isfinite(m.logps_).all()
    assert m.auc_ > 0.6


def test_mala_gradient_safe_at_coincident_positions():
    # two nodes at the same position: the floored sqrt must keep the joint
    # gradient finite and the update usable
    T, n, d = 2, 8, 2
    rng = np.random.RandomState(0)
    X = rng.randn(T, n, d).astype(np.float32)
    X[:, 1] = X[:, 0]                        # exact coincidence
    Y = (rng.uniform(size=(T, n, n)) < 0.4).astype(np.float32)
    Y = np.triu(Y, 1)
    Y = Y + Y.transpose(0, 2, 1)

    g = jax.grad(lambda Xq: _joint_latent_logp(
        jnp.asarray(Y), Xq, jnp.asarray([0.5]), None, 1.0, 0.1,
        None, None, None, None, False, False))(jnp.asarray(X))
    assert np.isfinite(np.asarray(g)).all()

    X_new, acc = sample_latent_positions(
        jax.random.PRNGKey(0), jnp.asarray(Y), jnp.asarray(X),
        jnp.asarray([0.5]), jnp.full((T, n), 0.05, jnp.float32),
        tau_sq=1.0, sigma_sq=0.1, scheme='mala')
    assert np.isfinite(np.asarray(X_new)).all()
    assert acc.shape == (T, n)


def test_mala_joint_logp_matches_sweep_terms():
    # the MALA target must equal network loglik + joint temporal prior as
    # evaluated by the sweep's own pieces (same density => same posterior)
    from dynetlsm_tpu.ops.likelihoods import undirected_loglik_full
    from dynetlsm_tpu.ops.distances import pairwise_distances
    T, n, d = 3, 12, 2
    rng = np.random.RandomState(2)
    X = jnp.asarray(rng.randn(T, n, d), jnp.float32)
    Y = (rng.uniform(size=(T, n, n)) < 0.4).astype(np.float32)
    Y = np.triu(Y, 1)
    Y = jnp.asarray(Y + Y.transpose(0, 2, 1))
    tau_sq, sigma_sq = 2.0, 0.15

    got = float(_joint_latent_logp(Y, X, jnp.asarray([0.3]), None,
                                   tau_sq, sigma_sq, None, None, None, None,
                                   False, False))
    ll = float(undirected_loglik_full(Y, pairwise_distances(X), 0.3))
    prior = float(-0.5 * jnp.sum(X[0] * X[0]) / tau_sq
                  - 0.5 * jnp.sum((X[1:] - X[:-1]) ** 2) / sigma_sq)
    assert np.isclose(got, ll + prior, rtol=1e-5)


def test_mala_rejects_case_control_and_bad_scheme():
    T, n = 2, 10
    X = jnp.zeros((T, n, 2))
    Y = jnp.zeros((T, n, n))
    step = jnp.full((T, n), 0.1)
    with pytest.raises(ValueError, match='case-control'):
        sample_latent_positions(jax.random.PRNGKey(0), Y, X,
                                jnp.asarray([0.0]), step, tau_sq=1.0,
                                sigma_sq=1.0, cc={'dummy': 1}, scheme='mala')
    with pytest.raises(ValueError, match='latent_update'):
        sample_latent_positions(jax.random.PRNGKey(0), Y, X,
                                jnp.asarray([0.0]), step, tau_sq=1.0,
                                sigma_sq=1.0, scheme='hamiltonian')


def test_mala_tuner_moves_toward_band():
    from dynetlsm_tpu.mcmc.metropolis import tune_step_size_mala
    s = jnp.asarray(1.0)
    assert float(tune_step_size_mala(s, jnp.asarray(0.1))) < 1.0   # too low
    assert float(tune_step_size_mala(s, jnp.asarray(0.9))) > 1.0   # too high
    assert float(tune_step_size_mala(s, jnp.asarray(0.55))) == 1.0  # in band


def test_mala_spatial_fit():
    # MALA is a fused dense pass, so unlike the exact scan it shards over
    # the node axis; fit on the 2-D ('chains', 'nodes') mesh
    from jax.sharding import PartitionSpec as P
    Y, _ = simple_splitting_dynamic_network(n_nodes=24, n_time_steps=2,
                                            random_state=7)
    m = DynamicNetworkLSM(n_iter=40, tune=40, burn=40, n_chains=2,
                          node_devices=4, latent_update='mala',
                          random_state=5).fit(Y)
    assert m.mesh_.devices.shape == (2, 4)
    assert m.state_sharding_.spec == P('chains', None, 'nodes', None)
    assert np.isfinite(m.logps_).all()
    assert m.auc_ > 0.6


def test_mala_directed_joint_logp_and_fit():
    # directed branch: the MALA target must equal the directed network
    # loglik + RW prior, and a directed fit must run finite
    from dynetlsm_tpu.ops.likelihoods import directed_loglik_full
    from dynetlsm_tpu.ops.distances import pairwise_distances
    T, n, d = 2, 12, 2
    rng = np.random.RandomState(6)
    X = jnp.asarray(rng.randn(T, n, d), jnp.float32)
    Y = (rng.uniform(size=(T, n, n)) < 0.3).astype(np.float32)
    for t in range(T):
        np.fill_diagonal(Y[t], 0.0)
    Yj = jnp.asarray(Y)
    radii = jnp.asarray(rng.uniform(0.5, 1.5, size=n), jnp.float32)
    b = jnp.asarray([0.4, -0.1], jnp.float32)
    tau_sq, sigma_sq = 2.0, 0.1

    got = float(_joint_latent_logp(Yj, X, b, radii, tau_sq, sigma_sq,
                                   None, None, None, None, True, False))
    ll = float(directed_loglik_full(Yj, pairwise_distances(X), radii,
                                    b[0], b[1]))
    prior = float(-0.5 * jnp.sum(X[0] * X[0]) / tau_sq
                  - 0.5 * jnp.sum((X[1:] - X[:-1]) ** 2) / sigma_sq)
    assert np.isclose(got, ll + prior, rtol=1e-5)

    Yd, _, _ = load_monks(is_directed=True)
    m = DynamicNetworkLSM(n_iter=100, tune=100, burn=100, is_directed=True,
                          latent_update='mala', random_state=2).fit(Yd)
    assert np.isfinite(m.logps_).all()
    assert m.auc_ > 0.6


def test_mala_mixture_joint_logp_oracle():
    # mixture branch: network loglik + AR(1)-to-cluster-mean prior (the
    # X-independent -0.5 log sigma_z terms are deliberately omitted — they
    # cancel in the MH ratio)
    from dynetlsm_tpu.ops.likelihoods import undirected_loglik_full
    from dynetlsm_tpu.ops.distances import pairwise_distances
    T, n, d, K = 3, 10, 2, 4
    rng = np.random.RandomState(8)
    X = rng.randn(T, n, d).astype(np.float32)
    Y = (rng.uniform(size=(T, n, n)) < 0.4).astype(np.float32)
    Y = np.triu(Y, 1)
    Y = Y + Y.transpose(0, 2, 1)
    z = rng.randint(0, K, size=(T, n))
    mu = rng.randn(K, d).astype(np.float32)
    sigma = rng.uniform(0.5, 1.5, size=K).astype(np.float32)
    lam = 0.85

    got = float(_joint_latent_logp(
        jnp.asarray(Y), jnp.asarray(X), jnp.asarray([0.3]), None, None,
        None, jnp.asarray(mu), jnp.asarray(sigma), jnp.asarray(lam),
        jnp.asarray(z), False, True))

    ll = float(undirected_loglik_full(jnp.asarray(Y),
                                      pairwise_distances(jnp.asarray(X)),
                                      0.3))
    mu_z, sig_z = mu[z], sigma[z]
    prior = -0.5 * np.sum(((X[0] - mu_z[0]) ** 2).sum(-1) / sig_z[0])
    dft = X[1:] - (1 - lam) * X[:-1] - lam * mu_z[1:]
    prior -= 0.5 * np.sum((dft ** 2).sum(-1) / sig_z[1:])
    assert np.isclose(got, ll + prior, rtol=1e-4)
