"""End-to-end LPCM / HDP-LPCM smoke + recovery tests (CPU mesh)."""
import numpy as np
import pytest

from sklearn.metrics import adjusted_rand_score

from dynetlsm_tpu import DynamicNetworkLPCM, DynamicNetworkHDPLPCM
from dynetlsm_tpu.datasets import (
    synthetic_static_community_dynamic_network,
    simple_splitting_dynamic_network)


@pytest.fixture(scope='module')
def community_net():
    Y, X, z, intercept, probas, _ = \
        synthetic_static_community_dynamic_network(
            n_nodes=40, n_time_steps=2, n_groups=3,
            simulation_type='easy', random_state=42)
    return Y, z


def test_lpcm_smoke_and_recovery(community_net):
    Y, z_true = community_net
    model = DynamicNetworkLPCM(n_iter=300, tune=150, burn=150,
                               n_components=3, random_state=123).fit(Y)
    T, n, _ = Y.shape
    assert model.X_.shape == (T, n, 2)
    assert model.z_.shape == (T, n)
    assert model.mu_.shape == (3, 2)
    assert model.sigma_.shape == (3,)
    assert 0 < float(model.lambda_[0]) < 1
    assert np.isfinite(model.logps_).all()
    assert model.auc_ > 0.75
    assert adjusted_rand_score(z_true[0], model.z_[0]) > 0.8
    # selection / co-occurrence artefacts
    assert model.cooccurrence_probas_.shape == (T, n, n)
    assert model.X_mean_.shape == (T, n, 2)
    # forecasting surfaces
    fp = model.forecast_probas_map_
    assert fp.shape == (n, n) and np.isfinite(fp).all()


def test_hdp_lpcm_smoke(community_net):
    Y, z_true = community_net
    model = DynamicNetworkHDPLPCM(n_iter=300, tune=150, burn=150,
                                  n_components=8, random_state=3).fit(Y)
    T, n, _ = Y.shape
    assert model.X_.shape == (T, n, 2)
    assert model.z_.shape == (T, n)
    assert np.isfinite(model.logps_).all()
    assert not np.isnan(model.betas_).any()
    # selection artefacts exist
    assert model.bic_.shape[1] == 4
    assert len(model.models_) == model.bic_.shape[0]
    assert model.counts_.min() >= 1
    assert model.cooccurrence_probas_.shape == (T, n, n)
    # geweke diagnostics stored
    assert hasattr(model, 'logp_geweke_')
    assert hasattr(model, 'intercept_geweke_')
    # posterior group count histograms
    assert len(model.posterior_group_counts_) == T


def test_logp_at_state_matches_sweep_logp(community_net):
    """The standalone log-joint evaluators (used for the stored init-row
    logp, reference lpcm.py:489 / hdp_lpcm.py:798-809) must reproduce the
    in-sweep logp when evaluated at the sweep's own final state."""
    import jax
    import jax.numpy as jnp
    from dynetlsm_tpu.mcmc.sweeps import (
        hdp_logp_at_state, lpcm_logp_at_state)

    Y, _ = community_net

    m = DynamicNetworkHDPLPCM(n_iter=30, tune=20, burn=20, n_components=5,
                              random_state=11).fit(Y)
    s = jax.tree.map(lambda x: x[0], m._final_state)
    Yd = jnp.asarray(m.Y_fit_, jnp.float32)
    prior = jnp.asarray(m.intercept_prior_, jnp.float32)
    lp = hdp_logp_at_state(
        m._cfg, Yd, prior, s.X, s.intercept, s.radii, s.z, s.mu, s.sigma,
        s.lmbda, s.weights, s.beta, s.gamma, s.alpha_init, s.alpha,
        s.kappa, s.mean_var, s.b_scale)
    np.testing.assert_allclose(float(lp), float(s.logp), rtol=1e-4)
    assert np.isfinite(m.logps_[0])
    # public method (reference hdp_lpcm.py:1188) routes through the same
    # evaluator with the fit's final hyperparameters
    lp_m = m.logp(s.X, s.intercept, s.mu, s.sigma, s.z, s.weights,
                  s.beta, s.lmbda)
    np.testing.assert_allclose(lp_m, float(s.logp), rtol=1e-4)

    p = DynamicNetworkLPCM(n_iter=30, tune=20, burn=20, n_components=3,
                           random_state=11).fit(Y)
    s = jax.tree.map(lambda x: x[0], p._final_state)
    Yd = jnp.asarray(p.Y_fit_, jnp.float32)
    prior = jnp.asarray(p.intercept_prior_, jnp.float32)
    lp = lpcm_logp_at_state(
        p._cfg, Yd, prior, s.X, s.intercept, s.radii, s.z, s.mu, s.sigma,
        s.lmbda, s.init_weights, s.trans_weights, s.mean_var, s.b_scale)
    np.testing.assert_allclose(float(lp), float(s.logp), rtol=1e-4)
    assert np.isfinite(p.logps_[0])
    lp_m = p.logp(s.X, s.intercept, s.mu, s.sigma, s.z, s.init_weights,
                  s.trans_weights, s.lmbda)
    np.testing.assert_allclose(lp_m, float(s.logp), rtol=1e-4)


def test_hdp_lpcm_set_best_model(community_net):
    Y, _ = community_net
    model = DynamicNetworkHDPLPCM(n_iter=150, tune=80, burn=80,
                                  n_components=6, random_state=5).fit(Y)
    model.set_best_model('bic')
    assert hasattr(model, 'best_k_')
    k = model.best_k_
    assert model.mu_.shape[0] == k
    assert model.trans_weights_.shape[1:] == (k, k)
    model.set_best_model('map')
    assert model.mu_.shape[0] == model.best_k_


def test_hdp_forecast_marginalized(community_net):
    Y, _ = community_net
    model = DynamicNetworkHDPLPCM(n_iter=100, tune=60, burn=60,
                                  n_components=6, random_state=7).fit(Y)
    n = Y.shape[1]
    fp = model.forecast_probas_marginalized_
    assert fp.shape == (n, n)
    assert np.isfinite(fp).all()
    assert (fp >= 0).all() and (fp <= 1).all()
    # posterior-predictive variant (reference hdp_lpcm.py:590-630)
    fpp = model.forecast_probas_pp_
    assert fpp.shape == (n, n)
    assert np.isfinite(fpp).all()
    assert (fpp > 0).all() and (fpp < 1).all()
    # both forecasters should broadly agree on which dyads are likely
    off = ~np.eye(n, dtype=bool)
    assert np.corrcoef(fp[off], fpp[off])[0, 1] > 0.5


def test_forecast_pp_rejects_directed():
    # the posterior-predictive forecaster is undirected-only (like the
    # reference); a directed fit must fail loudly, not silently drop radii
    model = DynamicNetworkHDPLPCM(is_directed=True)
    with pytest.raises(ValueError, match='undirected'):
        model.forecast_probas_pp_


def test_lpcm_thinning(community_net):
    Y, _ = community_net
    model = DynamicNetworkLPCM(n_iter=100, tune=50, burn=50, thin=2,
                               n_components=3, random_state=11).fit(Y)
    # ceil(200 / 2) = 100 stored samples
    assert model.Xs_.shape[0] == 100
    assert model.n_burn_ == 50
