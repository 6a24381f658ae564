"""Numerical-equivalence acceptance test for the LPCM on the simulated
community network (SURVEY.md §7.5 item 3).

Reference posterior statistics produced by the actual reference sampler
(NumPy-shimmed Cython kernels) with
``DynamicNetworkLPCM(n_iter=600, tune=300, burn=300, n_components=3,
random_state=7)`` on ``synthetic_static_community_dynamic_network(
n_nodes=40, n_time_steps=2, n_groups=3, simulation_type='easy',
random_state=42)``:

    auc_            = 0.9258, ARI(t=0) = 1.0
    lambda mean     = 0.8200 (sd 0.0819)
    intercept mean  = 2.0868 (sd 0.1321)
    sigma mean      = 0.4234
"""
import numpy as np
import pytest

from sklearn.metrics import adjusted_rand_score

from dynetlsm_tpu import DynamicNetworkLPCM
from dynetlsm_tpu.datasets import synthetic_static_community_dynamic_network

REF = {
    'lambda_mean': 0.8200, 'lambda_sd': 0.0819,
    'intercept_mean': 2.0868, 'intercept_sd': 0.1321,
    'sigma_mean': 0.4234,
}


@pytest.mark.slow
def test_lpcm_posterior_matches_reference():
    Y, X, z_true, intercept, probas, _ = \
        synthetic_static_community_dynamic_network(
            n_nodes=40, n_time_steps=2, n_groups=3,
            simulation_type='easy', random_state=42)
    m = DynamicNetworkLPCM(n_iter=600, tune=300, burn=300, n_components=3,
                           random_state=7).fit(Y)
    nb = m.n_burn_

    assert adjusted_rand_score(z_true[0], m.z_[0]) == 1.0
    assert m.auc_ > 0.88

    lam = np.ravel(m.lambdas_[nb:]).mean()
    assert abs(lam - REF['lambda_mean']) < 3 * REF['lambda_sd']

    b = m.intercepts_[nb:].mean()
    assert abs(b - REF['intercept_mean']) < 3 * REF['intercept_sd']

    sig = m.sigmas_[nb:].mean()
    assert abs(sig - REF['sigma_mean']) < 0.25


def test_lpcm_posterior_fast():
    """Reduced-budget always-on variant, so LPCM posterior drift fails the
    default tier (VERDICT round-2 item 1)."""
    Y, X, z_true, intercept, probas, _ = \
        synthetic_static_community_dynamic_network(
            n_nodes=40, n_time_steps=2, n_groups=3,
            simulation_type='easy', random_state=42)
    m = DynamicNetworkLPCM(n_iter=400, tune=200, burn=200, n_components=3,
                           random_state=7).fit(Y)
    nb = m.n_burn_

    assert adjusted_rand_score(z_true[0], m.z_[0]) > 0.9
    assert m.auc_ > 0.85

    lam = np.ravel(m.lambdas_[nb:]).mean()
    assert abs(lam - REF['lambda_mean']) < 4 * REF['lambda_sd']

    b = m.intercepts_[nb:].mean()
    assert abs(b - REF['intercept_mean']) < 4 * REF['intercept_sd']

    sig = m.sigmas_[nb:].mean()
    assert abs(sig - REF['sigma_mean']) < 0.3
