"""Numerical-equivalence acceptance test on Sampson's monastery
(SURVEY.md §7.5 item 1).

Reference posterior statistics below were produced by running the actual
reference sampler (joshloyal/dynetlsm, its Cython kernels replaced by exact
NumPy shims since Cython is unavailable in this image) with
``DynamicNetworkLSM(n_iter=2000, tune=1000, burn=1000, random_state=42)``
on ``load_monks(is_directed=False)``:

    auc_                        = 0.8624
    posterior mean intercept    = 1.6896   (sd 0.1786)
    posterior mean log joint    = -248.488 (sd 6.805)
    posterior mean ||X||        = 2.2358

The TPU sampler must land within MCMC error of these.
"""
import numpy as np
import pytest

from dynetlsm_tpu import DynamicNetworkLSM
from dynetlsm_tpu.datasets import load_monks

REF = {
    'auc': 0.8624,
    'intercept_mean': 1.6896,
    'intercept_sd': 0.1786,
    'logp_mean': -248.488,
    'logp_sd': 6.805,
    'x_norm_mean': 2.2358,
}


@pytest.mark.slow
def test_sampson_lsm_posterior_matches_reference():
    Y, _, _ = load_monks(is_directed=False)
    model = DynamicNetworkLSM(n_iter=2000, tune=1000, burn=1000,
                              random_state=42).fit(Y)
    nb = model.n_burn_

    assert abs(model.auc_ - REF['auc']) < 0.05

    b_mean = model.intercepts_[nb:].mean()
    assert abs(b_mean - REF['intercept_mean']) < 3 * REF['intercept_sd']

    lp_mean = model.logps_[nb:].mean()
    assert abs(lp_mean - REF['logp_mean']) < 3 * REF['logp_sd']

    x_norm = np.linalg.norm(model.Xs_[nb:], axis=-1).mean()
    assert abs(x_norm - REF['x_norm_mean']) < 0.3
