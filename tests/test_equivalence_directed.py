"""Numerical-equivalence acceptance test for the *directed* social-radii
LSM on Sampson's monastery (SURVEY.md §7.5; reference
directed_likelihoods_fast.pyx:46-80, lsm.py:392-397).

Reference posterior statistics below were produced by running the actual
reference sampler with its Cython kernels replaced by exact NumPy shims
(``python scripts/reference_shim.py directed``, ~30 s on CPU)::

    DynamicNetworkLSM(n_iter=2000, tune=1000, burn=1000, is_directed=True,
                      random_state=42).fit(load_monks(is_directed=True))

    auc_                         = 0.8835
    posterior mean intercept_in  = 0.0446   (sd 0.0067)
    posterior mean intercept_out = -0.0003  (sd 0.0036)
    posterior mean log joint     = -365.625 (sd 7.682)
    posterior mean max radius    = 0.1217   (sd 0.0085)

The TPU sampler (different Markov kernel: chromatic two-phase node scan,
Dirichlet-MH radii) must land within MCMC error of these.
"""
import numpy as np
import pytest

from dynetlsm_tpu import DynamicNetworkLSM
from dynetlsm_tpu.datasets import load_monks

REF = {
    'auc': 0.8835,
    'intercept_in_mean': 0.0446,
    'intercept_in_sd': 0.0067,
    'intercept_out_mean': -0.0003,
    'intercept_out_sd': 0.0036,
    'logp_mean': -365.625,
    'logp_sd': 7.682,
    'radii_max_mean': 0.1217,
    'radii_max_sd': 0.0085,
}


def _check(model, nb, sd_mult=3.0):
    assert abs(model.auc_ - REF['auc']) < 0.05

    b = model.intercepts_.reshape(-1, 2)[nb:] if model.n_chains == 1 \
        else model.intercepts_[:, nb:].reshape(-1, 2)
    assert abs(b[:, 0].mean() - REF['intercept_in_mean']) \
        < sd_mult * REF['intercept_in_sd']
    assert abs(b[:, 1].mean() - REF['intercept_out_mean']) \
        < sd_mult * REF['intercept_out_sd']

    lp = model.logps_[nb:] if model.n_chains == 1 else model.logps_[:, nb:]
    assert abs(lp.mean() - REF['logp_mean']) < sd_mult * REF['logp_sd']

    radii = model.radiis_[nb:] if model.n_chains == 1 \
        else model.radiis_[:, nb:]
    r_max = radii.max(axis=-1).mean()
    assert abs(r_max - REF['radii_max_mean']) \
        < sd_mult * REF['radii_max_sd']


@pytest.mark.slow
def test_sampson_directed_lsm_posterior_matches_reference():
    Y, _, _ = load_monks(is_directed=True)
    model = DynamicNetworkLSM(n_iter=2000, tune=1000, burn=1000,
                              is_directed=True, random_state=42).fit(Y)
    _check(model, model.n_burn_)


def test_sampson_directed_lsm_posterior_fast():
    """Reduced-budget always-on variant: 4 chains x 2000 sweeps against the
    same reference statistics, so directed-path posterior drift fails the
    default tier."""
    Y, _, _ = load_monks(is_directed=True)
    model = DynamicNetworkLSM(n_iter=1000, tune=500, burn=500, n_chains=4,
                              is_directed=True, random_state=42).fit(Y)
    _check(model, model.n_burn_, sd_mult=4.0)
