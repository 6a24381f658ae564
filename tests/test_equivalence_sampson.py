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

Regenerate with ``python scripts/reference_shim.py lsm`` (LSM, ~40 s on
CPU) / ``... hdp`` (HDP-LPCM, a few minutes) — the checked-in shim runner
reproduces these numbers exactly.

The TPU sampler must land within MCMC error of these.  A reduced-budget
variant runs in the default test tier so CI fails if the posterior drifts;
the full-budget runs keep the ``slow`` mark.
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


REF_HDP = {
    # reference DynamicNetworkHDPLPCM(n_iter=100000, tune=50000,
    # burn=50000, n_components=10, random_state=42) on undirected Sampson
    # — the notebook's full 200k-sweep budget, regenerated with
    # ``python scripts/reference_shim.py hdp 100000 50000 50000`` (~40 min
    # single-core): auc 0.8735, 3 selected groups, occupied-cluster
    # histogram mode at 3.  (The 3k-budget default run gives lambda
    # 0.8497 (0.0855), intercept 1.4022 (0.2948) — same conclusions.)
    'lambda_mean': 0.8489,
    'lambda_sd': 0.0849,
    'intercept_mean': 1.4487,
    'intercept_sd': 0.2804,
    'mode_clusters': 3,
}


@pytest.mark.slow
def test_sampson_hdp_posterior_matches_reference():
    from dynetlsm_tpu import DynamicNetworkHDPLPCM
    Y, _, _ = load_monks(is_directed=False)
    model = DynamicNetworkHDPLPCM(n_iter=3000, tune=1000, burn=1000,
                                  n_components=10, random_state=42).fit(Y)
    nb = model.n_burn_

    lam = np.ravel(model.lambdas_[nb:])
    assert abs(lam.mean() - REF_HDP['lambda_mean']) < 3 * REF_HDP['lambda_sd']

    b = model.intercepts_[nb:].mean()
    assert abs(b - REF_HDP['intercept_mean']) < 3 * REF_HDP['intercept_sd']

    vals, freqs = np.unique(model.counts_, return_counts=True)
    assert vals[np.argmax(freqs)] == REF_HDP['mode_clusters']
    assert model.auc_ > 0.75


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


def test_sampson_hdp_posterior_fast():
    """Reduced-budget always-on variant of the HDP equivalence test (4
    chains x 1600 sweeps, ~1 min on the CPU mesh), so HDP-LPCM posterior
    drift fails the default tier, not just the nightly slow tier (VERDICT
    round-2 item 1).  At this budget the occupied-cluster mode can land on
    4 instead of the full-budget 3 (extra clusters merge slowly), so the
    mode check admits both."""
    from dynetlsm_tpu import DynamicNetworkHDPLPCM
    Y, _, _ = load_monks(is_directed=False)
    model = DynamicNetworkHDPLPCM(n_iter=800, tune=400, burn=400, n_chains=4,
                                  n_components=10, random_state=42).fit(Y)
    nb = model.n_burn_

    lam = np.ravel(model.lambdas_[:, nb:])
    assert abs(lam.mean() - REF_HDP['lambda_mean']) < 4 * REF_HDP['lambda_sd']

    b = model.intercepts_[:, nb:].mean()
    assert abs(b - REF_HDP['intercept_mean']) < 4 * REF_HDP['intercept_sd']

    vals, freqs = np.unique(model.counts_, return_counts=True)
    assert vals[np.argmax(freqs)] in (REF_HDP['mode_clusters'],
                                      REF_HDP['mode_clusters'] + 1)
    assert model.auc_ > 0.75


def test_sampson_lsm_posterior_fast():
    """Reduced-budget always-on variant of the equivalence test: 4 chains x
    2000 sweeps (~1 min on the CPU mesh) against the same reference
    statistics, so posterior drift fails the default tier (VERDICT round-1
    item 3).  Reference numbers: scripts/reference_shim.py."""
    Y, _, _ = load_monks(is_directed=False)
    model = DynamicNetworkLSM(n_iter=1000, tune=500, burn=500, n_chains=4,
                              random_state=42).fit(Y)
    nb = model.n_burn_

    assert abs(model.auc_ - REF['auc']) < 0.05

    b_mean = model.intercepts_[:, nb:].mean()
    assert abs(b_mean - REF['intercept_mean']) < 3 * REF['intercept_sd']

    lp_mean = model.logps_[:, nb:].mean()
    assert abs(lp_mean - REF['logp_mean']) < 3 * REF['logp_sd']

    x_norm = np.linalg.norm(model.Xs_[:, nb:], axis=-1).mean()
    assert abs(x_norm - REF['x_norm_mean']) < 0.3
