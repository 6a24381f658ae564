"""Community-splitting recovery — the HDP-LPCM's headline scenario
(SURVEY.md §7.5 item 4; reference notebooks/Synthetic Network).

At a 10k-sweep budget on the TPU the model recovers the 2 -> 4 split
exactly (ARI 1.0 at every time step, groups [2, 2, 4, 4]); this gated test
uses a reduced budget and a looser bar so it stays CI-sized.
"""
import numpy as np
import pytest

from sklearn.metrics import adjusted_rand_score

from dynetlsm_tpu import DynamicNetworkHDPLPCM
from dynetlsm_tpu.datasets import simple_splitting_dynamic_network


@pytest.mark.slow
def test_hdp_recovers_community_split():
    Y, z_true = simple_splitting_dynamic_network(n_nodes=50, n_time_steps=4,
                                                 random_state=42)
    m = DynamicNetworkHDPLPCM(n_iter=3000, tune=1500, burn=1500,
                              n_components=10, random_state=123).fit(Y)
    T = Y.shape[0]
    aris = [adjusted_rand_score(z_true[t], m.z_[t]) for t in range(T)]
    assert np.mean(aris) > 0.8, aris
    # the split itself: fewer groups early than late
    n_early = len(set(m.z_[0].tolist()))
    n_late = len(set(m.z_[-1].tolist()))
    assert n_early < n_late, (n_early, n_late)


def test_hdp_recovers_community_split_fast():
    """Reduced-budget always-on variant of the split-recovery scenario, so
    regressions in the headline capability fail the default tier
    (VERDICT round-2 item 1)."""
    Y, z_true = simple_splitting_dynamic_network(n_nodes=50, n_time_steps=4,
                                                 random_state=42)
    m = DynamicNetworkHDPLPCM(n_iter=800, tune=400, burn=400,
                              n_components=10, random_state=123).fit(Y)
    T = Y.shape[0]
    aris = [adjusted_rand_score(z_true[t], m.z_[t]) for t in range(T)]
    assert np.mean(aris) > 0.6, aris
    n_early = len(set(m.z_[0].tolist()))
    n_late = len(set(m.z_[-1].tolist()))
    assert n_early < n_late, (n_early, n_late)
