"""Directed and missing-data paths of the mixture models."""
import numpy as np

from dynetlsm_tpu import DynamicNetworkHDPLPCM, DynamicNetworkLPCM
from dynetlsm_tpu.datasets import (
    simple_splitting_dynamic_network,
    synthetic_static_community_dynamic_network)


def test_hdp_directed_smoke():
    Y, _ = simple_splitting_dynamic_network(n_nodes=20, n_time_steps=2,
                                            is_directed=True, random_state=3)
    m = DynamicNetworkHDPLPCM(n_iter=60, tune=40, burn=40, n_components=5,
                              is_directed=True, random_state=1).fit(Y)
    T, n, _ = Y.shape
    assert m.X_.shape == (T, n, 2)
    assert m.radii_.shape == (n,)
    np.testing.assert_allclose(m.radii_.sum(), 1.0, rtol=1e-4)
    assert np.isfinite(m.logps_).all()
    assert hasattr(m, 'intercept_in_geweke_')
    assert m.auc_ > 0.5


def test_lpcm_missing_dyads():
    Y, X, z, intercept, probas, _ = \
        synthetic_static_community_dynamic_network(
            n_nodes=20, n_time_steps=2, n_groups=2,
            simulation_type='easy', random_state=5)
    Y = Y.astype(np.float64)
    Y[0, 0, 1] = Y[0, 1, 0] = -1
    Y[1, 2, 3] = Y[1, 3, 2] = -1
    m = DynamicNetworkLPCM(n_iter=40, tune=30, burn=30, n_components=2,
                           random_state=2).fit(Y)
    assert np.isfinite(m.logps_).all()
    assert hasattr(m, 'missings_')
    assert (m.Y_fit_ != -1).all()
