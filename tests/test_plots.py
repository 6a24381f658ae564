"""Smoke tests of the plotting layer (Agg backend, no display)."""
import matplotlib
matplotlib.use('Agg')

import numpy as np
import matplotlib.pyplot as plt
import pytest

from dynetlsm_tpu import DynamicNetworkLSM, DynamicNetworkLPCM
from dynetlsm_tpu.datasets import synthetic_static_community_dynamic_network
from dynetlsm_tpu import plots


@pytest.fixture(scope='module')
def fitted_models():
    Y, X, z, intercept, probas, _ = \
        synthetic_static_community_dynamic_network(
            n_nodes=25, n_time_steps=2, n_groups=3,
            simulation_type='easy', random_state=42)
    lsm = DynamicNetworkLSM(n_iter=30, tune=30, burn=30,
                            random_state=1).fit(Y)
    lpcm = DynamicNetworkLPCM(n_iter=30, tune=30, burn=30, n_components=3,
                              random_state=1).fit(Y)
    return Y, z, lsm, lpcm


def test_plot_traces(fitted_models):
    _, _, lsm, lpcm = fitted_models
    # trace + marginal-density (KDE) + autocorrelation columns, as in the
    # reference's plot_traces panels (reference plots.py:175-397)
    fig, axes = plots.plot_traces(lsm)
    assert axes.shape[1] == 3
    plt.close(fig)
    fig, axes = plots.plot_traces(lpcm)
    assert axes.shape[1] == 3
    plt.close(fig)


def test_kde_curve_integrates_to_one():
    rng = np.random.RandomState(0)
    grid, dens = plots._kde_curve(rng.randn(500))
    assert abs(np.trapezoid(dens, grid) - 1.0) < 1e-2
    # degenerate (constant) chains must not divide by zero
    grid, dens = plots._kde_curve(np.full(10, 3.0))
    assert np.isfinite(dens).all()


def test_plot_latent_space(fitted_models):
    _, _, lsm, lpcm = fitted_models
    fig, ax = plots.plot_latent_space(lsm, t=0)
    plt.close(fig)
    fig, ax = plots.plot_latent_space(lpcm, t=1, node_names=[
        'n%d' % i for i in range(lpcm.X_.shape[1])])
    plt.close(fig)


def test_matrix_plots(fitted_models):
    Y, z, _, lpcm = fitted_models
    fig, _ = plots.plot_adjacency_matrix(Y[0], z[0])
    plt.close(fig)
    fig, _ = plots.plot_probability_matrix(lpcm.probas_[0], lpcm.z_[0])
    plt.close(fig)
    fig, _ = plots.plot_posterior_cooccurrence(lpcm, t=0)
    plt.close(fig)


def test_transition_and_alluvial(fitted_models):
    _, z, _, lpcm = fitted_models
    fig, _ = plots.plot_transition_probabilities(lpcm)
    plt.close(fig)
    fig, ax = plots.alluvial_plot(z)
    plt.close(fig)
    fig, ax = plots.alluvial_plot(lpcm.zs_[-50:][::25].reshape(2, -1)[
        :, :lpcm.z_.shape[1]])
    plt.close(fig)


def test_posterior_counts_hdp():
    from dynetlsm_tpu import DynamicNetworkHDPLPCM
    Y, X, z, intercept, probas, _ = \
        synthetic_static_community_dynamic_network(
            n_nodes=20, n_time_steps=2, n_groups=2,
            simulation_type='easy', random_state=5)
    m = DynamicNetworkHDPLPCM(n_iter=30, tune=30, burn=30, n_components=5,
                              random_state=2).fit(Y)
    fig, _ = plots.plot_posterior_counts(m, t=0)
    plt.close(fig)
    fig, _ = plots.plot_traces(m)
    plt.close(fig)


def test_palette_and_arrow_helpers():
    """get_husl / arrow_patch parity helpers (reference plots.py:63, 526)."""
    import numpy as np
    import matplotlib.pyplot as plt
    from dynetlsm_tpu.plots import get_husl, arrow_patch, get_colors

    pal = get_husl(25)
    assert pal.shape == (25,) and all(c.startswith('#') for c in pal)
    # > 20 groups routes through the husl palette
    assert get_colors(np.arange(25)).shape[0] == 25

    fig, ax = plt.subplots()
    arrow = arrow_patch((0.0, 0.0), (1.0, 1.0), 60, 120, ax, color='k')
    assert arrow in ax.patches
    plt.close(fig)
