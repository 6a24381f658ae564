"""Unit tests for host utilities: imputer, metrics, train/test split,
network statistics, diagnostics, datasets."""
import numpy as np
import pytest

from dynetlsm_tpu.imputer import SimpleNetworkImputer
from dynetlsm_tpu.metrics import (
    network_auc, out_of_sample_auc, variation_of_information)
from dynetlsm_tpu.model_selection import train_test_split
from dynetlsm_tpu.network_statistics import (
    density, modularity, connected_nodes)
from dynetlsm_tpu.diagnostics import (
    effective_n, geweke_diag, potential_scale_reduction)
from dynetlsm_tpu.datasets import (
    simple_splitting_dynamic_network, merging_dynamic_network,
    merging_block_model, homogeneous_simulation, inhomogeneous_simulation,
    synthetic_dynamic_network, detection_limit_simulation, load_monks)


def test_imputer_most_frequent(rng):
    Y = rng.binomial(1, 0.8, size=(2, 10, 10)).astype(float)
    Y[0, 1, 2] = -1
    out = SimpleNetworkImputer(strategy='most_frequent').fit_transform(Y)
    assert out[0, 1, 2] == 1.0  # mode of a dense network
    assert (out != -1).all()


def test_imputer_random_symmetric(rng):
    Y = rng.binomial(1, 0.3, size=(2, 12, 12)).astype(float)
    Y = np.triu(Y, 1) + np.transpose(np.triu(Y, 1), (0, 2, 1))
    Y[0, 1, 2] = Y[0, 2, 1] = -1
    out = SimpleNetworkImputer(strategy='random').fit_transform(Y)
    assert (out != -1).all()
    np.testing.assert_allclose(out, np.transpose(out, (0, 2, 1)))


def test_train_test_split_masks_fraction(rng):
    Y = rng.binomial(1, 0.5, size=(3, 20, 20)).astype(float)
    Y = np.triu(Y, 1) + np.transpose(np.triu(Y, 1), (0, 2, 1))
    Y_masked, test_idx = train_test_split(Y, test_size=0.1, random_state=0)
    n_dyads = 20 * 19 // 2
    assert test_idx.sum() == 3 * int(np.ceil(0.1 * n_dyads))
    # masked entries are symmetric -1s
    np.testing.assert_allclose(Y_masked, np.transpose(Y_masked, (0, 2, 1)))


def test_network_auc_perfect():
    Y = np.zeros((1, 4, 4))
    Y[0, 0, 1] = Y[0, 1, 0] = 1
    P = np.full((1, 4, 4), 0.1)
    P[0, 0, 1] = P[0, 1, 0] = 0.9
    assert network_auc(Y, P) == 1.0


def test_posterior_mean_probas_single_sample_matches_formula(rng):
    """With one stored draw the posterior mean IS that draw's probability
    matrix — checks the undirected and directed (social-radii) formulas."""
    from scipy.special import expit
    from dynetlsm_tpu.metrics import posterior_mean_probas

    class Stub:
        n_chains = 1
        n_burn_ = 0

    T, n, d = 2, 6, 2
    X = rng.randn(1, T, n, d)
    dist = np.sqrt(((X[0][:, :, None] - X[0][:, None]) ** 2).sum(-1))

    m = Stub()
    m.is_directed = False
    m.Xs_, m.intercepts_ = X, np.array([[1.3]])
    expected = expit(1.3 - dist)
    for t in range(T):
        np.fill_diagonal(expected[t], 0.0)
    np.testing.assert_allclose(posterior_mean_probas(m), expected,
                               rtol=1e-6)

    m = Stub()
    m.is_directed = True
    m.Xs_, m.intercepts_ = X, np.array([[0.7, 0.4]])
    r = rng.dirichlet(np.ones(n))
    m.radiis_ = r[None]
    eta = (0.7 * (1 - dist / r[None, None, :])
           + 0.4 * (1 - dist / r[None, :, None]))
    expected = expit(eta)
    for t in range(T):
        np.fill_diagonal(expected[t], 0.0)
    np.testing.assert_allclose(posterior_mean_probas(m), expected,
                               rtol=1e-6)


def test_variation_of_information():
    z = np.array([0, 0, 1, 1])
    assert variation_of_information(z, z) == pytest.approx(0.0, abs=1e-12)
    z2 = np.array([0, 1, 0, 1])
    assert variation_of_information(z, z2) > 0


def test_density_and_modularity():
    Y = np.zeros((1, 4, 4))
    Y[0, 0, 1] = Y[0, 1, 0] = 1
    Y[0, 2, 3] = Y[0, 3, 2] = 1
    assert density(Y) == pytest.approx(2 / 6)
    z = np.array([[0, 0, 1, 1]])
    # perfectly assortative partition has positive modularity
    assert modularity(Y, z) > 0.3


def test_connected_nodes():
    Y = np.zeros((5, 5))
    Y[0, 1] = Y[1, 0] = 1
    Y[2, 3] = Y[3, 2] = 1
    mask = connected_nodes(Y)
    assert mask.dtype == bool and mask[:4].all() and not mask[4]


def test_effective_n_iid(rng):
    x = rng.randn(2000)
    assert effective_n(x) > 1000


def test_effective_n_clamped_to_n(rng):
    # strongly anti-correlated trace: 1 + 2 sum(rho) <= 0 without the clamp,
    # which used to report astronomically inflated ESS (n / 1e-8)
    x = np.tile([1.0, -1.0], 200) + 0.01 * rng.randn(400)
    ess = effective_n(x)
    assert 0 < ess <= x.shape[0]


def test_geweke_stationary(rng):
    x = rng.randn(2000)
    z, p = geweke_diag(x)
    assert abs(z) < 4


def test_rhat_mixed_vs_stuck(rng):
    good = rng.randn(4, 500)
    assert potential_scale_reduction(good) < 1.1
    bad = rng.randn(4, 500) + np.arange(4)[:, None] * 5
    assert potential_scale_reduction(bad) > 2.0


def test_generators_shapes():
    Y, z = simple_splitting_dynamic_network(n_nodes=20, n_time_steps=4,
                                            random_state=0)
    assert Y.shape == (4, 20, 20) and z.shape == (4, 20)
    np.testing.assert_allclose(Y, np.transpose(Y, (0, 2, 1)))

    Y, X, z, b, probas, mus, sig = merging_dynamic_network(
        n_nodes=15, n_time_steps=4, random_state=0)
    assert Y.shape == (4, 15, 15)

    Y, z = merging_block_model(n_nodes=16, n_time_steps=3, random_state=0)
    assert Y.shape == (3, 16, 16) and z.shape == (3, 16)

    out = homogeneous_simulation(n_nodes=20, n_time_steps=3, random_state=0)
    assert out[0].shape == (3, 20, 20)

    out = inhomogeneous_simulation(n_nodes=20, random_state=0)
    assert out[0].shape == (10, 20, 20)
    # community counts follow the 2 -> 6 -> 4 regime plan
    z = out[2]
    assert len(np.unique(z[0])) <= 2
    assert len(np.unique(z[-1])) <= 4

    out = synthetic_dynamic_network(n_nodes=20, n_time_steps=9,
                                    random_state=0)
    assert out[0].shape[1:] == (20, 20)

    Y, X, z, probas, r, mus = detection_limit_simulation(
        n_nodes=20, n_time_steps=3, random_state=0)
    assert Y.shape == (3, 20, 20)
    assert 0 < r < 1.5


def test_directed_generator():
    Y, z = simple_splitting_dynamic_network(n_nodes=20, n_time_steps=2,
                                            is_directed=True, random_state=0)
    assert not np.allclose(Y, np.transpose(Y, (0, 2, 1)))
    assert np.all(np.diagonal(Y, axis1=1, axis2=2) == 0)


def test_load_monks_static():
    Y, groups = load_monks(dynamic=False, is_directed=False)
    assert Y.shape == (18, 18)
    assert groups.shape == (18,)


def test_got_edgelist_loaders():
    from dynetlsm_tpu.datasets import load_got_edgelists, network_from_edgelist

    data = load_got_edgelists()
    assert set(data.columns) == {'source', 'target', 'season', 'weight'}
    assert (data['weight'] >= 1).all()

    edges = np.array([[0, 1], [1, 2], [1, 2]])
    A = network_from_edgelist(edges, 4)
    assert A.shape == (4, 4)
    assert np.array_equal(A, A.T)
    assert A[0, 1] == 1 and A[2, 1] == 1 and A[3].sum() == 0
