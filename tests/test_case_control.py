"""Case-control likelihood kernels: exactness in the full-control limit and
unbiasedness of control sampling."""
import numpy as np
import jax
import jax.numpy as jnp

from dynetlsm_tpu.ops.case_control import (
    build_edge_lists, sample_control_nodes,
    approx_directed_partial_loglik, approx_directed_loglik_full)
from dynetlsm_tpu.ops.likelihoods import directed_loglik_full
from dynetlsm_tpu.ops.distances import pairwise_distances


def _directed_net(rng, T=2, n=15, d=2):
    X = rng.randn(T, n, d)
    Y = rng.binomial(1, 0.25, size=(T, n, n)).astype(np.float64)
    for t in range(T):
        np.fill_diagonal(Y[t], 0)
    radii = rng.dirichlet(np.ones(n))
    return X, Y, radii


def test_full_control_limit_matches_exact_loglik(rng):
    """With n_control = n - 1 every non-edge is a control, so the
    approximation becomes the exact log-likelihood."""
    X, Y, radii = _directed_net(rng)
    T, n, _ = Y.shape
    b_in, b_out = 0.3, 0.7

    lists = build_edge_lists(Y)
    ctrl_in, ctrl_out = sample_control_nodes(
        jax.random.PRNGKey(0), jnp.asarray(Y, jnp.float32), n - 1)

    got = float(approx_directed_loglik_full(
        jnp.asarray(X, jnp.float32), jnp.asarray(radii, jnp.float32),
        jnp.asarray(lists['out_edges']), jnp.asarray(lists['degrees']),
        ctrl_out, b_in, b_out))
    dist = pairwise_distances(jnp.asarray(X, jnp.float32))
    want = float(directed_loglik_full(
        jnp.asarray(Y, jnp.float32), dist, jnp.asarray(radii, jnp.float32),
        b_in, b_out))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_partial_full_control_limit(rng):
    """Per-node approximation with all controls equals the exact per-node
    delta used by the Metropolis update."""
    X, Y, radii = _directed_net(rng)
    T, n, _ = Y.shape
    j = 4
    b_in, b_out = 0.3, 0.7
    X2 = X.copy()
    X2[:, j] += 0.2

    lists = build_edge_lists(Y)
    ctrl_in, ctrl_out = sample_control_nodes(
        jax.random.PRNGKey(1), jnp.asarray(Y, jnp.float32), n - 1)

    def cc_ll(Xa, x):
        return np.asarray(approx_directed_partial_loglik(
            jnp.asarray(Xa, jnp.float32), jnp.asarray(radii, jnp.float32),
            j, jnp.asarray(x, jnp.float32),
            jnp.asarray(lists['in_edges'][:, j]),
            jnp.asarray(lists['out_edges'][:, j]),
            jnp.asarray(lists['degrees'][:, j]),
            ctrl_in[:, j], ctrl_out[:, j], b_in, b_out))

    delta_cc = (cc_ll(X, X2[:, j]) - cc_ll(X, X[:, j])).sum()

    def full(Xa):
        dist = pairwise_distances(jnp.asarray(Xa, jnp.float32))
        return float(directed_loglik_full(
            jnp.asarray(Y, jnp.float32), dist,
            jnp.asarray(radii, jnp.float32), b_in, b_out))

    delta_full = full(X2) - full(X)
    np.testing.assert_allclose(delta_cc, delta_full, atol=5e-3)


def test_control_nodes_are_valid_nonedges(rng):
    X, Y, radii = _directed_net(rng, n=20)
    T, n, _ = Y.shape
    m = 6
    ctrl_in, ctrl_out = sample_control_nodes(
        jax.random.PRNGKey(2), jnp.asarray(Y, jnp.float32), m)
    ctrl_in, ctrl_out = np.asarray(ctrl_in), np.asarray(ctrl_out)
    assert ctrl_in.shape == (T, n, m)
    for t in range(T):
        for i in range(n):
            for j in ctrl_out[t, i]:
                if j >= 0:
                    assert j != i and Y[t, i, j] == 0
            for j in ctrl_in[t, i]:
                if j >= 0:
                    assert j != i and Y[t, j, i] == 0
            # draws are distinct (without replacement)
            vals = ctrl_out[t, i][ctrl_out[t, i] >= 0]
            assert len(set(vals.tolist())) == vals.shape[0]


def test_control_estimate_unbiased(rng):
    """E over control draws of the approximation ~ the exact log-likelihood."""
    X, Y, radii = _directed_net(rng, n=20)
    b_in, b_out = 0.3, 0.7
    lists = build_edge_lists(Y)

    dist = pairwise_distances(jnp.asarray(X, jnp.float32))
    want = float(directed_loglik_full(
        jnp.asarray(Y, jnp.float32), dist, jnp.asarray(radii, jnp.float32),
        b_in, b_out))

    keys = jax.random.split(jax.random.PRNGKey(3), 200)

    def one(k):
        _, ctrl_out = sample_control_nodes(k, jnp.asarray(Y, jnp.float32), 8)
        return approx_directed_loglik_full(
            jnp.asarray(X, jnp.float32), jnp.asarray(radii, jnp.float32),
            jnp.asarray(lists['out_edges']), jnp.asarray(lists['degrees']),
            ctrl_out, b_in, b_out)

    draws = np.asarray(jax.vmap(one)(keys))
    # mean within ~2 std errors of the exact value
    se = draws.std() / np.sqrt(draws.shape[0])
    assert abs(draws.mean() - want) < 4 * se + 0.05 * abs(want) / 100
