"""Case-control likelihood kernels: exactness in the full-control limit and
unbiasedness of control sampling.

Control sets are per-node index vectors shared across time steps with
per-time validity masks (a draw is valid at t when it is currently a
non-edge there) — conditioned on validity each valid draw is uniform over
that step's eligible non-edges, matching the reference's per-(t, i) draw
distribution (case_control_likelihood.py:75-111) while letting consumers
gather control positions as contiguous node trajectories.
"""
import numpy as np
import jax
import jax.numpy as jnp

from dynetlsm_tpu.ops.case_control import (
    build_edge_lists, sample_control_nodes, control_masks,
    control_valid_masks, approx_directed_partial_loglik,
    approx_directed_loglik_full)
from dynetlsm_tpu.ops.likelihoods import directed_loglik_full
from dynetlsm_tpu.ops.distances import pairwise_distances


def _directed_net(rng, T=2, n=15, d=2):
    X = rng.randn(T, n, d)
    Y = rng.binomial(1, 0.25, size=(T, n, n)).astype(np.float64)
    for t in range(T):
        np.fill_diagonal(Y[t], 0)
    radii = rng.dirichlet(np.ones(n))
    return X, Y, radii


def _all_others(n):
    """(n, n-1) control table enumerating every other node — with the
    per-time edge masks this makes every non-edge a valid control, the
    full-control limit."""
    base = np.arange(n)[None, :].repeat(n, axis=0)       # (n, n)
    keep = base != np.arange(n)[:, None]
    return jnp.asarray(base[keep].reshape(n, n - 1), jnp.int32)


def test_full_control_limit_matches_exact_loglik(rng):
    """With every other node as a control (masked to the current
    non-edges), the approximation becomes the exact log-likelihood."""
    X, Y, radii = _directed_net(rng)
    T, n, _ = Y.shape
    b_in, b_out = 0.3, 0.7

    lists = build_edge_lists(Y)
    ctrl = _all_others(n)
    valid = control_valid_masks(ctrl, jnp.asarray(lists['out_edges']))

    got = float(approx_directed_loglik_full(
        jnp.asarray(X, jnp.float32), jnp.asarray(radii, jnp.float32),
        jnp.asarray(lists['out_edges']), jnp.asarray(lists['degrees']),
        ctrl, valid, b_in, b_out))
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
    ctrl = _all_others(n)
    valid_out = control_valid_masks(ctrl, jnp.asarray(lists['out_edges']))
    valid_in = control_valid_masks(ctrl, jnp.asarray(lists['in_edges']))

    def cc_ll(Xa, x):
        return np.asarray(approx_directed_partial_loglik(
            jnp.asarray(Xa, jnp.float32), jnp.asarray(radii, jnp.float32),
            j, jnp.asarray(x, jnp.float32),
            jnp.asarray(lists['in_edges'][:, j]),
            jnp.asarray(lists['out_edges'][:, j]),
            jnp.asarray(lists['degrees'][:, j]),
            ctrl[j], ctrl[j], valid_in[:, j], valid_out[:, j],
            b_in, b_out))

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
    Yd = jnp.asarray(Y, jnp.float32)
    ctrl_in, ctrl_out = sample_control_nodes(jax.random.PRNGKey(2), Yd, m)
    lists = {k: jnp.asarray(v) for k, v in build_edge_lists(Y).items()}
    civ, cov = control_masks(ctrl_in, ctrl_out, lists, True)
    ctrl_in, ctrl_out = np.asarray(ctrl_in), np.asarray(ctrl_out)
    civ, cov = np.asarray(civ), np.asarray(cov)
    assert ctrl_in.shape == (n, m) and civ.shape == (T, n, m)
    for i in range(n):
        for k, c in enumerate(ctrl_out[i]):
            if c >= 0:
                assert c != i
                for t in range(T):
                    # valid exactly when currently a non-edge
                    assert cov[t, i, k] == (Y[t, i, c] == 0)
            else:
                assert not cov[:, i, k].any()
        for k, c in enumerate(ctrl_in[i]):
            if c >= 0:
                assert c != i
                for t in range(T):
                    assert civ[t, i, k] == (Y[t, c, i] == 0)


def test_control_estimate_unbiased(rng):
    """E over control draws of the approximation ~ the exact log-likelihood."""
    X, Y, radii = _directed_net(rng, n=20)
    b_in, b_out = 0.3, 0.7
    lists = build_edge_lists(Y)
    lists_d = {k: jnp.asarray(v) for k, v in lists.items()}
    Yd = jnp.asarray(Y, jnp.float32)

    dist = pairwise_distances(jnp.asarray(X, jnp.float32))
    want = float(directed_loglik_full(
        Yd, dist, jnp.asarray(radii, jnp.float32), b_in, b_out))

    keys = jax.random.split(jax.random.PRNGKey(3), 200)

    def one(k):
        _, ctrl_out = sample_control_nodes(k, Yd, 8)
        _, valid = control_masks(None, ctrl_out, lists_d, False)
        return approx_directed_loglik_full(
            jnp.asarray(X, jnp.float32), jnp.asarray(radii, jnp.float32),
            lists_d['out_edges'], lists_d['degrees'], ctrl_out, valid,
            b_in, b_out)

    draws = np.asarray(jax.vmap(one)(keys))
    # mean within ~2 std errors of the exact value
    se = draws.std() / np.sqrt(draws.shape[0])
    assert abs(draws.mean() - want) < 4 * se + 0.05 * abs(want) / 100


# ---------------------------------------------------------------------------
# undirected case-control (reference static_network_fast.pyx:47-94, which
# the reference ships but never wires into its Python layer)
# ---------------------------------------------------------------------------

def _undirected_net(rng, T=2, n=15, d=2):
    X = rng.randn(T, n, d)
    upper = rng.binomial(1, 0.3, size=(T, n, n)).astype(np.float64)
    Y = np.triu(upper, 1) + np.swapaxes(np.triu(upper, 1), 1, 2)
    return X, Y


def test_undirected_full_control_limit(rng):
    """With every non-edge as a control, the undirected approximation equals
    the exact undirected log-likelihood."""
    from dynetlsm_tpu.ops.case_control import (
        approx_undirected_loglik_full, approx_undirected_partial_loglik)
    from dynetlsm_tpu.ops.likelihoods import undirected_loglik_full

    X, Y = _undirected_net(rng)
    T, n, _ = Y.shape
    b = 0.8
    lists = build_edge_lists(Y)
    ctrl = _all_others(n)
    valid = control_valid_masks(ctrl, jnp.asarray(lists['out_edges']))

    got = float(approx_undirected_loglik_full(
        jnp.asarray(X, jnp.float32), jnp.asarray(lists['out_edges']),
        jnp.asarray(lists['degrees'][..., 1]), ctrl, valid, b))
    dist = pairwise_distances(jnp.asarray(X, jnp.float32))
    want = float(undirected_loglik_full(jnp.asarray(Y, jnp.float32), dist, b))
    np.testing.assert_allclose(got, want, rtol=1e-4)

    # per-node delta matches the exact delta
    j = 3
    X2 = X.copy()
    X2[:, j] += 0.15

    def cc_ll(x):
        return np.asarray(approx_undirected_partial_loglik(
            jnp.asarray(X, jnp.float32), jnp.asarray(x, jnp.float32),
            jnp.asarray(lists['out_edges'][:, j]),
            jnp.asarray(lists['degrees'][:, j, 1]), ctrl[j], valid[:, j],
            b))

    delta_cc = (cc_ll(X2[:, j]) - cc_ll(X[:, j])).sum()

    def full(Xa):
        d_ = pairwise_distances(jnp.asarray(Xa, jnp.float32))
        return float(undirected_loglik_full(jnp.asarray(Y, jnp.float32),
                                            d_, b))

    np.testing.assert_allclose(delta_cc, full(X2) - full(X), atol=5e-3)


def test_edge_lists_device_matches_host(rng):
    """The in-device top-k edge-list rebuild reproduces the host builder."""
    from dynetlsm_tpu.ops.case_control import edge_lists_device

    _, Y, _ = _directed_net(rng, n=17)
    host = build_edge_lists(Y)
    max_deg = host['out_edges'].shape[-1]
    dev = jax.jit(edge_lists_device, static_argnums=1)(
        jnp.asarray(Y, jnp.float32), max(max_deg,
                                         host['in_edges'].shape[-1]))

    np.testing.assert_array_equal(np.asarray(dev['degrees']),
                                  host['degrees'])
    # same index sets per row (host lists are ascending; device lists come
    # from top_k which also breaks ties by lowest index)
    T, n = Y.shape[:2]
    for name in ('in_edges', 'out_edges'):
        got = np.asarray(dev[name])
        want = host[name]
        for t in range(T):
            for i in range(n):
                g = sorted(got[t, i][got[t, i] >= 0].tolist())
                w = sorted(want[t, i][want[t, i] >= 0].tolist())
                assert g == w, (name, t, i)


def test_lsm_fit_undirected_case_control(rng):
    """End-to-end undirected LSM fit with the case-control likelihood."""
    from dynetlsm_tpu import DynamicNetworkLSM
    from dynetlsm_tpu.datasets import simple_splitting_dynamic_network

    Y, _ = simple_splitting_dynamic_network(n_nodes=24, n_time_steps=2,
                                            random_state=3)
    model = DynamicNetworkLSM(n_iter=40, tune=40, burn=40, n_control=8,
                              n_resample_control=10, random_state=1).fit(Y)
    assert model.X_.shape == (2, 24, 2)
    assert np.isfinite(model.logps_).all()
    assert model.auc_ > 0.5


def test_init_logp_uses_cc_estimator(rng):
    """The stored initial-sample logp must use the same (case-control)
    network estimator as the in-sweep trace logps — one consistent series
    for MAP selection (the reference's logp also switches to the CC
    approximation when the sampler is active, lsm.py:581-591)."""
    from dynetlsm_tpu.models.base import init_cc_dict
    from dynetlsm_tpu.mcmc.sweeps import (
        SweepConfig, _lsm_logp, _network_loglik)

    T, n, m = 2, 20, 6
    Y = np.zeros((T, n, n))
    for t in range(T):
        upper = rng.uniform(size=(n, n)) < 0.3
        upper = np.triu(upper, k=1)
        Y[t] = upper + upper.T
    Yd = jnp.asarray(Y, jnp.float32)
    X = jnp.asarray(rng.randn(T, n, 2), jnp.float32)
    b = jnp.asarray([0.5], jnp.float32)

    cfg = SweepConfig(is_directed=False, sample_missing=False, tune=0,
                      tune_interval=100, n_burn=0,
                      intercept_variance_prior=2.0,
                      n_control=m, n_resample_control=10)
    lists = build_edge_lists(Y)
    cc_static = {k: jnp.asarray(v) for k, v in lists.items()}
    ctrl0 = sample_control_nodes(jax.random.PRNGKey(0), Yd, m,
                                 directed=False)
    cc0 = init_cc_dict(cfg, Yd, cc_static, ctrl0)

    dist = pairwise_distances(X)
    prior = jnp.zeros(1, jnp.float32)
    with_cc = float(_lsm_logp(cfg, Yd, X, b, None, dist, prior, cc=cc0))
    dense = float(_lsm_logp(cfg, Yd, X, b, None, dist, prior))
    # the network term really is the CC estimator, not the dense loglik
    net_cc = float(_network_loglik(cfg, Yd, dist, b, None, X=X, cc=cc0))
    net_dense = float(_network_loglik(cfg, Yd, dist, b, None))
    assert with_cc != dense
    assert np.isclose(with_cc - net_cc, dense - net_dense, atol=1e-4)


def test_lsm_fit_case_control_with_missing(rng):
    """Case-control + Gibbs-resampled missing dyads (the round-1
    NotImplementedError): edge lists are rebuilt in-device each sweep."""
    from dynetlsm_tpu import DynamicNetworkLSM
    from dynetlsm_tpu.datasets import simple_splitting_dynamic_network

    Y, _ = simple_splitting_dynamic_network(n_nodes=24, n_time_steps=2,
                                            random_state=3)
    Y = Y.astype(np.float64)
    miss = rng.uniform(size=Y.shape) < 0.08
    miss |= np.swapaxes(miss, 1, 2)
    for t in range(Y.shape[0]):
        np.fill_diagonal(miss[t], False)
    Y[miss] = -1

    model = DynamicNetworkLSM(n_iter=40, tune=40, burn=40, n_control=8,
                              n_resample_control=10, random_state=1).fit(Y)
    assert model.X_.shape == (2, 24, 2)
    assert np.isfinite(model.logps_).all()


def test_lsm_fit_case_control_parallel_update(rng):
    """Case-control + stale-field parallel latent updates (the round-1
    NotImplementedError in mcmc/latent.py)."""
    from dynetlsm_tpu import DynamicNetworkLSM
    from dynetlsm_tpu.datasets import simple_splitting_dynamic_network

    Y, _ = simple_splitting_dynamic_network(n_nodes=24, n_time_steps=2,
                                            random_state=3)
    model = DynamicNetworkLSM(n_iter=40, tune=40, burn=40, n_control=8,
                              n_resample_control=10, random_state=1,
                              latent_update='parallel').fit(Y)
    assert model.X_.shape == (2, 24, 2)
    assert np.isfinite(model.logps_).all()
    assert float(np.asarray(model.Xs_).std()) > 0


def test_control_redraw_cadence(rng):
    """Control sets are redrawn exactly on the resampling cadence — the
    scan runner's scalar iteration hint gates the redraw behind a real
    lax.cond (reference CaseControlSampler.resample cadence,
    case_control_likelihood.py:27-33)."""
    from dynetlsm_tpu.config import DTYPE
    from dynetlsm_tpu.mcmc.states import LSMState
    from dynetlsm_tpu.mcmc.sweeps import SweepConfig, make_lsm_sweep
    from dynetlsm_tpu.mcmc.driver import (
        make_scan_runner, collect_traces, replicate_state)
    from dynetlsm_tpu.models.base import build_case_control

    T, n, d = 2, 16, 2
    Y = rng.binomial(1, 0.3, size=(T, n, n)).astype(np.float64)
    Y = np.triu(Y, 1)
    Y = Y + Y.transpose(0, 2, 1)
    Y_dev = jnp.asarray(Y, jnp.float32)

    cfg = SweepConfig(n_control=5, n_resample_control=3)
    cc_static, ctrl0 = build_case_control(cfg, Y_dev, Y, rng)
    sweep = make_lsm_sweep(Y_dev, None, np.zeros(1, np.float32), cfg,
                           cc_static=cc_static)

    X0 = jnp.asarray(rng.randn(T, n, d), DTYPE)
    state0 = LSMState(
        key=jax.random.PRNGKey(0), it=np.zeros((), np.int32),
        X=X0, intercept=jnp.ones(1, DTYPE), radii=None, Y=None,
        step_X=jnp.full((T, n), 0.1, DTYPE), acc_X=jnp.zeros((T, n), DTYPE),
        step_int=jnp.full((1,), 0.1, DTYPE), acc_int=jnp.zeros((1,), DTYPE),
        step_radii=None, acc_radii=None,
        logp=jnp.zeros((), DTYPE), logp_map=jnp.zeros((), DTYPE),
        X_map=X0, intercept_map=jnp.ones(1, DTYPE), radii_map=None,
        logp_ref=jnp.zeros((), DTYPE), X_ref=X0, missing_sum=None,
        ctrl_in=ctrl0[0], ctrl_out=ctrl0[1])
    state = replicate_state(state0, 2, jax.random.PRNGKey(1))

    runner = make_scan_runner(sweep, lambda s: {'ctrl': s.ctrl_out},
                              chunk=16)
    _, traces = collect_traces(runner, state, 8, chunk=16)
    ctrl = np.asarray(traces['ctrl'])            # (8, 2, n, 5)
    assert ctrl.shape == (8, 2, n, 5)

    # sample s is produced with iteration hint s (pre-increment counter):
    # redraws land exactly on s % 3 == 0, everything else keeps the set
    for s in range(1, 8):
        changed = not np.array_equal(ctrl[s], ctrl[s - 1])
        assert changed == (s % 3 == 0), s
    # chains SHARE each redraw window's control set (chain-invariant key):
    # one surrogate posterior across chains — valid cross-chain R-hat —
    # and shared-index gathers in the samplers (10x faster than per-chain
    # batched-index gathers)
    assert np.array_equal(ctrl[3, 0], ctrl[3, 1])
    # successive redraw windows use different sets
    assert not np.array_equal(ctrl[3, 0], ctrl[6, 0])
