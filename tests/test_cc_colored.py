"""Exact chromatic case-control scan (mcmc/latent.cc_colored_scan).

The colored scan replaces the reference's O(n) sequential case-control
node sweep (sample_latent_positions.py:92-146 over
case_control_likelihood.py structures) with O(n_colors) vectorised class
updates (union coloring across time: each node's whole trajectory in one
class, so control positions gather as contiguous node trajectories).
Exactness is established constructively:

* with singleton color classes in index order it is BIT-IDENTICAL to the
  sequential ``xla_exact_scan`` under the same proposal stream;
* with proper classes it is BIT-IDENTICAL to itself with the classes
  split into singletons in the same order — i.e. the simultaneous
  within-class update really has no cross-site dependencies, so it equals
  sequential execution and inherits the sequential kernel's exactness.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dynetlsm_tpu.ops.case_control import (
    build_edge_lists, color_conflict_graph, sample_controls_colored,
    control_masks)
from dynetlsm_tpu.mcmc.latent import cc_colored_scan, xla_exact_scan


def _net(rng, T=3, n=20, directed=True, p=0.2):
    X = rng.randn(T, n, 2).astype(np.float32)
    Y = rng.binomial(1, p, size=(T, n, n)).astype(np.float32)
    if not directed:
        Y = np.triu(Y, 1)
        Y = Y + np.swapaxes(Y, 1, 2)
    for t in range(T):
        np.fill_diagonal(Y[t], 0)
    radii = rng.dirichlet(np.ones(n)).astype(np.float32)
    return X, Y, radii


def _structures(rng, Y, m, directed, seed=1):
    n = Y.shape[1]
    lists_h = build_edge_lists(Y)
    lists = {k: jnp.asarray(v) for k, v in lists_h.items()}
    colors, groups = color_conflict_graph(lists_h, n, seed=seed)
    ci, co = sample_controls_colored(jax.random.PRNGKey(seed),
                                     jnp.asarray(colors), n, m,
                                     directed=directed)
    civ, cov = control_masks(ci, co, lists, directed)
    cc = dict(lists, ctrl_out=co, ctrl_out_valid=cov)
    if directed:
        cc['ctrl_in'] = ci
        cc['ctrl_in_valid'] = civ
    return cc, colors, groups


def _noise(rng, T, n, d=2):
    eps = jnp.asarray(rng.randn(2, n, T, d), jnp.float32)
    log_u = jnp.asarray(np.log(rng.uniform(size=(2, n, T))), jnp.float32)
    return eps, log_u


def _singleton_groups(T, n):
    """(n, 1) groups: node j is its own class, classes in index order —
    the sequential scan's visit order."""
    del T
    return jnp.asarray(np.arange(n, dtype=np.int32)[:, None])


def test_coloring_and_controls_valid(rng):
    X, Y, _ = _net(rng, n=24)
    T, n = Y.shape[:2]
    lists_h = build_edge_lists(Y)
    colors, groups = color_conflict_graph(lists_h, n, seed=0)
    assert colors.shape == (n,)
    # proper coloring of the (symmetrized, across-time) edge graph
    t_, i_, j_ = np.nonzero(Y + np.swapaxes(Y, 1, 2))
    assert (colors[i_] != colors[j_]).all()
    # groups is a partition of the nodes
    members = np.sort(groups[groups >= 0])
    np.testing.assert_array_equal(members, np.arange(n))
    # balanced: padded work is within 2x of n
    assert groups.size <= 2 * n + groups.shape[0]

    lists = {k: jnp.asarray(v) for k, v in lists_h.items()}
    ci, co = sample_controls_colored(jax.random.PRNGKey(3),
                                     jnp.asarray(colors), n, 6,
                                     directed=True)
    civ, cov = control_masks(ci, co, lists, True)
    ci, co = np.asarray(ci), np.asarray(co)
    civ, cov = np.asarray(civ), np.asarray(cov)
    for i in range(n):
        for k, c in enumerate(co[i]):
            if c >= 0:
                assert c != i and colors[c] != colors[i]
                for t in range(T):
                    assert cov[t, i, k] == (Y[t, i, c] == 0)
            else:
                assert not cov[:, i, k].any()
        for k, c in enumerate(ci[i]):
            if c >= 0:
                assert c != i and colors[c] != colors[i]
                for t in range(T):
                    assert civ[t, i, k] == (Y[t, c, i] == 0)
    # the with-replacement draw keeps most candidates
    assert (co >= 0).mean() > 0.4


def test_missing_dyads_are_conflicts(rng):
    """Missing dyads can become edges mid-fit, so they must separate
    colors too."""
    X, Y, _ = _net(rng, n=16)
    miss = rng.uniform(size=Y.shape) < 0.1
    colors, _ = color_conflict_graph(build_edge_lists(Y), Y.shape[1],
                                     miss_mask=miss, seed=0)
    _, i_, j_ = np.nonzero(miss)
    keep = i_ != j_
    assert (colors[i_[keep]] != colors[j_[keep]]).all()


@pytest.mark.parametrize('directed', [True, False])
@pytest.mark.parametrize('mixture', [True, False])
def test_singleton_parity_vs_sequential_scan(rng, directed, mixture):
    """Singleton classes in index order == the sequential XLA scan,
    bit for bit (same Markov kernel, same proposal stream)."""
    T, n, m, K = 3, 20, 5, 4
    X, Y, radii = _net(rng, T=T, n=n, directed=directed)
    cc, colors, _ = _structures(rng, Y, m, directed)
    eps, log_u = _noise(rng, T, n)
    step = jnp.full((T, n), 0.3, jnp.float32)
    b = jnp.asarray([0.5, 0.8] if directed else [0.5], jnp.float32)
    kw = dict(radii=jnp.asarray(radii) if directed else None,
              tau_sq=2.0, sigma_sq=0.1, is_directed=directed,
              mixture=mixture)
    if mixture:
        kw.update(mu=jnp.asarray(rng.randn(K, 2), jnp.float32),
                  sigma=jnp.asarray(rng.uniform(0.5, 2.0, K), jnp.float32),
                  lmbda=jnp.asarray(0.8, jnp.float32),
                  z=jnp.asarray(rng.randint(0, K, (T, n)), jnp.int32),
                  tau_sq=None, sigma_sq=None)

    cc_single = dict(cc, colors=jnp.asarray(colors),
                     color_groups=_singleton_groups(T, n))
    kw_c = dict(kw)
    kw_c['radii'] = jnp.asarray(radii) if directed else None
    Xc, accc = cc_colored_scan(jnp.asarray(X), b, step, eps, log_u,
                               cc=cc_single, **kw_c)
    Xx, accx = xla_exact_scan(jnp.asarray(Y), jnp.asarray(X), b, step,
                              eps, log_u, cc=cc,
                              radii=jnp.asarray(radii), **{
                                  k: v for k, v in kw.items()
                                  if k != 'radii'})
    np.testing.assert_array_equal(np.asarray(Xc), np.asarray(Xx))
    np.testing.assert_array_equal(np.asarray(accc), np.asarray(accx))
    assert 0.05 < float(accx.mean()) < 0.95  # both branches exercised


@pytest.mark.parametrize('directed', [True, False])
def test_class_update_equals_sequential_within_class(rng, directed):
    """Full classes == singleton classes in the same order: the
    simultaneous within-class update has no cross-site interactions."""
    T, n, m = 3, 24, 5
    X, Y, radii = _net(rng, T=T, n=n, directed=directed, p=0.12)
    cc, colors, groups = _structures(rng, Y, m, directed)
    eps, log_u = _noise(rng, T, n)
    step = jnp.full((T, n), 0.3, jnp.float32)
    b = jnp.asarray([0.5, 0.8] if directed else [0.5], jnp.float32)
    kw = dict(radii=jnp.asarray(radii) if directed else None,
              tau_sq=2.0, sigma_sq=0.1, is_directed=directed,
              mixture=False)

    # singleton expansion: each class's nodes as consecutive singleton
    # classes in slot order — sequential execution of the simultaneous
    # within-class update (node trajectories stay whole, so the parity
    # phases are preserved per node)
    order = groups.reshape(-1, 1)
    runs = []
    for g in (jnp.asarray(groups), jnp.asarray(order)):
        cc_g = dict(cc, colors=jnp.asarray(colors), color_groups=g)
        runs.append(cc_colored_scan(jnp.asarray(X), b, step, eps, log_u,
                                    cc=cc_g, **kw))
    np.testing.assert_array_equal(np.asarray(runs[0][0]),
                                  np.asarray(runs[1][0]))
    np.testing.assert_array_equal(np.asarray(runs[0][1]),
                                  np.asarray(runs[1][1]))
    assert float(runs[0][1].mean()) > 0.05


def test_tempered_colored_scan(rng):
    """temper scales exactly the network delta: with temper=0 every
    accept decision depends only on the prior."""
    T, n, m = 3, 20, 5
    X, Y, radii = _net(rng, T=T, n=n, directed=True)
    cc, colors, groups = _structures(rng, Y, m, True)
    eps, log_u = _noise(rng, T, n)
    step = jnp.full((T, n), 0.3, jnp.float32)
    b = jnp.asarray([0.5, 0.8], jnp.float32)
    cc_g = dict(cc, colors=jnp.asarray(colors),
                color_groups=jnp.asarray(groups))
    kw = dict(radii=jnp.asarray(radii), tau_sq=2.0, sigma_sq=0.1,
              is_directed=True, mixture=False, cc=cc_g)

    X1, _ = cc_colored_scan(jnp.asarray(X), b, step, eps, log_u,
                            temper=jnp.asarray(1.0, jnp.float32), **kw)
    X0, _ = cc_colored_scan(jnp.asarray(X), b, step, eps, log_u, **kw)
    np.testing.assert_array_equal(np.asarray(X1), np.asarray(X0))

    # tempered singleton-class scan == tempered sequential scan, bit for
    # bit — and different from the untempered chain
    cc_single = dict(cc, colors=jnp.asarray(colors),
                     color_groups=_singleton_groups(T, n))
    kw_s = dict(kw, cc=cc_single)
    t35 = jnp.asarray(0.35, jnp.float32)
    Xc, accc = cc_colored_scan(jnp.asarray(X), b, step, eps, log_u,
                               temper=t35, **kw_s)
    Xx, accx = xla_exact_scan(jnp.asarray(Y), jnp.asarray(X), b, step,
                              eps, log_u, radii=jnp.asarray(radii),
                              tau_sq=2.0, sigma_sq=0.1, cc=cc,
                              is_directed=True, mixture=False, temper=t35)
    np.testing.assert_array_equal(np.asarray(Xc), np.asarray(Xx))
    np.testing.assert_array_equal(np.asarray(accc), np.asarray(accx))

    # temper=0 (prior-only) parity + discrimination: the zero-tempered
    # chain matches the zero-tempered sequential scan bit for bit and
    # differs from the 0.35-tempered chain — proving the scalar reaches
    # the accept ratio in both implementations
    t0_ = jnp.asarray(0.0, jnp.float32)
    Xz, accz = cc_colored_scan(jnp.asarray(X), b, step, eps, log_u,
                               temper=t0_, **kw_s)
    Xz_x, _ = xla_exact_scan(jnp.asarray(Y), jnp.asarray(X), b, step,
                             eps, log_u, radii=jnp.asarray(radii),
                             tau_sq=2.0, sigma_sq=0.1, cc=cc,
                             is_directed=True, mixture=False, temper=t0_)
    np.testing.assert_array_equal(np.asarray(Xz), np.asarray(Xz_x))
    assert np.abs(np.asarray(Xz) - np.asarray(Xc)).max() > 0


def test_shared_ctrl_vmap_rule_matches_per_chain(rng):
    """The custom_vmap rule that drops the (chain-identical) control
    tensors' batch axis must produce exactly what plain per-chain
    batching would."""
    T, n, m, C = 3, 16, 4, 3
    X, Y, radii = _net(rng, T=T, n=n, directed=True)
    cc, colors, groups = _structures(rng, Y, m, True)
    eps, log_u = _noise(rng, T, n)
    step = jnp.full((T, n), 0.3, jnp.float32)
    b = jnp.asarray([0.5, 0.8], jnp.float32)
    cc_g = dict(cc, colors=jnp.asarray(colors),
                color_groups=jnp.asarray(groups))

    Xb = jnp.asarray(np.stack([X + 0.1 * i for i in range(C)]))
    ctrl_in_b = jnp.broadcast_to(cc_g['ctrl_in'],
                                 (C,) + cc_g['ctrl_in'].shape)
    ctrl_out_b = jnp.broadcast_to(cc_g['ctrl_out'],
                                  (C,) + cc_g['ctrl_out'].shape)

    def scan_one(Xi, ci, co):
        cc_i = dict(cc_g, ctrl_in=ci, ctrl_out=co)
        return cc_colored_scan(Xi, b, step, eps, log_u,
                               radii=jnp.asarray(radii), tau_sq=2.0,
                               sigma_sq=0.1, cc=cc_i, is_directed=True,
                               mixture=False)

    X_vm, acc_vm = jax.vmap(scan_one)(Xb, ctrl_in_b, ctrl_out_b)
    for i in range(C):
        Xi, acci = scan_one(Xb[i], cc_g['ctrl_in'], cc_g['ctrl_out'])
        np.testing.assert_array_equal(np.asarray(X_vm[i]), np.asarray(Xi))
        np.testing.assert_array_equal(np.asarray(acc_vm[i]),
                                      np.asarray(acci))
