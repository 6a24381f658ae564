"""Latent-position Metropolis updates (the hot loop).

The reference updates each (t, node) sequentially through Python closures
calling Cython per-row likelihood kernels
(sample_latent_positions.py:92-206).  The TPU-native scheme keeps the exact
single-site Markov kernel but restructures the scan for vector hardware:

* sequential ``lax.fori_loop`` over nodes (the within-time dependency graph
  is complete, so nodes cannot be updated independently without changing
  the kernel);
* within a node, time steps are updated in two parity phases (even t, then
  odd t).  Given the temporal-chain prior, same-parity times are
  conditionally independent, so each phase is a fully vectorised blocked
  Gibbs update over T/2 times — and over all vmapped chains.

Per sweep every (t, j) site receives exactly one MH proposal, as in the
reference; only the scan *order* differs (nodes-outer instead of
times-outer), which leaves the stationary distribution unchanged.
"""
from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp


def _partial_loglik_terms(Y_row, Y_col, X_t, x, radii, r_node,
                          intercept, is_directed):
    """Per-partner Bernoulli log-lik terms for one node at position ``x``.

    Shapes: Y_row/Y_col (T, n); X_t (T, n, d); x (T, d); radii (n,) or None.
    Returns (T, n) terms (self slot NOT yet masked).
    """
    diff = X_t - x[:, None, :]
    dist = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0))
    if is_directed:
        # eta for j -> i (node is the sender): b_in (1-d/r_i) + b_out
        # (1-d/r_j), evaluated in hoisted-reciprocal form
        # eta = (b_in + b_out) - d * (b_in/r_partner + b_out/r_self):
        # the per-partner divides become per-sweep lane rows, which is how
        # the Pallas kernel computes it — the op sequence here mirrors the
        # kernel exactly so the two realise bit-identical accept decisions
        # (tests/test_pallas_scan.py).
        both = intercept[0] + intercept[1]
        u_row = intercept[0] / radii[None, :]
        v_row = intercept[1] / radii[None, :]
        p_out = u_row + intercept[1] / r_node
        p_in = v_row + intercept[0] / r_node
        eta_out = both - dist * p_out
        eta_in = both - dist * p_in
        ll = Y_row * eta_out - jax.nn.softplus(eta_out)
        ll += Y_col * eta_in - jax.nn.softplus(eta_in)
        return ll
    eta = intercept[0] - dist
    return Y_row * eta - jax.nn.softplus(eta)


def _rw_prior_per_t(xs, x_cur, tau_sq, sigma_sq):
    """Gaussian random-walk prior terms of each time's conditional, evaluated
    at candidate positions ``xs`` with temporal neighbours fixed at ``x_cur``
    (reference sample_latent_positions.py:131-141).

    xs, x_cur : (T, d).  Returns (T,) log-prior contributions.
    """
    T, d = xs.shape
    t_idx = jnp.arange(T)
    prev = jnp.concatenate([jnp.zeros((1, d), xs.dtype), x_cur[:-1]], axis=0)
    nxt = jnp.concatenate([x_cur[1:], jnp.zeros((1, d), xs.dtype)], axis=0)

    back0 = -0.5 * jnp.sum(xs * xs, axis=-1) / tau_sq
    backt = -0.5 * jnp.sum((xs - prev) ** 2, axis=-1) / sigma_sq
    back = jnp.where(t_idx == 0, back0, backt)

    fwd = -0.5 * jnp.sum((nxt - xs) ** 2, axis=-1) / sigma_sq
    fwd = jnp.where(t_idx == T - 1, 0.0, fwd)
    return back + fwd


def _mixture_prior_per_t(xs, x_cur, mu_z, sigma_z, lmbda):
    """AR(1)-to-cluster-mean prior terms per time, neighbours fixed
    (reference sample_latent_positions.py:187-199).

    mu_z : (T, d) cluster mean of the node's label at each time.
    sigma_z : (T,) cluster variance at each time.
    """
    T, d = xs.shape
    t_idx = jnp.arange(T)
    prev = jnp.concatenate([jnp.zeros((1, d), xs.dtype), x_cur[:-1]], axis=0)
    nxt = jnp.concatenate([x_cur[1:], jnp.zeros((1, d), xs.dtype)], axis=0)
    mu_nxt = jnp.concatenate([mu_z[1:], jnp.zeros((1, d), xs.dtype)], axis=0)
    sig_nxt = jnp.concatenate([sigma_z[1:], jnp.ones((1,), xs.dtype)], axis=0)

    diff0 = xs - mu_z
    difft = xs - (1.0 - lmbda) * prev - lmbda * mu_z
    diff = jnp.where((t_idx == 0)[:, None], diff0, difft)
    back = -0.5 * jnp.sum(diff * diff, axis=-1) / sigma_z

    fdiff = nxt - (1.0 - lmbda) * xs - lmbda * mu_nxt
    fwd = -0.5 * jnp.sum(fdiff * fdiff, axis=-1) / sig_nxt
    fwd = jnp.where(t_idx == T - 1, 0.0, fwd)
    return back + fwd


def _parallel_site_update(key, Y, X, intercept, step_size, radii, tau_sq,
                          sigma_sq, mu, sigma, lmbda, z, is_directed,
                          mixture, cc=None, temper=None):
    """All (t, node) proposals evaluated against the *stale* position field
    with independent per-site acceptance.

    This is the fully-parallel variant flagged in SURVEY.md §7.1: one fused
    O(T n^2 d) tensor pass instead of 2n sequential steps, at the cost of a
    slightly perturbed Markov kernel (each site's acceptance ignores the
    other sites' concurrent moves).  Opt-in via latent_update='parallel';
    posterior agreement is validated empirically on Sampson (see tests).

    Measured perturbation (Geweke joint-distribution harness, T=3, n=8,
    ~52% acceptance): the temporal-smoothness moment E|X_{t+1}-X_t|^2 is
    inflated ~9% (stale temporal neighbours make simultaneous moves look
    locally uncorrelated), with other prior moments drifting ~2 SE.  The
    perturbation shrinks with the step size; functionals tested in the
    Sampson equivalence suite (intercept, logp, labels) stay within MCMC
    error.  Use 'exact' (default) or 'mala' (also exact, gradient-based)
    when temporal-dynamics posteriors matter.
    """
    T, n, d = X.shape
    k_eps, k_u = jax.random.split(key)
    eps = jax.random.normal(k_eps, (T, n, d), X.dtype)
    log_u = jnp.log(jax.random.uniform(k_u, (T, n), X.dtype))
    X_prop = X + step_size[..., None] * eps
    mask = (1.0 - jnp.eye(n, dtype=X.dtype))[None]           # (1, n, n)

    def site_ll(Xq):
        """Per-site likelihood terms: row of Bernoulli terms of node j's
        position Xq[t, j] against the stale field X."""
        if cc is not None:
            from ..ops.case_control import approx_partial_loglik_all
            return approx_partial_loglik_all(X, Xq, cc, intercept, radii,
                                             is_directed)
        diff = Xq[:, :, None, :] - X[:, None, :, :]
        dist = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, -1), 0.0))
        if is_directed:
            r_self = radii[None, :, None]
            r_other = radii[None, None, :]
            eta_out = (intercept[0] * (1.0 - dist / r_other)
                       + intercept[1] * (1.0 - dist / r_self))
            eta_in = (intercept[0] * (1.0 - dist / r_self)
                      + intercept[1] * (1.0 - dist / r_other))
            ll = Y * eta_out - jax.nn.softplus(eta_out)
            ll += jnp.swapaxes(Y, -1, -2) * eta_in - jax.nn.softplus(eta_in)
        else:
            eta = intercept[0] - dist
            ll = Y * eta - jax.nn.softplus(eta)
        return jnp.sum(ll * mask, axis=-1)                   # (T, n)

    def site_prior(Xq):
        """Per-site prior terms with stale temporal neighbours."""
        prev = jnp.concatenate([jnp.zeros_like(X[:1]), X[:-1]], axis=0)
        nxt = jnp.concatenate([X[1:], jnp.zeros_like(X[:1])], axis=0)
        t_idx = jnp.arange(T)[:, None]
        if mixture:
            mu_z = mu[z]                                     # (T, n, d)
            sig_z = sigma[z]                                 # (T, n)
            mu_nxt = jnp.concatenate([mu_z[1:], jnp.zeros_like(mu_z[:1])], 0)
            sig_nxt = jnp.concatenate([sig_z[1:], jnp.ones_like(sig_z[:1])], 0)
            diff0 = Xq - mu_z
            difft = Xq - (1.0 - lmbda) * prev - lmbda * mu_z
            diff = jnp.where((t_idx == 0)[..., None], diff0, difft)
            back = -0.5 * jnp.sum(diff * diff, -1) / sig_z
            fdiff = nxt - (1.0 - lmbda) * Xq - lmbda * mu_nxt
            fwd = -0.5 * jnp.sum(fdiff * fdiff, -1) / sig_nxt
        else:
            back0 = -0.5 * jnp.sum(Xq * Xq, -1) / tau_sq
            backt = -0.5 * jnp.sum((Xq - prev) ** 2, -1) / sigma_sq
            back = jnp.where(t_idx == 0, back0, backt)
            fwd = -0.5 * jnp.sum((nxt - Xq) ** 2, -1) / sigma_sq
        fwd = jnp.where(t_idx == T - 1, 0.0, fwd)
        return back + fwd

    delta_ll = site_ll(X_prop) - site_ll(X)
    if temper is not None:
        delta_ll = temper * delta_ll
    ratio = delta_ll + site_prior(X_prop) - site_prior(X)
    accept = log_u < ratio
    X_new = jnp.where(accept[..., None], X_prop, X)
    return X_new, accept.astype(X.dtype)


def _joint_latent_logp(Y, X, intercept, radii, tau_sq, sigma_sq,
                       mu, sigma, lmbda, z, is_directed, mixture,
                       temper=None):
    """Joint log density of the full position field (network likelihood +
    temporal prior), differentiable in X — the MALA target.

    Unlike the per-site conditionals above, the joint prior contains each
    temporal transition exactly once (no forward terms).  The diagonal of
    the squared-distance matrix is replaced by 1 before the sqrt so the
    gradient stays finite at the (masked-out) zero self-distances.
    """
    T, n, d = X.shape
    mask = (1.0 - jnp.eye(n, dtype=X.dtype))[None]            # (1, n, n)
    diff = X[:, :, None, :] - X[:, None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    # the 1e-12 floor keeps the sqrt gradient finite for coincident node
    # pairs (distances below 1e-6 are indistinguishable in the likelihood)
    dist = jnp.sqrt(jnp.where(mask > 0, jnp.maximum(d2, 1e-12), 1.0))
    if is_directed:
        r_i = radii[None, :, None]
        r_j = radii[None, None, :]
        eta = (intercept[0] * (1.0 - dist / r_j)
               + intercept[1] * (1.0 - dist / r_i))
        ll = jnp.sum((Y * eta - jax.nn.softplus(eta)) * mask)
    else:
        eta = intercept[0] - dist
        ll = 0.5 * jnp.sum((Y * eta - jax.nn.softplus(eta)) * mask)

    if temper is not None:
        ll = temper * ll
    if mixture:
        mu_z = mu[z]                                          # (T, n, d)
        sig_z = sigma[z]                                      # (T, n)
        diff0 = X[0] - mu_z[0]
        prior = -0.5 * jnp.sum(jnp.sum(diff0 * diff0, -1) / sig_z[0])
        if T > 1:
            dft = X[1:] - (1.0 - lmbda) * X[:-1] - lmbda * mu_z[1:]
            prior -= 0.5 * jnp.sum(jnp.sum(dft * dft, -1) / sig_z[1:])
    else:
        prior = -0.5 * jnp.sum(X[0] * X[0]) / tau_sq
        if T > 1:
            dft = X[1:] - X[:-1]
            prior -= 0.5 * jnp.sum(dft * dft) / sigma_sq
    return ll + prior


def _mala_update(key, Y, X, intercept, step_size, radii, tau_sq, sigma_sq,
                 mu, sigma, lmbda, z, is_directed, mixture, temper=None):
    """One joint Metropolis-adjusted Langevin step on the whole position
    field.

    Beyond-reference capability (the reference is random-walk-only,
    and its Cython likelihood has no gradients): the proposal drifts along
    the gradient of the joint log density and one MH test accepts the whole
    field.  Cost: two value_and_grad evaluations of the dense joint density
    per sweep (one fused O(T n^2 d) pass each) versus 2n sequential steps
    for the exact scan — much cheaper per sweep and, unlike the scan,
    node-shardable.  Mixing trade-off (measured, single chain): the single
    joint accept yields ~2-4x fewer ESS(logp) per sweep than the exact
    scan at n in [100, 250], so this kernel is for when sweep cost or
    sharding dominates; 'exact' remains the default.

    ``step_size`` is the (T, n) per-site scale array used as a fixed
    diagonal preconditioner; the proposal and its reversal use the same
    scales, and the MH correction accounts for the drift exactly, so the
    sampled posterior is unchanged.  Acceptance is a single indicator,
    broadcast to (T, n) so the existing accumulation/tuning machinery
    applies (tuned with the 'mala' schedule toward ~0.45-0.70).
    """
    T, n, d = X.shape
    vg = jax.value_and_grad(
        lambda Xq: _joint_latent_logp(Y, Xq, intercept, radii, tau_sq,
                                      sigma_sq, mu, sigma, lmbda, z,
                                      is_directed, mixture, temper=temper))
    k_eps, k_u = jax.random.split(key)
    s = step_size[..., None]                                  # (T, n, 1)
    s2 = s * s

    logp_cur, g_cur = vg(X)
    mean_fwd = X + 0.5 * s2 * g_cur
    eps = jax.random.normal(k_eps, (T, n, d), X.dtype)
    X_prop = mean_fwd + s * eps
    logp_prop, g_prop = vg(X_prop)
    mean_rev = X_prop + 0.5 * s2 * g_prop

    # log q(X | X') - log q(X' | X); the normalisation cancels (same scales)
    log_q_rev = -0.5 * jnp.sum((X - mean_rev) ** 2 / s2)
    log_q_fwd = -0.5 * jnp.sum((X_prop - mean_fwd) ** 2 / s2)
    ratio = logp_prop - logp_cur + log_q_rev - log_q_fwd

    log_u = jnp.log(jax.random.uniform(k_u, (), X.dtype))
    accept = log_u < ratio
    X_new = jnp.where(accept, X_prop, X)
    return X_new, jnp.full((T, n), accept.astype(X.dtype))


def _rw_prior_class(xs, x_cur, tau_sq, sigma_sq):
    """Class-batched :func:`_rw_prior_per_t`: xs / x_cur (T, S, d) ->
    (T, S).  Elementwise-identical arithmetic (parity tests compare the
    colored scan bit-for-bit against the sequential scan)."""
    T = xs.shape[0]
    t_idx = jnp.arange(T)[:, None]
    prev = jnp.concatenate([jnp.zeros_like(x_cur[:1]), x_cur[:-1]], axis=0)
    nxt = jnp.concatenate([x_cur[1:], jnp.zeros_like(x_cur[:1])], axis=0)

    back0 = -0.5 * jnp.sum(xs * xs, axis=-1) / tau_sq
    backt = -0.5 * jnp.sum((xs - prev) ** 2, axis=-1) / sigma_sq
    back = jnp.where(t_idx == 0, back0, backt)

    fwd = -0.5 * jnp.sum((nxt - xs) ** 2, axis=-1) / sigma_sq
    fwd = jnp.where(t_idx == T - 1, 0.0, fwd)
    return back + fwd


def _mixture_prior_class(xs, x_cur, mu_z, sigma_z, lmbda):
    """Class-batched :func:`_mixture_prior_per_t`: xs / x_cur / mu_z
    (T, S, d), sigma_z (T, S) -> (T, S)."""
    T = xs.shape[0]
    t_idx = jnp.arange(T)[:, None]
    prev = jnp.concatenate([jnp.zeros_like(x_cur[:1]), x_cur[:-1]], axis=0)
    nxt = jnp.concatenate([x_cur[1:], jnp.zeros_like(x_cur[:1])], axis=0)
    mu_nxt = jnp.concatenate([mu_z[1:], jnp.zeros_like(mu_z[:1])], axis=0)
    sig_nxt = jnp.concatenate([sigma_z[1:], jnp.ones_like(sigma_z[:1])],
                              axis=0)

    diff0 = xs - mu_z
    difft = xs - (1.0 - lmbda) * prev - lmbda * mu_z
    diff = jnp.where((t_idx == 0)[..., None], diff0, difft)
    back = -0.5 * jnp.sum(diff * diff, axis=-1) / sigma_z

    fdiff = nxt - (1.0 - lmbda) * xs - lmbda * mu_nxt
    fwd = -0.5 * jnp.sum(fdiff * fdiff, axis=-1) / sig_nxt
    fwd = jnp.where(t_idx == T - 1, 0.0, fwd)
    return back + fwd


def _cc_colored_scan_impl(X, intercept, step_size, eps, log_u, radii,
                          tau_sq, sigma_sq, muz, sigz, lmbda, temper,
                          groups, in_edges, out_edges, degrees, ctrl_in,
                          ctrl_out, civ, cov, *, is_directed, mixture):
    """Single-chain body of the chromatic scan (see
    :func:`cc_colored_scan`).  ``groups`` (n_colors, S) assigns each
    node's whole trajectory to one class; within a class, each node's
    times update in two parity phases.  Edge partners are gathered per
    (t, partner) row; control partners — shared across time — are
    gathered as contiguous node-major TRAJECTORIES (one ~T*12 B row per
    control instead of T rows; the gather is row-count-bound).  ``muz``
    (T, n, d) / ``sigz`` (T, n) are the per-site cluster parameters,
    pre-gathered once per sweep; ``degrees`` is (T, n, 2) directed /
    (T, n) undirected; ``civ``/``cov`` the (T, n, m) control validity
    masks; ``temper`` a scalar (1.0 when untempered — an exact
    multiply)."""
    from ..ops.case_control import (
        class_partial_loglik_segments, _gather_partners as _cc_gather,
        _gather_trajectories, _node_major, _dist_to)

    T, n, d = X.shape
    t_idx = jnp.arange(T)[:, None]
    n_colors = groups.shape[0]
    edge_tables = (in_edges, out_edges) if is_directed else (out_edges,)
    ctrl_tables = (ctrl_in, ctrl_out) if is_directed else (ctrl_out,)
    mask_tables = (civ, cov) if is_directed else (cov,)
    widths = ([t.shape[-1] for t in edge_tables]
              + [t.shape[-1] for t in ctrl_tables])
    offsets = (0,) + tuple(int(v) for v in np.cumsum(widths))
    edge_idx_table = jnp.concatenate(edge_tables, axis=-1)   # (T, n, Me)
    ctrl_idx_table = jnp.concatenate(ctrl_tables, axis=-1)   # (n, Mc)
    cmask_table = jnp.concatenate(mask_tables, axis=-1)      # (T, n, Mc)
    ne = 2 if is_directed else 1
    sender = np.zeros((1, 1, offsets[-1]), bool)
    if is_directed:
        sender[..., offsets[1]:offsets[2]] = True        # out edges
        sender[..., offsets[3]:offsets[4]] = True        # ctrl_out
    sender_mask = jnp.asarray(sender)

    # class-sorted copies of every scan-invariant per-node table, built
    # ONCE per sweep: the color loop then reads them by dynamic_slice
    # instead of per-color gathers.  The per-gather fixed cost (~0.2 ms)
    # times ~10 tables times n_colors dominated the scan; after sorting,
    # each color pays only its two position gathers (which must be fresh
    # — positions change as earlier colors update).
    g_safe = jnp.maximum(groups, 0)                      # (nc, S)
    cls_eidx = jnp.moveaxis(edge_idx_table[:, g_safe], 1, 0)
    cls_cidx = ctrl_idx_table[g_safe]                    # (nc, S, Mc)
    cls_cmask = jnp.moveaxis(cmask_table[:, g_safe], 1, 0)
    cls_deg = jnp.moveaxis(degrees[:, g_safe], 1, 0)
    cls_step = jnp.moveaxis(step_size[:, g_safe], 1, 0)  # (nc, T, S)
    cls_eps = jnp.moveaxis(eps[:, g_safe], 1, 0)         # (nc, 2, S, T, d)
    cls_u = jnp.moveaxis(log_u[:, g_safe], 1, 0)         # (nc, 2, S, T)
    if is_directed:
        cls_radii = radii[g_safe]                        # (nc, S)
    if mixture:
        cls_muz = jnp.moveaxis(muz[:, g_safe], 1, 0)     # (nc, T, S, d)
        cls_sigz = jnp.moveaxis(sigz[:, g_safe], 1, 0)   # (nc, T, S)

    def color_body(c, carry):
        X, acc = carry
        nodes = groups[c]                                # (S,)
        valid_nodes = nodes >= 0
        safe = jnp.maximum(nodes, 0)
        oob = jnp.where(valid_nodes, nodes, n)           # drop pad scatters

        step_j = cls_step[c]                             # (T, S)
        e_idx = cls_eidx[c]                              # (T, S, Me)
        c_idx = cls_cidx[c]                              # (S, Mc)
        c_valid = cls_cmask[c]                           # (T, S, Mc)
        deg_j = cls_deg[c]
        if is_directed:
            # partner radii ride the position gathers as a feature column
            # — one row per partner instead of a second radii gather
            Xr = jnp.concatenate(
                [X, jnp.broadcast_to(radii[None, :, None], (T, n, 1))],
                axis=-1)
            ge = _cc_gather(Xr, e_idx)                   # (T, S, Me, d+1)
            gc = _gather_trajectories(_node_major(X, radii), c_idx)
            pos_all = jnp.concatenate([ge[..., :d], gc[..., :d]], axis=2)
            r_all = jnp.concatenate([ge[..., d], gc[..., d]], axis=-1)
            r_self = cls_radii[c]                        # (S,)
        else:
            ge = _cc_gather(X, e_idx)                    # (T, S, Me, d)
            gc = _gather_trajectories(_node_major(X), c_idx)
            pos_all = jnp.concatenate([ge, gc], axis=2)
            r_all = r_self = None
        valid_all = jnp.concatenate([e_idx >= 0, c_valid], axis=-1)
        if mixture:
            mu_j = cls_muz[c]                            # (T, S, d)
            sig_j = cls_sigz[c]                          # (T, S)

        def class_ll(xq):
            dist = _dist_to(pos_all, xq)                 # (T, S, Mtot)
            return class_partial_loglik_segments(
                None, dist, valid_all, r_all, r_self, sender_mask,
                offsets, deg_j, intercept[0],
                intercept[1] if is_directed else None, n, is_directed)

        x_cur = jnp.take(X, safe, axis=1)                # (T, S, d)
        for phase in (0, 1):
            eps_j = jnp.moveaxis(cls_eps[c, phase], 0, 1)  # (T, S, d)
            u_j = cls_u[c, phase].T                      # (T, S)
            x_prop = x_cur + step_j[..., None] * eps_j

            delta_ll = temper * (class_ll(x_prop) - class_ll(x_cur))
            if mixture:
                lp = _mixture_prior_class(x_prop, x_cur, mu_j, sig_j, lmbda)
                lc = _mixture_prior_class(x_cur, x_cur, mu_j, sig_j, lmbda)
            else:
                lp = _rw_prior_class(x_prop, x_cur, tau_sq, sigma_sq)
                lc = _rw_prior_class(x_cur, x_cur, tau_sq, sigma_sq)
            ratio = delta_ll + lp - lc
            in_phase = (t_idx % 2) == phase
            accept = jnp.logical_and(u_j < ratio, in_phase)
            accept = jnp.logical_and(accept, valid_nodes[None, :])
            x_cur = jnp.where(accept[..., None], x_prop, x_cur)
            acc = acc.at[:, oob].add(accept.astype(X.dtype), mode='drop')
        X = X.at[:, oob].set(x_cur, mode='drop')
        return X, acc

    return jax.lax.fori_loop(0, n_colors, color_body,
                             (X, jnp.zeros((T, n), X.dtype)))


# flat-arg positions in _cc_colored_scan_impl / the custom_vmap wrapper
_CC_OUT_EDGES_ARG = 14
_CC_CTRL_ARGS = (16, 17, 18, 19)


@lru_cache(maxsize=None)
def _colored_scan_vmap(is_directed, mixture):
    """custom_vmap wrapper for the chromatic scan: when the driver vmaps
    the sweep over chains, the control-index tensors (per-chain state
    leaves) would become batched gather indices — which XLA lowers ~10x
    slower than shared-index gathers (measured 1.2 vs 12.8 GB/s at 16
    chains).  The colored path draws controls from a chain-invariant key
    (sweeps._refresh_controls), so the batched control tensors are
    chain-identical by construction; this rule drops their batch axis
    (slice 0) whenever the edge structure itself is shared, restoring the
    fast shared-index gather.  Per-chain edge structures (missing-dyad
    fits rebuild per-chain lists) keep the batched indices — correctness
    before speed."""

    def single(*args):
        return _cc_colored_scan_impl(*args, is_directed=is_directed,
                                     mixture=mixture)

    f = jax.custom_batching.custom_vmap(single)

    @f.def_vmap
    def _rule(axis_size, in_batched, *args):
        args = list(args)
        batched = list(in_batched)
        if not batched[_CC_OUT_EDGES_ARG]:
            for i in _CC_CTRL_ARGS:
                if batched[i]:
                    args[i] = args[i][0]
                    batched[i] = False
        in_axes = tuple(0 if b else None for b in batched)
        out = jax.vmap(single, in_axes=in_axes)(*args)
        return out, (True, True)

    return f


def cc_colored_scan(X, intercept, step_size, eps, log_u, *, radii=None,
                    tau_sq=None, sigma_sq=None, mu=None, sigma=None,
                    lmbda=None, z=None, cc=None, is_directed=False,
                    mixture=False, temper=None):
    """Exact chromatic case-control node scan.

    The sequential single-site scan is latency-bound on TPU (O(n)
    dependent dispatches); under the case-control likelihood the
    dependency graph is *sparse* — node j's conditional sees only its
    edge partners and control nodes.  With the conflict graph properly
    colored (ops/case_control.color_conflict_graph) and controls drawn
    across color classes (sample_controls_colored), all nodes of one
    class have conditionally independent single-site conditionals, so
    one vectorised MH step updates the entire class at once — exact
    blocked Gibbs realising the same stationary distribution as the
    reference's sequential case-control sweep
    (sample_latent_positions.py:92-146 + case_control_likelihood.py),
    in O(n_colors) sequential steps instead of O(n).

    Each class step runs the same two time-parity phases as the
    sequential scan and consumes the identical per-node proposal stream
    (eps (2, n, T, d), log_u (2, n, T)), so with singleton classes in
    index order it is bit-identical to :func:`xla_exact_scan`
    (tests/test_cc_colored.py).  The per-site cluster parameters come
    from a one-hot MXU contraction (exact — a single non-zero term per
    site) hoisted out of the color loop.
    """
    f32 = X.dtype
    if mixture:
        K = mu.shape[0]
        resp = jax.nn.one_hot(z, K, dtype=f32)           # (T, n, K)
        muz = jnp.einsum('tnk,kd->tnd', resp, mu, precision='highest')
        sigz = jnp.einsum('tnk,k->tn', resp, sigma, precision='highest')
        lam = jnp.asarray(lmbda, f32)
        tau = sig = jnp.ones((), f32)
    else:
        muz = sigz = jnp.zeros((), f32)
        lam = jnp.ones((), f32)
        tau = jnp.asarray(tau_sq, f32)
        sig = jnp.asarray(sigma_sq, f32)
    r = radii if is_directed else jnp.zeros((), f32)
    ie = cc['in_edges'] if is_directed else jnp.zeros((), jnp.int32)
    ci = cc['ctrl_in'] if is_directed else jnp.zeros((), jnp.int32)
    civ = cc['ctrl_in_valid'] if is_directed else jnp.zeros((), bool)
    deg = cc['degrees'] if is_directed else cc['degrees'][..., 1]
    t = (jnp.ones((), f32) if temper is None
         else jnp.asarray(temper, f32))
    fn = _colored_scan_vmap(is_directed, mixture)
    return fn(X, jnp.asarray(intercept, f32), step_size, eps, log_u, r,
              tau, sig, muz, sigz, lam, t, cc['color_groups'], ie,
              cc['out_edges'], deg, ci, cc['ctrl_out'], civ,
              cc['ctrl_out_valid'])
@partial(jax.jit, static_argnames=('is_directed', 'mixture', 'scheme'))
def sample_latent_positions(key, Y, X, intercept, step_size, *,
                            radii=None, tau_sq=None, sigma_sq=None,
                            mu=None, sigma=None, lmbda=None, z=None,
                            cc=None, is_directed=False, mixture=False,
                            scheme='exact', noise=None, temper=None):
    """One full sweep of single-site MH updates over all (t, node) sites.

    Parameters
    ----------
    key : PRNG key
    Y : (T, n, n) adjacency tensor (float)
    X : (T, n, d) current latent positions
    intercept : (1,) or (2,) intercepts
    step_size : (T, n) per-site random-walk step sizes
    radii : (n,) social radii (directed only)
    tau_sq, sigma_sq : LSM random-walk prior scales (mixture=False)
    mu (K, d), sigma (K,), lmbda (), z (T, n) : mixture prior (mixture=True)
    cc : optional case-control dict with in_edges, out_edges, degrees,
        ctrl_in, ctrl_out (undirected networks use only the out halves) —
        switches the likelihood to the O(n * m) approximation (reference
        sample_latent_positions.py:103-117)

    Returns
    -------
    X_new : (T, n, d)
    n_accepted : (T, n) float acceptance indicators for this sweep
    """
    if scheme not in ('exact', 'parallel', 'mala'):
        raise ValueError(
            "latent_update must be 'exact', 'parallel', or 'mala', got %r"
            % (scheme,))
    if scheme == 'parallel':
        if noise is not None:
            raise ValueError(
                "scheme='parallel' draws its own (T, n) proposal field; an "
                "injected exact-scan noise stream cannot be honoured")
        return _parallel_site_update(key, Y, X, intercept, step_size, radii,
                                     tau_sq, sigma_sq, mu, sigma, lmbda, z,
                                     is_directed, mixture, cc=cc,
                                     temper=temper)
    if scheme == 'mala':
        if cc is not None:
            raise ValueError(
                "latent_update='mala' differentiates the dense joint "
                "likelihood; under case-control sampling use 'exact' or "
                "'parallel'")
        if noise is not None:
            raise ValueError(
                "scheme='mala' draws its own proposal noise; an injected "
                "exact-scan noise stream cannot be honoured")
        return _mala_update(key, Y, X, intercept, step_size, radii,
                            tau_sq, sigma_sq, mu, sigma, lmbda, z,
                            is_directed, mixture, temper=temper)

    T, n, d = X.shape
    if noise is None:
        k_eps, k_u = jax.random.split(key)
        eps = jax.random.normal(k_eps, (2, n, T, d), X.dtype)
        log_u = jnp.log(jax.random.uniform(k_u, (2, n, T), X.dtype))
    else:
        eps, log_u = noise

    # exact chromatic case-control scan: O(n_colors) sequential steps,
    # no dense adjacency (the large-n path; all backends)
    if cc is not None and 'color_groups' in cc:
        return cc_colored_scan(X, intercept, step_size, eps, log_u,
                               radii=radii if is_directed else None,
                               tau_sq=tau_sq, sigma_sq=sigma_sq, mu=mu,
                               sigma=sigma, lmbda=lmbda, z=z, cc=cc,
                               is_directed=is_directed, mixture=mixture,
                               temper=temper)

    # On TPU the exact scan (undirected and directed social-radii) runs as
    # one fused Pallas kernel (same Markov kernel and proposal stream;
    # ~20x less dispatch overhead at large n).  The adjacency is streamed
    # from HBM, so the kernel applies whenever at least one chain's
    # position/noise buffers fit VMEM — via the int8 layout to n ~ 8192,
    # then the stream16 bf16 layout to n ~ 16384 (undirected).  Falls back
    # to the XLA fori_loop on other backends or under case-control.
    n_pad = max(-(-n // 128) * 128, 128)
    if (scheme == 'exact' and cc is None
            and jax.default_backend() == 'tpu'):
        from ..ops.pallas_scan import calibrated_max_chains
        use_pallas = (
            calibrated_max_chains(T, n_pad, is_directed, False,
                                  mixture) >= 1
            or calibrated_max_chains(T, n_pad, is_directed, True,
                                     mixture) >= 1)
    else:
        use_pallas = False
    if use_pallas:
        from ..ops.pallas_scan import node_scan_dispatch
        return node_scan_dispatch(
            Y, X, intercept, step_size, eps, log_u,
            tau_sq=0.0 if mixture else tau_sq,
            sigma_sq=1.0 if mixture else sigma_sq,
            radii=radii if is_directed else None,
            mu=mu, sigma=sigma, lmbda=lmbda, z=z, mixture=mixture,
            temper=temper)

    return xla_exact_scan(Y, X, intercept, step_size, eps, log_u,
                          radii=radii, tau_sq=tau_sq, sigma_sq=sigma_sq,
                          mu=mu, sigma=sigma, lmbda=lmbda, z=z, cc=cc,
                          is_directed=is_directed, mixture=mixture,
                          temper=temper)


def xla_exact_scan(Y, X, intercept, step_size, eps, log_u, *,
                   radii=None, tau_sq=None, sigma_sq=None, mu=None,
                   sigma=None, lmbda=None, z=None, cc=None,
                   is_directed=False, mixture=False, temper=None):
    """The exact node scan as an XLA ``fori_loop`` with an injected proposal
    stream (also the reference implementation the Pallas kernel is verified
    against)."""
    T, n, d = X.shape
    t_idx = jnp.arange(T)
    partner = jnp.arange(n)

    use_cc = cc is not None

    def node_update(j, carry):
        X, acc = carry
        for phase in (0, 1):
            x_cur = X[:, j, :]                               # (T, d)
            x_prop = x_cur + step_size[:, j, None] * eps[phase, j]

            if use_cc:
                from ..ops.case_control import (
                    approx_directed_partial_loglik,
                    approx_undirected_partial_loglik)

                def cc_ll(x):
                    if is_directed:
                        return approx_directed_partial_loglik(
                            X, radii, j, x, cc['in_edges'][:, j],
                            cc['out_edges'][:, j], cc['degrees'][:, j],
                            cc['ctrl_in'][j], cc['ctrl_out'][j],
                            cc['ctrl_in_valid'][:, j],
                            cc['ctrl_out_valid'][:, j],
                            intercept[0], intercept[1])
                    return approx_undirected_partial_loglik(
                        X, x, cc['out_edges'][:, j],
                        cc['degrees'][:, j, 1], cc['ctrl_out'][j],
                        cc['ctrl_out_valid'][:, j], intercept[0])

                delta_ll = cc_ll(x_prop) - cc_ll(x_cur)      # (T,)
            else:
                Y_row = Y[:, j, :]
                Y_col = Y[:, :, j]
                r_node = radii[j] if is_directed else None
                ll_prop = _partial_loglik_terms(
                    Y_row, Y_col, X, x_prop, radii, r_node, intercept,
                    is_directed)
                ll_cur = _partial_loglik_terms(
                    Y_row, Y_col, X, x_cur, radii, r_node, intercept,
                    is_directed)
                mask = (partner != j).astype(X.dtype)[None, :]
                delta_ll = jnp.sum((ll_prop - ll_cur) * mask, axis=-1)  # (T,)

            if mixture:
                z_j = z[:, j]
                mu_z = mu[z_j]
                sigma_z = sigma[z_j]
                lp = _mixture_prior_per_t(x_prop, x_cur, mu_z, sigma_z, lmbda)
                lc = _mixture_prior_per_t(x_cur, x_cur, mu_z, sigma_z, lmbda)
            else:
                lp = _rw_prior_per_t(x_prop, x_cur, tau_sq, sigma_sq)
                lc = _rw_prior_per_t(x_cur, x_cur, tau_sq, sigma_sq)

            if temper is not None:
                delta_ll = temper * delta_ll
            ratio = delta_ll + lp - lc
            in_phase = (t_idx % 2) == phase
            accept = jnp.logical_and(log_u[phase, j] < ratio, in_phase)
            x_new = jnp.where(accept[:, None], x_prop, x_cur)
            X = X.at[:, j, :].set(x_new)
            acc = acc.at[:, j].add(accept.astype(X.dtype))
        return X, acc

    X, acc = jax.lax.fori_loop(0, n, node_update,
                               (X, jnp.zeros((T, n), X.dtype)))
    return X, acc
