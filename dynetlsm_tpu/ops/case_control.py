"""Case-control likelihood approximation (directed and undirected).

TPU-native replacement for the reference's CaseControlSampler +
``approx_directed_*`` Cython kernels (case_control_likelihood.py:36-112,
directed_likelihoods_fast.pyx:83-270) and the undirected
``approx_partial_loglikelihood`` (static_network_fast.pyx:47-94, which the
reference ships but never wires up): exact terms for observed edges plus
a scaled random sample of "control" non-edges, turning the O(n^2) dyad sum
into O(n * (deg_max + n_control)).

Differences from the reference's host-side design, driven by jit:

* edge lists are padded (T, n, max_degree) index tensors with -1 validity
  padding instead of ragged arrays;
* control nodes are drawn *in-device* by Gumbel top-k over masked scores
  (uniform sampling without replacement from each row's non-edges), so the
  periodic resampling step lives inside the jitted sweep;
* when missing dyads are Gibbs-resampled the edge structure changes between
  sweeps, so the padded edge lists are rebuilt in-device from the current
  adjacency by a top-k pass (:func:`edge_lists_device`) instead of the
  reference's host-side ``MissingDirectedCaseControlSampler`` rebuild
  (case_control_likelihood.py:115-186).
"""
import numpy as np
import jax
import jax.numpy as jnp


def build_edge_lists(Y):
    """Host-side preprocessing of the (static within a fit) edge structure.

    Returns dict with degrees (T, n, 2) [in, out] and padded in/out edge
    index tensors.  Mirrors reference case_control_likelihood.py:44-68 with
    -1 padding.
    """
    Y = np.asarray(Y)
    T, n, _ = Y.shape
    degrees = np.zeros((T, n, 2), dtype=np.int32)
    degrees[..., 0] = Y.sum(axis=1)      # in-degree (column sums)
    degrees[..., 1] = Y.sum(axis=2)      # out-degree (row sums)

    max_in = max(int(degrees[..., 0].max()), 1)
    max_out = max(int(degrees[..., 1].max()), 1)
    in_edges = np.full((T, n, max_in), -1, dtype=np.int32)
    out_edges = np.full((T, n, max_out), -1, dtype=np.int32)
    for t in range(T):
        for i in range(n):
            out_idx = np.flatnonzero(Y[t, i, :] == 1)
            in_idx = np.flatnonzero(Y[t, :, i] == 1)
            out_edges[t, i, :out_idx.shape[0]] = out_idx
            in_edges[t, i, :in_idx.shape[0]] = in_idx
    return {'degrees': degrees, 'in_edges': in_edges, 'out_edges': out_edges}


def edge_lists_device(Y, max_deg):
    """Jittable rebuild of the padded edge lists from the current adjacency.

    Used when missing dyads are Gibbs-resampled inside the sweep (so the
    edge structure drifts between sweeps); replaces the reference's
    host-side edge-list rebuild (case_control_likelihood.py:115-186).
    ``max_deg`` is a static safe bound on any row/column degree (edges the
    network can ever gain are only at missing dyads, so
    ``observed degree + per-row missing count`` bounds it — computed
    host-side by :func:`max_degree_bound`).

    Y (T, n, n) float 0/1 with zero diagonal.  Returns the same dict layout
    as :func:`build_edge_lists` with device arrays.
    """
    rank = jnp.arange(max_deg)

    def rows(adj):
        # top_k over a 0/1 row puts the edges first (ties broken by lowest
        # index), so the first ``degree`` slots are exactly the edge list
        _, idx = jax.lax.top_k(adj, max_deg)                  # (T, n, max_deg)
        deg = jnp.sum(adj, axis=-1).astype(jnp.int32)         # (T, n)
        valid = rank[None, None, :] < deg[..., None]
        return jnp.where(valid, idx, -1).astype(jnp.int32), deg

    out_edges, deg_out = rows(Y)
    in_edges, deg_in = rows(jnp.swapaxes(Y, -1, -2))
    degrees = jnp.stack([deg_in, deg_out], axis=-1)
    return {'degrees': degrees, 'in_edges': in_edges, 'out_edges': out_edges}


def max_degree_bound(Y_host, miss_mask=None):
    """Static safe bound on any row/column degree across all resamplings of
    the missing dyads: fixed observed edges plus every missing slot in that
    row/column, maxed over (t, node, direction)."""
    Y = np.asarray(Y_host)
    miss = (np.zeros_like(Y, dtype=bool) if miss_mask is None
            else np.asarray(miss_mask, dtype=bool))
    fixed = (Y == 1) & ~miss
    bound = 0
    for axis in (1, 2):
        bound = max(bound, int((fixed.sum(axis=axis)
                                + miss.sum(axis=axis)).max()))
    return max(min(bound, Y.shape[-1] - 1), 1)


def sample_control_nodes(key, Y, n_control, directed=True):
    """Draw ``n_control`` non-edge partners per (t, node) without replacement.

    Gumbel top-k over masked scores replaces the reference's Python
    set-difference sampling (case_control_likelihood.py:75-112).  Rows with
    fewer eligible partners than ``n_control`` are padded with -1.

    Returns (control_in, control_out) int32 (T, n, n_control); undirected
    networks need only one control set per node, so ``control_in`` is None
    when ``directed=False``.
    """
    T, n, _ = Y.shape
    k_out, k_in = jax.random.split(key)
    eye = jnp.eye(n, dtype=bool)

    def draw(k, adj):
        eligible = jnp.logical_and(adj == 0, ~eye)          # (T, n, n)
        g = jax.random.gumbel(k, (T, n, n))
        scores = jnp.where(eligible, g, -jnp.inf)
        _, idx = jax.lax.top_k(scores, n_control)           # (T, n, m)
        n_eligible = jnp.sum(eligible, axis=-1)             # (T, n)
        rank = jnp.arange(n_control)[None, None, :]
        valid = rank < n_eligible[..., None]
        return jnp.where(valid, idx, -1).astype(jnp.int32)

    if not directed:
        return None, draw(k_out, Y)
    return draw(k_in, jnp.swapaxes(Y, -1, -2)), draw(k_out, Y)


def _gather_partners(X, idx):
    """partners[t, ..., j, :] = X[t, idx[t, ..., j], :] with -1-safe indices.

    X (T, n, d); idx (T, ..., m) -> (T, ..., m, d).
    """
    T = X.shape[0]
    safe = jnp.maximum(idx, 0)
    t_idx = jnp.arange(T).reshape((T,) + (1,) * (idx.ndim - 1))
    return X[t_idx, safe]


def _dist_to(partners, x_self):
    """Euclidean distances from x_self (..., d) to partners (..., m, d)."""
    diff = partners - x_self[..., None, :]
    return jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0))


def approx_directed_partial_loglik(X, radii, node_id, x_new, in_edges,
                                   out_edges, degrees, control_in,
                                   control_out, intercept_in, intercept_out):
    """Case-control per-node log-likelihood at candidate positions, all time
    steps at once (reference directed_likelihoods_fast.pyx:83-182).

    X (T, n, d); x_new (T, d); in_edges/out_edges (T, max_deg);
    control_in/out (T, m); degrees (T, 2).  Returns (T,) loglik terms.
    """
    n = X.shape[1]
    r_self = radii[node_id]

    def eta_for(idx, self_is_sender):
        dist = _dist_to(_gather_partners(X, idx), x_new)     # (T, m)
        r_other = radii[jnp.maximum(idx, 0)]
        if self_is_sender:
            return (intercept_in * (1.0 - dist / r_other)
                    + intercept_out * (1.0 - dist / r_self))
        return (intercept_in * (1.0 - dist / r_self)
                + intercept_out * (1.0 - dist / r_other))

    def edge_term(idx, self_is_sender):
        eta = eta_for(idx, self_is_sender)
        term = eta - jax.nn.softplus(eta)
        return jnp.sum(jnp.where(idx >= 0, term, 0.0), axis=-1)

    def control_term(idx, degree, self_is_sender):
        valid = idx >= 0
        n_valid = jnp.maximum(jnp.sum(valid, axis=-1), 1)    # (T,)
        eta = eta_for(idx, self_is_sender)
        ctrl = jnp.sum(jnp.where(valid, jax.nn.softplus(eta), 0.0), axis=-1)
        return (n - degree - 1).astype(ctrl.dtype) / n_valid * ctrl

    ll = edge_term(in_edges, self_is_sender=False)
    ll += edge_term(out_edges, self_is_sender=True)
    ll -= control_term(control_in, degrees[:, 0], self_is_sender=False)
    ll -= control_term(control_out, degrees[:, 1], self_is_sender=True)
    return ll


def approx_directed_loglik_full(X, radii, out_edges, degrees, control_out,
                                intercept_in, intercept_out):
    """Case-control full network log-likelihood: exact out-edge terms plus
    scaled control estimates, summed over (t, i)
    (reference directed_likelihoods_fast.pyx:208-270).

    X (T, n, d); out_edges (T, n, max_out); control_out (T, n, m).
    """
    T, n, d = X.shape
    r_self = radii[None, :, None]                            # sender radius

    valid_e = out_edges >= 0
    dist_e = _dist_to(_gather_partners(X, out_edges), X)     # (T, n, max_out)
    r_other = radii[jnp.maximum(out_edges, 0)]
    eta_e = (intercept_in * (1.0 - dist_e / r_other)
             + intercept_out * (1.0 - dist_e / r_self))
    ll = jnp.sum(jnp.where(valid_e, eta_e - jax.nn.softplus(eta_e), 0.0))

    valid_c = control_out >= 0
    n_valid = jnp.maximum(jnp.sum(valid_c, axis=-1), 1)      # (T, n)
    dist_c = _dist_to(_gather_partners(X, control_out), X)
    r_other_c = radii[jnp.maximum(control_out, 0)]
    eta_c = (intercept_in * (1.0 - dist_c / r_other_c)
             + intercept_out * (1.0 - dist_c / r_self))
    ctrl = jnp.sum(jnp.where(valid_c, jax.nn.softplus(eta_c), 0.0), axis=-1)
    adj = (n - degrees[..., 1] - 1).astype(ctrl.dtype) / n_valid
    return ll - jnp.sum(adj * ctrl)


def approx_undirected_partial_loglik(X, x_new, edges, degrees, controls,
                                     intercept):
    """Undirected case-control per-node log-likelihood at candidate
    positions, all time steps at once (reference
    static_network_fast.pyx:47-94): exact Bernoulli terms for the node's
    edges plus a scaled control estimate of its non-edge terms.

    X (T, n, d); x_new (T, d); edges (T, max_deg); degrees (T,);
    controls (T, m).  Returns (T,) loglik terms.
    """
    n = X.shape[1]

    dist_e = _dist_to(_gather_partners(X, edges), x_new)       # (T, max_deg)
    eta_e = intercept - dist_e
    ll = jnp.sum(jnp.where(edges >= 0, eta_e - jax.nn.softplus(eta_e), 0.0),
                 axis=-1)

    valid_c = controls >= 0
    n_valid = jnp.maximum(jnp.sum(valid_c, axis=-1), 1)        # (T,)
    dist_c = _dist_to(_gather_partners(X, controls), x_new)
    eta_c = intercept - dist_c
    ctrl = jnp.sum(jnp.where(valid_c, jax.nn.softplus(eta_c), 0.0), axis=-1)
    return ll - (n - degrees - 1).astype(ctrl.dtype) / n_valid * ctrl


def approx_undirected_loglik_full(X, edges, degrees, controls, intercept):
    """Undirected case-control full network log-likelihood: per-row exact
    edge terms plus scaled control estimates, halved because each dyad
    appears in two rows (undirected analog of
    directed_likelihoods_fast.pyx:208-270; the reference never ships a full
    undirected approximation).

    X (T, n, d); edges (T, n, max_deg); controls (T, n, m); degrees (T, n).
    """
    n = X.shape[1]

    valid_e = edges >= 0
    dist_e = _dist_to(_gather_partners(X, edges), X)           # (T, n, max_deg)
    eta_e = intercept - dist_e
    ll = jnp.sum(jnp.where(valid_e, eta_e - jax.nn.softplus(eta_e), 0.0))

    valid_c = controls >= 0
    n_valid = jnp.maximum(jnp.sum(valid_c, axis=-1), 1)        # (T, n)
    dist_c = _dist_to(_gather_partners(X, controls), X)
    eta_c = intercept - dist_c
    ctrl = jnp.sum(jnp.where(valid_c, jax.nn.softplus(eta_c), 0.0), axis=-1)
    adj = (n - degrees - 1).astype(ctrl.dtype) / n_valid
    return 0.5 * (ll - jnp.sum(adj * ctrl))


def approx_partial_loglik_all(X, Xq, cc, intercept, radii, is_directed):
    """Case-control per-node log-likelihood terms for *every* node at once:
    node j evaluated at ``Xq[:, j]`` against the field ``X``.  Used by the
    stale-field parallel latent update.  Returns (T, n)."""
    if is_directed:
        fn = jax.vmap(
            lambda j, x, ie, oe, dg, ci, co: approx_directed_partial_loglik(
                X, radii, j, x, ie, oe, dg, ci, co,
                intercept[0], intercept[1]),
            in_axes=(0, 1, 1, 1, 1, 1, 1), out_axes=1)
        return fn(jnp.arange(X.shape[1]), Xq, cc['in_edges'],
                  cc['out_edges'], cc['degrees'], cc['ctrl_in'],
                  cc['ctrl_out'])
    fn = jax.vmap(
        lambda x, e, dg, c: approx_undirected_partial_loglik(
            X, x, e, dg, c, intercept[0]),
        in_axes=(1, 1, 1, 1), out_axes=1)
    return fn(Xq, cc['out_edges'], cc['degrees'][..., 1], cc['ctrl_out'])
