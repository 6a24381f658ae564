"""Case-control likelihood approximation (directed and undirected).

TPU-native replacement for the reference's CaseControlSampler +
``approx_directed_*`` Cython kernels (case_control_likelihood.py:36-112,
directed_likelihoods_fast.pyx:83-270) and the undirected
``approx_partial_loglikelihood`` (static_network_fast.pyx:47-94, which the
reference ships but never wires up): exact terms for observed edges plus
a scaled random sample of "control" non-edges, turning the O(n^2) dyad sum
into O(n * (deg_max + n_control)).

Differences from the reference's host-side design, driven by TPU
performance characteristics (all validated by parity/limit tests):

* edge lists are padded (T, n, max_degree) index tensors with -1 validity
  padding instead of ragged arrays;
* control sets are drawn PER NODE, shared across time steps: ``ctrl``
  is an (n, m) index tensor plus a (T, n, m) per-time validity mask
  (a draw is valid at t when it is currently a non-edge there).  The
  reference draws controls per (t, i) (case_control_likelihood.py:75-91);
  conditioned on validity both schemes draw uniformly over the eligible
  non-edges of (t, i), so the estimator is the same — but the shared
  index lets every consumer gather each control's full time TRAJECTORY
  as one contiguous row from a node-major position table, amortizing the
  per-row gather cost T-fold (TPU gathers are row-count-bound at
  ~10 ns/row regardless of row size or batch width);
* controls are drawn in-device with replacement and masked (duplicates
  keep the mean-softplus estimator valid; the scaled control term
  divides by the count of valid draws);
* when missing dyads are Gibbs-resampled the edge structure changes
  between sweeps, so the padded edge lists are rebuilt in-device from the
  current adjacency by a top-k pass (:func:`edge_lists_device`) and the
  validity masks recomputed, instead of the reference's host-side
  ``MissingDirectedCaseControlSampler`` rebuild
  (case_control_likelihood.py:115-186).
"""
from functools import lru_cache

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


def color_conflict_graph(lists, n, miss_mask=None, seed=0):
    """Balanced greedy coloring of the node-conflict graph for the exact
    chromatic case-control scan (mcmc/latent.cc_colored_scan).

    Two nodes conflict when their single-site conditionals can depend on
    each other under the case-control likelihood: an observed edge in any
    direction at any time step, or a missing dyad (which Gibbs resampling
    can turn into an edge mid-fit).  Control-set dependencies never cross
    color classes because :func:`sample_controls_colored` draws controls
    only from other classes, so a proper coloring of this graph makes all
    nodes of one class conditionally independent given the rest — the
    class-parallel update is exact blocked Gibbs, with O(n_colors)
    sequential steps per sweep instead of the reference's O(n)
    (case_control_likelihood.py:36-112 keeps the sequential scan because
    CPython has nothing to vectorise over).

    The coloring is over the UNION graph across time: a node's whole
    trajectory belongs to one class, so each class can gather its control
    partners' positions as contiguous node-major trajectories (one
    ~T*12 B row per control instead of T separate rows — the gather is
    row-count-bound).  A per-timestep coloring needs ~T-fold fewer colors
    but forfeits the trajectory gather, which measures slower at n >= 500.

    ``lists``: host edge-list dict from :func:`build_edge_lists`.
    Greedy over a random node order, assigning each node the least-loaded
    non-conflicting color — load balancing keeps the padded class size
    S ~ n / n_colors so the vectorised per-class work stays ~O(n) total.

    Returns (colors (n,) int32, groups (n_colors, S) int32 with -1 pad).
    """
    pairs = []
    for name in ('in_edges', 'out_edges'):
        e = np.asarray(lists[name])                      # (T, n, D)
        _, src, _ = np.nonzero(e >= 0)
        pairs.append(np.stack([src, e[e >= 0]], axis=1))
    if miss_mask is not None:
        _, i, j = np.nonzero(np.asarray(miss_mask))
        pairs.append(np.stack([i, j], axis=1))
    pairs = np.concatenate(pairs, axis=0)
    # symmetrize + dedupe
    pairs = np.concatenate([pairs, pairs[:, ::-1]], axis=0)
    pairs = pairs[pairs[:, 0] != pairs[:, 1]]
    pairs = np.unique(pairs, axis=0)
    # CSR neighbour lists
    order_idx = np.argsort(pairs[:, 0], kind='stable')
    pairs = pairs[order_idx]
    counts = np.bincount(pairs[:, 0], minlength=n)
    indptr = np.concatenate([[0], np.cumsum(counts)])
    nbr = pairs[:, 1]

    rng = np.random.RandomState(seed)
    colors = np.full(n, -1, dtype=np.int64)
    loads = []
    for j in rng.permutation(n):
        nb_colors = colors[nbr[indptr[j]:indptr[j + 1]]]
        nb_colors = nb_colors[nb_colors >= 0]
        masked = np.array(loads, dtype=np.float64)
        if masked.size:
            masked[np.unique(nb_colors)] = np.inf
        if masked.size and np.isfinite(masked).any():
            c = int(np.argmin(masked))
        else:
            c = len(loads)
            loads.append(0)
        colors[j] = c
        loads[c] += 1
    n_colors = len(loads)
    S = int(max(loads))
    groups = np.full((n_colors, S), -1, dtype=np.int32)
    for c in range(n_colors):
        members = np.flatnonzero(colors == c)
        groups[c, :members.shape[0]] = members
    return colors.astype(np.int32), groups


# ---------------------------------------------------------------------------
# control sampling (shared-across-time node indices + per-time validity)
# ---------------------------------------------------------------------------


def sample_controls_colored(key, colors, n, n_control, directed=True):
    """Draw ``n_control`` control-node indices per node, shared across all
    time steps: uniform candidates in [0, n), masked to -1 where globally
    invalid (self, or in the node's own color class).  Per-time edge
    validity is separate (:func:`control_valid_masks`) so the draw never
    touches the adjacency — O(n * m) memory and work at any n.

    Differences from the reference's host-side per-(t, i) set-difference
    draw (case_control_likelihood.py:92-111): candidates are drawn *with*
    replacement (duplicates keep the per-row mean-softplus estimator
    valid; the scaled control term divides by the count of valid draws),
    shared across t (conditioned on per-t validity each valid draw is
    uniform over that step's eligible non-edges, so the estimator is
    unchanged), and the node's own color class is excluded from the pool
    — a uniformly random ~1/n_colors of nodes.

    Returns (ctrl_in, ctrl_out) int32 (n, m); ctrl_in is None when
    undirected.

    Batch-aware: under a chain-vmapped sweep the redraw key is
    chain-invariant (sweeps._refresh_controls), so a vmap would compute C
    identical draws; the custom_vmap rule computes ONE and broadcasts.
    """
    return _controls_vmap(directed, int(n), int(n_control))(key, colors)


@lru_cache(maxsize=None)
def _controls_vmap(directed, n, n_control):
    def single(key, colors):
        node = jnp.arange(n, dtype=jnp.int32)[:, None]

        def draw(k):
            cand = jax.random.randint(k, (n, n_control), 0, n,
                                      dtype=jnp.int32)
            bad = cand == node
            bad |= colors[cand] == colors[:, None]
            return jnp.where(bad, -1, cand)

        k_out, k_in = jax.random.split(key)
        return (draw(k_in) if directed else None), draw(k_out)

    f = jax.custom_batching.custom_vmap(single)

    @f.def_vmap
    def _rule(axis_size, in_batched, key, colors):
        if not any(jax.tree.leaves(in_batched)):
            out = single(key, colors)
            bcast = jax.tree.map(
                lambda a: jnp.broadcast_to(a, (axis_size,) + a.shape), out)
            return bcast, jax.tree.map(lambda _: True, out)
        in_axes = tuple(0 if b else None for b in in_batched)
        out = jax.vmap(single, in_axes=in_axes)(key, colors)
        return out, jax.tree.map(lambda _: True, out)

    return f


def sample_control_nodes(key, Y, n_control, directed=True):
    """Control draw for fits without color classes (the sequential fori
    scan): the same shared-across-time uniform draw as
    :func:`sample_controls_colored` but with no color exclusion (the
    sequential scan needs none).  ``Y`` supplies only the node count.

    Returns (ctrl_in, ctrl_out) int32 (n, m); per-time edge validity comes
    from :func:`control_valid_masks`.
    """
    n = Y.shape[-1]
    # distinct per-node "colors" make the color exclusion exactly the
    # self-exclusion
    colors = jnp.arange(n, dtype=jnp.int32)
    return sample_controls_colored(key, colors, n, n_control,
                                   directed=directed)


def control_valid_masks(ctrl, edges):
    """Per-time validity of the shared control draws: slot (t, j, c) is
    valid when the draw is a real index and NOT currently an edge of j at
    t.  ``ctrl`` (n, m); ``edges`` (T, n, D) padded edge lists (out-edges
    for ctrl_out, in-edges for ctrl_in).  Returns (T, n, m) bool.

    Membership is tested chunked over the degree axis so the comparison
    buffer stays at (T, n, m).
    """
    D = edges.shape[-1]
    cand = ctrl[None]                                    # (1, n, m)

    def body(i, acc):
        col = jax.lax.dynamic_slice_in_dim(edges, i, 1, axis=2)
        return jnp.logical_or(acc, cand == col)

    is_edge = jax.lax.fori_loop(
        0, D, body,
        jnp.zeros((edges.shape[0],) + ctrl.shape, dtype=bool))
    return jnp.logical_and(ctrl[None] >= 0, ~is_edge)


def _masks_single(ctrl_in, ctrl_out, in_edges, out_edges, directed):
    vo = control_valid_masks(ctrl_out, out_edges)
    if not directed:
        return None, vo
    return control_valid_masks(ctrl_in, in_edges), vo


@lru_cache(maxsize=None)
def _masks_vmap(directed):
    if directed:
        def single(ctrl_in, ctrl_out, in_edges, out_edges):
            return _masks_single(ctrl_in, ctrl_out, in_edges, out_edges,
                                 True)
    else:
        def single(ctrl_out, out_edges):
            return _masks_single(None, ctrl_out, None, out_edges, False)

    f = jax.custom_batching.custom_vmap(single)

    @f.def_vmap
    def _rule(axis_size, in_batched, *args):
        flat = list(in_batched)
        # edge lists unbatched (shared structure): the chain-identical
        # control tensors can drop their batch axis too — one mask
        # computation, broadcast (see sweeps._refresh_controls contract)
        edges_batched = (flat[-1] or flat[-2]) if directed else flat[-1]
        if not edges_batched:
            args = [a[0] if b else a for a, b in zip(args, flat)]
            out = single(*args)
            bcast = jax.tree.map(
                lambda a: jnp.broadcast_to(a, (axis_size,) + a.shape), out)
            return bcast, jax.tree.map(lambda _: True, out)
        in_axes = tuple(0 if b else None for b in flat)
        out = jax.vmap(single, in_axes=in_axes)(*args)
        return out, jax.tree.map(lambda _: True, out)

    return f


def control_masks(ctrl_in, ctrl_out, lists, directed, shared_ctrl=False):
    """Per-time validity masks for both control sets:
    (ctrl_in_valid, ctrl_out_valid).

    ``shared_ctrl=True`` declares that any vmap batching of the control
    tensors is chain-replication of ONE shared draw (the colored sweep's
    contract; see :func:`_shared_idx_vmap`) — the mask computation then
    runs once and broadcasts.  Leave False when batching over genuinely
    distinct draws.
    """
    if not shared_ctrl:
        return _masks_single(ctrl_in, ctrl_out,
                             lists.get('in_edges'), lists['out_edges'],
                             directed)
    if directed:
        return _masks_vmap(True)(ctrl_in, ctrl_out, lists['in_edges'],
                                 lists['out_edges'])
    return _masks_vmap(False)(ctrl_out, lists['out_edges'])


# ---------------------------------------------------------------------------
# gather helpers
# ---------------------------------------------------------------------------


def _gather_partners(X, idx):
    """partners[t, ..., j, :] = X[t, idx[t, ..., j], :] with -1-safe indices.

    X (T, n, d); idx (T, ..., m) -> (T, ..., m, d).
    """
    T = X.shape[0]
    safe = jnp.maximum(idx, 0)
    t_idx = jnp.arange(T).reshape((T,) + (1,) * (idx.ndim - 1))
    return X[t_idx, safe]


def _gather_trajectories(X_nm, idx):
    """Trajectory gather: X_nm (n, T, q) node-major position table,
    idx (..., m) shared-across-time indices -> (T, ..., m, q).

    Each gathered row is one node's full (T, q) trajectory — contiguous
    in the node-major layout, so the per-row gather cost amortizes
    T-fold versus per-(t, idx) rows.
    """
    safe = jnp.maximum(idx, 0)
    g = X_nm[safe]                                       # (..., m, T, q)
    return jnp.moveaxis(g, -2, 0)                        # (T, ..., m, q)


def _node_major(X, radii=None):
    """(n, T, d[+1]) node-major position table; with ``radii`` the node's
    radius rides as an extra feature column (one 12 B row element per
    (t, partner) instead of a second element-wise radii gather)."""
    Xt = jnp.swapaxes(X, 0, 1)                           # (n, T, d)
    if radii is None:
        return Xt
    r = jnp.broadcast_to(radii[:, None, None], Xt.shape[:2] + (1,))
    return jnp.concatenate([Xt, r], axis=-1)


def _dist_to(partners, x_self):
    """Euclidean distances from x_self (..., d) to partners (..., m, d)."""
    diff = partners - x_self[..., None, :]
    return jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0))


# ---------------------------------------------------------------------------
# per-node / per-class likelihood evaluators
# ---------------------------------------------------------------------------


def class_partial_loglik_segments(x_new, dist, valid, r_all, r_self,
                                  sender_mask, offsets, degrees, b_in,
                                  b_out, n, is_directed):
    """Case-control per-node log-likelihood for a whole color class from
    pre-gathered concatenated partner segments (directed:
    [in_edges | out_edges | ctrl_in | ctrl_out]; undirected:
    [out_edges | ctrl_out]).  Reference formulas:
    directed_likelihoods_fast.pyx:83-182 / static_network_fast.pyx:47-94.

    dist (T, S, Mtot) distances from the class's candidates to the
    partners; valid (T, S, Mtot); r_all (T, S, Mtot) partner radii /
    r_self (..., S) broadcastable (directed); sender_mask (1, 1, Mtot)
    — 1 where the node is the dyad's sender; offsets: static per-set
    boundaries; degrees (T, S, 2) directed / (T, S) undirected.
    Returns (T, S).
    """
    del x_new
    if is_directed:
        rs = jnp.broadcast_to(r_self[..., None], dist.shape[:2] + (1,))
        # eta for a dyad where the node sends: b_in(1-d/r_other) +
        # b_out(1-d/r_self); receiving swaps the radii — one select keeps
        # the expression structure of the per-set reference formulas
        r_bin = jnp.where(sender_mask, r_all, rs)
        r_bout = jnp.where(sender_mask, rs, r_all)
        eta = (b_in * (1.0 - dist / r_bin)
               + b_out * (1.0 - dist / r_bout))
    else:
        eta = b_in - dist
    sp = jax.nn.softplus(eta)

    def seg(a, i):
        return a[..., offsets[i]:offsets[i + 1]]

    def edge_term(i):
        return jnp.sum(jnp.where(seg(valid, i), seg(eta, i) - seg(sp, i),
                                 0.0), axis=-1)

    def control_term(i, degree):
        v = seg(valid, i)
        n_valid = jnp.maximum(jnp.sum(v, axis=-1), 1)
        ctrl = jnp.sum(jnp.where(v, seg(sp, i), 0.0), axis=-1)
        return (n - degree - 1).astype(ctrl.dtype) / n_valid * ctrl

    if is_directed:
        ll = edge_term(0)                                # in edges
        ll += edge_term(1)                               # out edges
        ll -= control_term(2, degrees[..., 0])           # ctrl_in
        ll -= control_term(3, degrees[..., 1])           # ctrl_out
        return ll
    ll = edge_term(0)
    return ll - control_term(1, degrees)


def approx_directed_partial_loglik(X, radii, node_id, x_new, in_edges,
                                   out_edges, degrees, ctrl_in, ctrl_out,
                                   ctrl_in_valid, ctrl_out_valid,
                                   intercept_in, intercept_out):
    """Case-control per-node log-likelihood at candidate positions, all
    time steps at once (reference directed_likelihoods_fast.pyx:83-182).

    X (T, n, d); x_new (T, d); in_edges/out_edges (T, max_deg);
    ctrl_in/out (m,) shared-across-time draws with (T, m) validity masks;
    degrees (T, 2).  Returns (T,) loglik terms.
    """
    n = X.shape[1]
    r_self = radii[node_id]

    def eta_for(dist, r_other, self_is_sender):
        if self_is_sender:
            return (intercept_in * (1.0 - dist / r_other)
                    + intercept_out * (1.0 - dist / r_self))
        return (intercept_in * (1.0 - dist / r_self)
                + intercept_out * (1.0 - dist / r_other))

    def edge_term(idx, self_is_sender):
        dist = _dist_to(_gather_partners(X, idx), x_new)     # (T, m)
        r_other = radii[jnp.maximum(idx, 0)]
        eta = eta_for(dist, r_other, self_is_sender)
        term = eta - jax.nn.softplus(eta)
        return jnp.sum(jnp.where(idx >= 0, term, 0.0), axis=-1)

    def control_term(idx, valid, degree, self_is_sender):
        safe = jnp.maximum(idx, 0)
        pos = X[:, safe]                                     # (T, m, d)
        dist = _dist_to(pos, x_new)
        r_other = radii[safe][None]
        n_valid = jnp.maximum(jnp.sum(valid, axis=-1), 1)    # (T,)
        eta = eta_for(dist, r_other, self_is_sender)
        ctrl = jnp.sum(jnp.where(valid, jax.nn.softplus(eta), 0.0), axis=-1)
        return (n - degree - 1).astype(ctrl.dtype) / n_valid * ctrl

    ll = edge_term(in_edges, self_is_sender=False)
    ll += edge_term(out_edges, self_is_sender=True)
    ll -= control_term(ctrl_in, ctrl_in_valid, degrees[:, 0],
                       self_is_sender=False)
    ll -= control_term(ctrl_out, ctrl_out_valid, degrees[:, 1],
                       self_is_sender=True)
    return ll


def approx_undirected_partial_loglik(X, x_new, edges, degrees, ctrl,
                                     ctrl_valid, intercept):
    """Undirected case-control per-node log-likelihood at candidate
    positions, all time steps at once (reference
    static_network_fast.pyx:47-94): exact Bernoulli terms for the node's
    edges plus a scaled control estimate of its non-edge terms.

    X (T, n, d); x_new (T, d); edges (T, max_deg); degrees (T,);
    ctrl (m,) shared draws with (T, m) validity.  Returns (T,).
    """
    n = X.shape[1]

    dist_e = _dist_to(_gather_partners(X, edges), x_new)       # (T, max_deg)
    eta_e = intercept - dist_e
    ll = jnp.sum(jnp.where(edges >= 0, eta_e - jax.nn.softplus(eta_e), 0.0),
                 axis=-1)

    n_valid = jnp.maximum(jnp.sum(ctrl_valid, axis=-1), 1)     # (T,)
    pos = X[:, jnp.maximum(ctrl, 0)]                           # (T, m, d)
    dist_c = _dist_to(pos, x_new)
    eta_c = intercept - dist_c
    ctrl_sum = jnp.sum(jnp.where(ctrl_valid, jax.nn.softplus(eta_c), 0.0),
                       axis=-1)
    return ll - (n - degrees - 1).astype(ctrl_sum.dtype) / n_valid * ctrl_sum


# ---------------------------------------------------------------------------
# full-network evaluators (intercept/radii MH, log joint)
# ---------------------------------------------------------------------------


def _shared_idx_vmap(single, out_edges_arg, ctrl_args):
    """custom_vmap factory for cc evaluators: under a chain-vmapped sweep
    the control tensors are per-chain state leaves, so their gathers would
    lower as batched-index gathers — ~10x slower than shared-index gathers
    (measured 1.2 vs 12.8 GB/s at 16 chains).  The colored path draws
    controls from a chain-invariant key, so the batched control tensors
    are chain-identical; drop their batch axis (slice 0) whenever the edge
    structure itself is shared.  Per-chain edge structures (missing-dyad
    fits) keep batched indices — correctness before speed."""
    f = jax.custom_batching.custom_vmap(single)

    @f.def_vmap
    def _rule(axis_size, in_batched, *args):
        args = list(args)
        batched = list(in_batched)
        if not batched[out_edges_arg]:
            for i in ctrl_args:
                if batched[i]:
                    args[i] = args[i][0]
                    batched[i] = False
        in_axes = tuple(0 if b else None for b in batched)
        out = jax.vmap(single, in_axes=in_axes)(*args)
        return out, True

    return f


def _node_blocks(n, per_node_elems):
    """Node-block size bounding a full evaluator's gathered transients:
    without chunking the (T, n, M, d+1) gathers materialize gigabytes
    once the sweep is vmapped over chains.  Returns (n_pad, nb) with
    nb | n_pad; nb = n means no chunking."""
    if per_node_elems * n <= (1 << 22):
        return n, n
    nb = max(32, (1 << 18) // max(per_node_elems // 1, 1))
    nb = min(nb, n)
    n_pad = -(-n // nb) * nb
    return n_pad, nb


def _pad_nodes(a, n_pad, axis, fill):
    n = a.shape[axis]
    if n == n_pad:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, n_pad - n)
    return jnp.pad(a, widths, constant_values=fill)


def _approx_directed_full(X, radii, out_edges, degrees, ctrl_out,
                          ctrl_out_valid, intercept_in, intercept_out):
    T, n, d = X.shape
    Mo, m = out_edges.shape[-1], ctrl_out.shape[-1]
    # partner radii ride the position gathers as a feature column — one
    # row per partner instead of a second element-wise radii gather
    Xr = jnp.concatenate(
        [X, jnp.broadcast_to(radii[None, :, None], (T, n, 1))], axis=-1)
    Xnm = _node_major(X, radii)                              # (n, T, d+1)

    def block(args):
        """Log-lik contribution of one node block: exact out-edge terms +
        scaled control estimates (reference
        directed_likelihoods_fast.pyx:208-270)."""
        oe, deg, co, cov, x_blk, rs = args
        # node-major block slices back to the (T, nb, ...) layout
        oe = jnp.swapaxes(oe, 0, 1)                          # (T, nb, Mo)
        deg = jnp.swapaxes(deg, 0, 1)                        # (T, nb)
        cov = jnp.swapaxes(cov, 0, 1)                        # (T, nb, m)
        x_blk = jnp.swapaxes(x_blk, 0, 1)                    # (T, nb, d)
        r_self = rs[None, :, None]

        valid_e = oe >= 0
        ge = _gather_partners(Xr, oe)                        # (T,nb,Mo,d+1)
        dist_e = _dist_to(ge[..., :d], x_blk)
        r_other = ge[..., d]
        eta_e = (intercept_in * (1.0 - dist_e / r_other)
                 + intercept_out * (1.0 - dist_e / r_self))
        ll = jnp.sum(jnp.where(valid_e, eta_e - jax.nn.softplus(eta_e),
                               0.0))

        # controls: one contiguous trajectory row per (node, control)
        n_valid = jnp.maximum(jnp.sum(cov, axis=-1), 1)      # (T, nb)
        gc = _gather_trajectories(Xnm, co)                   # (T, nb, m, d+1)
        dist_c = _dist_to(gc[..., :d], x_blk)
        r_other_c = gc[..., d]
        eta_c = (intercept_in * (1.0 - dist_c / r_other_c)
                 + intercept_out * (1.0 - dist_c / r_self))
        ctrl = jnp.sum(jnp.where(cov, jax.nn.softplus(eta_c), 0.0),
                       axis=-1)
        adj = (n - deg - 1).astype(ctrl.dtype) / n_valid
        return ll - jnp.sum(adj * ctrl)

    n_pad, nb = _node_blocks(n, T * (Mo + m) * (d + 1))
    # node-major per-node tables (padded rows are fully masked: edges -1,
    # controls invalid, so they contribute exactly zero)
    oe_n = _pad_nodes(jnp.swapaxes(out_edges, 0, 1), n_pad, 0, -1)
    deg_n = _pad_nodes(jnp.swapaxes(degrees[..., 1], 0, 1), n_pad, 0, 0)
    co_n = _pad_nodes(ctrl_out, n_pad, 0, -1)
    cov_n = _pad_nodes(jnp.swapaxes(ctrl_out_valid, 0, 1), n_pad, 0, False)
    x_n = _pad_nodes(jnp.swapaxes(X, 0, 1), n_pad, 0, 0.0)
    rs_n = _pad_nodes(radii, n_pad, 0, 1.0)
    if nb == n_pad:
        return block((oe_n, deg_n, co_n, cov_n, x_n, rs_n))
    B = n_pad // nb
    parts = jax.lax.map(
        block, tuple(a.reshape((B, nb) + a.shape[1:])
                     for a in (oe_n, deg_n, co_n, cov_n, x_n, rs_n)))
    return jnp.sum(parts)


_directed_full_vmap = _shared_idx_vmap(_approx_directed_full,
                                       out_edges_arg=2, ctrl_args=(4, 5))


def approx_directed_loglik_full(X, radii, out_edges, degrees, ctrl_out,
                                ctrl_out_valid, intercept_in, intercept_out,
                                shared_ctrl=False):
    """Case-control full network log-likelihood: exact out-edge terms plus
    scaled control estimates, summed over (t, i)
    (reference directed_likelihoods_fast.pyx:208-270).

    X (T, n, d); out_edges (T, n, max_out); ctrl_out (n, m) shared draws
    with (T, n, m) validity.  ``shared_ctrl=True`` declares that any vmap
    batching of the control tensors is chain-replication of ONE shared
    control set (the colored sweep's contract) — the gathers then drop
    the batch axis of the indices (see :func:`_shared_idx_vmap`).  Leave
    False when vmapping over genuinely distinct control draws.
    """
    dt = X.dtype
    fn = _directed_full_vmap if shared_ctrl else _approx_directed_full
    return fn(X, radii, out_edges, degrees, ctrl_out, ctrl_out_valid,
              jnp.asarray(intercept_in, dt), jnp.asarray(intercept_out, dt))


def _approx_undirected_full(X, edges, degrees, ctrl, ctrl_valid, intercept):
    T, n, d = X.shape
    Mo, m = edges.shape[-1], ctrl.shape[-1]
    Xnm = _node_major(X)

    def block(args):
        e, deg, co, cov, x_blk = args
        e = jnp.swapaxes(e, 0, 1)                            # (T, nb, Mo)
        deg = jnp.swapaxes(deg, 0, 1)
        cov = jnp.swapaxes(cov, 0, 1)
        x_blk = jnp.swapaxes(x_blk, 0, 1)

        valid_e = e >= 0
        dist_e = _dist_to(_gather_partners(X, e), x_blk)
        eta_e = intercept - dist_e
        ll = jnp.sum(jnp.where(valid_e, eta_e - jax.nn.softplus(eta_e),
                               0.0))

        n_valid = jnp.maximum(jnp.sum(cov, axis=-1), 1)      # (T, nb)
        gc = _gather_trajectories(Xnm, co)                   # (T, nb, m, d)
        dist_c = _dist_to(gc, x_blk)
        eta_c = intercept - dist_c
        ctrl_sum = jnp.sum(jnp.where(cov, jax.nn.softplus(eta_c), 0.0),
                           axis=-1)
        adj = (n - deg - 1).astype(ctrl_sum.dtype) / n_valid
        return ll - jnp.sum(adj * ctrl_sum)

    n_pad, nb = _node_blocks(n, T * (Mo + m) * d)
    e_n = _pad_nodes(jnp.swapaxes(edges, 0, 1), n_pad, 0, -1)
    deg_n = _pad_nodes(jnp.swapaxes(degrees, 0, 1), n_pad, 0, 0)
    co_n = _pad_nodes(ctrl, n_pad, 0, -1)
    cov_n = _pad_nodes(jnp.swapaxes(ctrl_valid, 0, 1), n_pad, 0, False)
    x_n = _pad_nodes(jnp.swapaxes(X, 0, 1), n_pad, 0, 0.0)
    if nb == n_pad:
        return 0.5 * block((e_n, deg_n, co_n, cov_n, x_n))
    B = n_pad // nb
    parts = jax.lax.map(
        block, tuple(a.reshape((B, nb) + a.shape[1:])
                     for a in (e_n, deg_n, co_n, cov_n, x_n)))
    return 0.5 * jnp.sum(parts)


_undirected_full_vmap = _shared_idx_vmap(_approx_undirected_full,
                                         out_edges_arg=1, ctrl_args=(3, 4))


def approx_undirected_loglik_full(X, edges, degrees, ctrl, ctrl_valid,
                                  intercept, shared_ctrl=False):
    """Undirected case-control full network log-likelihood: per-row exact
    edge terms plus scaled control estimates, halved because each dyad
    appears in two rows (undirected analog of
    directed_likelihoods_fast.pyx:208-270; the reference never ships a full
    undirected approximation).

    X (T, n, d); edges (T, n, max_deg); ctrl (n, m) shared draws with
    (T, n, m) validity.  ``shared_ctrl``: see
    :func:`approx_directed_loglik_full`.
    """
    fn = _undirected_full_vmap if shared_ctrl else _approx_undirected_full
    return fn(X, edges, degrees, ctrl, ctrl_valid,
              jnp.asarray(intercept, X.dtype))


def approx_partial_loglik_all(X, Xq, cc, intercept, radii, is_directed):
    """Case-control per-node log-likelihood terms for *every* node at once:
    node j evaluated at ``Xq[:, j]`` against the field ``X``.  Used by the
    stale-field parallel latent update.  Returns (T, n)."""
    if is_directed:
        fn = jax.vmap(
            lambda j, x, ie, oe, dg, ci, co, civ, cov:
            approx_directed_partial_loglik(
                X, radii, j, x, ie, oe, dg, ci, co, civ, cov,
                intercept[0], intercept[1]),
            in_axes=(0, 1, 1, 1, 1, 0, 0, 1, 1), out_axes=1)
        return fn(jnp.arange(X.shape[1]), Xq, cc['in_edges'],
                  cc['out_edges'], cc['degrees'], cc['ctrl_in'],
                  cc['ctrl_out'], cc['ctrl_in_valid'], cc['ctrl_out_valid'])
    fn = jax.vmap(
        lambda x, e, dg, c, cv: approx_undirected_partial_loglik(
            X, x, e, dg, c, cv, intercept[0]),
        in_axes=(1, 1, 1, 0, 1), out_axes=1)
    return fn(Xq, cc['out_edges'], cc['degrees'][..., 1], cc['ctrl_out'],
              cc['ctrl_out_valid'])
