"""Bernoulli network log-likelihood kernels (undirected + directed).

TPU-native replacements for the reference Cython kernels:

* ``partial_loglikelihood``            (static_network_fast.pyx:17-44)
* ``directed_partial_loglikelihood``   (directed_likelihoods_fast.pyx:46-80)
* ``directed_network_loglikelihood_fast`` (directed_likelihoods_fast.pyx:185-205)
* ``directed_network_probas``          (directed_likelihoods_fast.pyx:273-294)
* ``dynamic_network_loglikelihood_undirected`` (network_likelihoods.py:26-33)
* ``directed_intercept_grad``          (directed_likelihoods_fast.pyx:20-43)

Design: instead of scalar per-dyad loops, every kernel is a fused
broadcast + masked reduction over the (T, n, n) dyad tensor so XLA maps it
onto the VPU in one pass.  ``log(1 + exp(eta))`` is replaced by the stable
``softplus`` everywhere (the reference relies on float64 headroom).
"""
import jax
import jax.numpy as jnp

from .distances import pairwise_distances, distances_to_point


def _offdiag_mask(n, dtype):
    return 1.0 - jnp.eye(n, dtype=dtype)


# ---------------------------------------------------------------------------
# undirected
# ---------------------------------------------------------------------------

def undirected_loglik_full(Y, dist, intercept):
    """Full undirected Bernoulli log-likelihood.

    ``sum_{t, i<j} Y_tij * eta - log(1 + exp(eta))`` with
    ``eta = intercept - dist`` (reference network_likelihoods.py:26-33).
    Computed as 0.5 * masked sum over the full symmetric matrix.

    Parameters
    ----------
    Y, dist : (..., T, n, n)
    intercept : scalar or (...,) broadcastable
    """
    n = Y.shape[-1]
    eta = jnp.asarray(intercept)[..., None, None, None] - dist
    ll = Y * eta - jax.nn.softplus(eta)
    mask = _offdiag_mask(n, ll.dtype)
    return 0.5 * jnp.sum(ll * mask, axis=(-3, -2, -1))


def undirected_loglik_pair(Y, dist, b_cur, b_prop):
    """Both MH candidate log-likelihoods in one fused traversal.

    The intercept MH step needs ``ll(b_cur)`` and ``ll(b_prop)`` against the
    same cached distances; evaluating them in one function lets XLA fuse the
    two masked reductions into a single pass over the (T, n, n) tensors —
    one HBM read instead of two (the dominant cost at large n).
    """
    n = Y.shape[-1]
    mask = _offdiag_mask(n, dist.dtype)

    def one(b):
        eta = jnp.asarray(b)[..., None, None, None] - dist
        ll = Y * eta - jax.nn.softplus(eta)
        return 0.5 * jnp.sum(ll * mask, axis=(-3, -2, -1))

    return one(b_cur), one(b_prop)


def directed_loglik_pair(Y, dist, radii, bs_cur, bs_prop):
    """Directed analogue of :func:`undirected_loglik_pair`: two
    (intercept_in, intercept_out) candidates sharing the ``d_in``/``d_out``
    geometry factors and one pass over (T, n, n)."""
    n = Y.shape[-1]
    mask = _offdiag_mask(n, dist.dtype)
    d_in = 1.0 - dist / radii[..., None, :]
    d_out = 1.0 - dist / radii[..., :, None]

    def one(b_in, b_out):
        eta = b_in * d_in + b_out * d_out
        ll = Y * eta - jax.nn.softplus(eta)
        return jnp.sum(ll * mask, axis=(-3, -2, -1))

    return one(*bs_cur), one(*bs_prop)


def undirected_partial_loglik(Y_rows, X, x_new, intercept):
    """Log-likelihood terms involving one node's (possibly proposed) position.

    Vectorised equivalent of the reference's Cython ``partial_loglikelihood``
    (static_network_fast.pyx:17-44): the row of Bernoulli terms for a node,
    evaluated at position ``x_new`` against the current field ``X``.

    Parameters
    ----------
    Y_rows : (..., n) adjacency row Y[t, j, :] for the node being updated.
    X      : (..., n, d) all positions at that time step.
    x_new  : (..., d) the node's position to evaluate.
    intercept : scalar or broadcastable.

    Returns
    -------
    loglik : (...,) sum over the n-1 partners (self term masked out via the
        exact-zero distance — reproduced by masking the node's own slot
        outside this function).
    """
    dist = distances_to_point(X, x_new)
    eta = intercept - dist
    return Y_rows * eta - jax.nn.softplus(eta)


# ---------------------------------------------------------------------------
# directed (social-radii model)
# ---------------------------------------------------------------------------

def directed_eta(dist, radii, intercept_in, intercept_out):
    """eta_tij = b_in (1 - d_tij / r_j) + b_out (1 - d_tij / r_i).

    (reference directed_likelihoods_fast.pyx:199-202)
    """
    d_in = 1.0 - dist / radii[..., None, :]    # divide by r_j (receiver)
    d_out = 1.0 - dist / radii[..., :, None]   # divide by r_i (sender)
    b_in = jnp.asarray(intercept_in)[..., None, None]
    b_out = jnp.asarray(intercept_out)[..., None, None]
    return b_in * d_in + b_out * d_out


def directed_loglik_full(Y, dist, radii, intercept_in, intercept_out):
    """Full directed Bernoulli log-likelihood.

    (reference directed_network_loglikelihood_fast,
    directed_likelihoods_fast.pyx:185-205)

    Parameters
    ----------
    Y, dist : (..., T, n, n)
    radii : (..., n)
    """
    n = Y.shape[-1]
    eta = directed_eta(dist, radii, intercept_in, intercept_out)
    ll = Y * eta - jax.nn.softplus(eta)
    mask = _offdiag_mask(n, ll.dtype)
    return jnp.sum(ll * mask, axis=(-3, -2, -1))


def directed_partial_loglik(Y_row, Y_col, X, x_new, radii, r_node,
                            intercept_in, intercept_out):
    """Directed per-node log-likelihood terms at proposed position ``x_new``.

    Mirrors ``directed_partial_loglikelihood``
    (directed_likelihoods_fast.pyx:46-80): both the outgoing row Y[j, :]
    and incoming column Y[:, j] terms.

    Parameters
    ----------
    Y_row : (..., n)  Y[t, j, :]  (j -> i edges)
    Y_col : (..., n)  Y[t, :, j]  (i -> j edges)
    X : (..., n, d); x_new : (..., d)
    radii : (..., n); r_node : (...,) radius of the node being updated.

    Returns per-partner terms, shape (..., n); caller masks slot j.
    """
    dist = distances_to_point(X, x_new)
    r_node = r_node[..., None]
    # Y_jit' with j as the sender: eta = b_in (1 - d/r_i) + b_out (1 - d/r_j)
    eta_out = (intercept_in * (1.0 - dist / radii)
               + intercept_out * (1.0 - dist / r_node))
    # i as the sender, j receiver
    eta_in = (intercept_in * (1.0 - dist / r_node)
              + intercept_out * (1.0 - dist / radii))
    ll = Y_row * eta_out - jax.nn.softplus(eta_out)
    ll += Y_col * eta_in - jax.nn.softplus(eta_in)
    return ll


def directed_network_probas(dist, radii, intercept_in, intercept_out):
    """Directed connection-probability matrix with zeroed diagonal.

    (reference directed_likelihoods_fast.pyx:273-294)
    """
    n = dist.shape[-1]
    eta = directed_eta(dist, radii, intercept_in, intercept_out)
    probas = jax.nn.sigmoid(eta)
    return probas * _offdiag_mask(n, probas.dtype)


def undirected_network_probas(dist, intercept):
    """expit(intercept - dist) with zeroed diagonal (reference lsm.py:290-308)."""
    n = dist.shape[-1]
    probas = jax.nn.sigmoid(jnp.asarray(intercept)[..., None, None, None] - dist)
    return probas * _offdiag_mask(n, probas.dtype)


def directed_intercept_grad(Y, dist, radii, intercept_in, intercept_out):
    """Gradient of the directed log-likelihood w.r.t. (b_in, b_out).

    (reference directed_likelihoods_fast.pyx:20-43)
    """
    n = Y.shape[-1]
    d_in = 1.0 - dist / radii[None, None, :]
    d_out = 1.0 - dist / radii[None, :, None]
    eta = intercept_in * d_in + intercept_out * d_out
    step = (Y - jax.nn.sigmoid(eta)) * _offdiag_mask(n, Y.dtype)
    return jnp.stack([jnp.sum(d_in * step), jnp.sum(d_out * step)])


# convenience wrappers matching the reference dispatch layer
# (reference network_likelihoods.py:16-33)

def dynamic_network_loglikelihood_undirected(Y, X, intercept, squared=False,
                                             dist=None):
    if dist is None:
        dist = pairwise_distances(X, squared=squared)
    return undirected_loglik_full(Y, dist, intercept)


def dynamic_network_loglikelihood_directed(Y, X, intercept_in, intercept_out,
                                           radii, squared=False, dist=None):
    if dist is None:
        dist = pairwise_distances(X, squared=squared)
    return directed_loglik_full(Y, dist, radii, intercept_in, intercept_out)


def dynamic_network_loglikelihood(Y, X, intercept, radii=None, squared=False,
                                  dist=None):
    """Directed/undirected dispatch on the presence of ``radii``
    (reference network_likelihoods.py:16-23)."""
    if radii is not None:
        intercept = jnp.atleast_1d(jnp.asarray(intercept))
        return dynamic_network_loglikelihood_directed(
            Y, X, intercept[..., 0], intercept[..., 1], radii,
            squared=squared, dist=dist)
    return dynamic_network_loglikelihood_undirected(
        Y, X, intercept, squared=squared, dist=dist)
