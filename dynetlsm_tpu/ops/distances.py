"""Pairwise latent-space distance kernels.

TPU-native replacement for the reference's ``calculate_distances``
(reference: dynetlsm/latent_space.py:19-33), which loops time steps through
sklearn ``euclidean_distances``.  Here a single fused broadcast/reduce runs
over the full (T, n, n) tensor; XLA fuses the subtract/square/sum/sqrt chain
into one VPU pass.
"""
import jax.numpy as jnp


def pairwise_distances(X, squared=False):
    """Pairwise Euclidean distances between latent positions.

    Parameters
    ----------
    X : jnp.ndarray, shape (..., n_nodes, n_features)
        Latent positions; any number of leading batch axes (time, chains).

    Returns
    -------
    dist : jnp.ndarray, shape (..., n_nodes, n_nodes)
    """
    diff = X[..., :, None, :] - X[..., None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    if squared:
        return d2
    # max(.., 0) guards tiny negative values XLA may produce when fusing.
    return jnp.sqrt(jnp.maximum(d2, 0.0))


def distances_to_point(X, x, squared=False):
    """Distances from every row of ``X`` to the single point ``x``.

    Used by the per-node Metropolis updates: O(n * d) like the reference's
    Cython ``partial_loglikelihood`` inner loop
    (reference: dynetlsm/static_network_fast.pyx:29-38).

    Parameters
    ----------
    X : (..., n_nodes, n_features)
    x : (..., n_features) broadcastable against X without the node axis.
    """
    diff = X - x[..., None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    if squared:
        return d2
    return jnp.sqrt(jnp.maximum(d2, 0.0))
