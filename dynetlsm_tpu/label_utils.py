"""Posterior label post-processing (reference dynetlsm/label_utils.py).

Host-side, but vectorised: the posterior co-occurrence accumulation over
samples is a single einsum over one-hot encodings instead of the
reference's per-sample Python loop (label_utils.py:50-62).
"""
import numpy as np
import scipy.cluster.hierarchy as hc
from scipy.spatial.distance import squareform


def renormalize_weights(model, sample_id):
    """Restrict a posterior sample's parameters to its active clusters and
    relabel z contiguously (reference label_utils.py:10-37)."""
    zs = model.zs_[sample_id]
    active = np.unique(zs.ravel())
    n_groups = active.shape[0]
    T, n = zs.shape

    beta = model.betas_[sample_id, active].copy()
    beta /= beta.sum()

    weights = model.weights_[sample_id]
    init_w = weights[0, 0, active].copy()
    init_w /= init_w.sum()

    trans_w = np.zeros((T, n_groups, n_groups))
    for t in range(1, T):
        trans_w[t] = weights[t][np.ix_(active, active)]
        trans_w[t] /= trans_w[t].sum(axis=1, keepdims=True)

    _, z = np.unique(zs.ravel(), return_inverse=True)
    z = z.reshape(T, n)

    mu = model.mus_[sample_id, active]
    sigma = model.sigmas_[sample_id, active]
    return z, beta, init_w, trans_w, mu, sigma


def calculate_cooccurrence_matrix(z, n_groups=None):
    if n_groups is None:
        n_groups = np.unique(z).shape[0]
    indicator = np.eye(n_groups)[z]
    return indicator @ indicator.T


def calculate_posterior_cooccurrence(zs, n_burn=0, t=0, n_groups=None):
    """Mean co-clustering probability over post-burn samples at time t.

    zs : (n_samples, T, n) label traces.  Uses the native group-bucketed
    accumulator (dynetlsm_tpu.native) with a one-hot einsum fallback.
    """
    from .native import cooccurrence as native_cooccurrence
    z = np.asarray(zs)[n_burn:, t]                    # (S, n)
    if n_groups is None:
        n_groups = int(z.max()) + 1
    return native_cooccurrence(z, n_groups)


def cluster_posterior_coocurrence(cooccurrence_proba, threshold=0.5):
    """Average-linkage hierarchical clustering of the co-occurrence matrix
    (reference label_utils.py:65-72)."""
    linkage = hc.linkage(squareform(1.0 - cooccurrence_proba),
                         method='average', optimal_ordering=True)
    return hc.fcluster(linkage, t=threshold, criterion='distance') - 1


def calculate_cluster_counts(zs, n_burn=0):
    """Number of occupied clusters per post-burn sample
    (reference approx_bic.py:42-53); native fast path."""
    from .native import cluster_counts as native_counts
    z = np.asarray(zs)[n_burn:]
    return native_counts(z, int(z.max()) + 1).astype(np.int64)


def calculate_cluster_counts_t(zs, n_burn=0):
    """Occupied-cluster counts per (time, sample)
    (reference approx_bic.py:27-39); native fast path."""
    from .native import cluster_counts_t as native_counts_t
    z = np.asarray(zs)[n_burn:]
    return native_counts_t(z, int(z.max()) + 1).astype(np.int64)


def calculate_posterior_group_counts(zs, n_burn=0, t=0):
    """Histogram of occupied-cluster counts at time t
    (reference label_utils.py:75-82)."""
    counts = calculate_cluster_counts_t(zs, n_burn)[t]
    freq = np.bincount(counts)
    index = np.where(freq != 0)[0]
    return index, freq[index]
