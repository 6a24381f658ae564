"""Posterior expected Variation-of-Information model selection.

Replaces reference model_selection/posterior_vi.py.  The reference loops
posterior samples in Python (posterior_vi.py:63-66); here the VI of every
(sample, time) pair is computed in one einsum batch.
"""
import numpy as np

__all__ = ['posterior_expected_vi', 'time_averaged_posterior_expected_vi',
           'minimize_posterior_expected_vi', 'batched_posterior_expected_vi',
           'nonvectorized_posterior_expected_vi']


def nonvectorized_posterior_expected_vi(labels, cooccurrence_proba):
    """Per-node-loop expected VI kept as the testing oracle for the
    vectorised implementations (the reference keeps the same function for
    the same reason, posterior_vi.py:10-20)."""
    vi = 0.0
    n = labels.shape[0]
    for i in range(n):
        same = labels == labels[i]
        vi += np.log2(np.sum(same))
        vi -= 2 * np.log2(np.sum(same * cooccurrence_proba[i, :]))
        vi += np.log2(np.sum(cooccurrence_proba[i, :]))
    return vi / n


def posterior_expected_vi(labels, cooccurrence_proba):
    """Lower bound of E[VI(z, z')] under the posterior co-occurrence matrix
    (reference posterior_vi.py:23-43) for a single label vector."""
    n = labels.shape[0]
    n_groups = int(labels.max()) + 1
    resp = np.zeros((n, n_groups))
    resp[np.arange(n), labels] = 1
    nk = resp.sum(axis=0)

    vi = np.sum(nk[nk != 0] * np.log2(nk[nk != 0]))
    same = resp[:, labels].T            # same[i, j] = 1[z_i == z_j]
    vi -= 2 * np.log2((cooccurrence_proba * same).sum(axis=1)).sum()
    vi += np.log2(cooccurrence_proba.sum(axis=1)).sum()
    return vi / n


def time_averaged_posterior_expected_vi(labels, cooccurrence_proba):
    """(reference posterior_vi.py:46-53)"""
    T = labels.shape[0]
    return sum(posterior_expected_vi(labels[t], cooccurrence_proba[t])
               for t in range(T)) / T


def batched_posterior_expected_vi(zs, cooccurrence_probas, n_groups=None):
    """Time-averaged expected VI for every posterior sample at once.

    zs : (S, T, n) int labels; cooccurrence_probas : (T, n, n).
    Returns (S,) array.
    """
    zs = np.asarray(zs)
    S, T, n = zs.shape
    if n_groups is None:
        n_groups = int(zs.max()) + 1
    onehot = np.eye(n_groups, dtype=np.float32)[zs]          # (S, T, n, K)
    nk = onehot.sum(axis=2)                                  # (S, T, K)
    with np.errstate(divide='ignore', invalid='ignore'):
        ent = np.where(nk > 0, nk * np.log2(np.where(nk > 0, nk, 1.0)), 0.0)
    term1 = ent.sum(axis=-1)                                 # (S, T)

    C = np.asarray(cooccurrence_probas, dtype=np.float32)
    # co_mass[s,t,i,k] = sum_j C[t,i,j] 1[z_stj = k]
    co_mass = np.einsum('tij,stjk->stik', C, onehot)
    picked = np.take_along_axis(co_mass, zs[..., None], axis=-1)[..., 0]
    term2 = 2 * np.log2(np.clip(picked, 1e-20, None)).sum(axis=-1)

    term3 = np.log2(np.clip(C.sum(axis=-1), 1e-20, None)).sum(axis=-1)[None]
    return ((term1 - term2 + term3) / n).mean(axis=1)        # (S,)


def minimize_posterior_expected_vi(zs, cooccurrence_probas, tie_break=None,
                                   n_groups=None):
    """Index of the posterior sample minimising the time-averaged expected
    VI (reference posterior_vi.py:56-82).  ``tie_break`` is an optional (S,)
    score (higher better) used to resolve exact ties — the reference uses the
    network log-likelihood of the tied samples."""
    vis = batched_posterior_expected_vi(zs, cooccurrence_probas, n_groups)
    min_ids = np.where(vis == vis.min())[0]
    if min_ids.shape[0] > 1 and tie_break is not None:
        return int(min_ids[np.argmax(np.asarray(tie_break)[min_ids])])
    return int(min_ids[0])
