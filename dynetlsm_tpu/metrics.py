"""Goodness-of-fit and clustering metrics (reference dynetlsm/metrics.py)."""
import numpy as np

from sklearn.metrics import roc_auc_score, mutual_info_score

from .array_utils import triu_indices_from_3d, nondiag_indices_from_3d


def entropy(labels):
    """Shannon entropy (nats) of a label assignment — replaces
    ``sklearn.metrics.cluster.entropy``, deprecated in sklearn 1.8."""
    labels = np.asarray(labels).ravel()
    if labels.size == 0:
        return 1.0
    counts = np.bincount(labels.astype(np.int64) - labels.min())
    p = counts[counts > 0] / labels.size
    return float(-np.sum(p * np.log(p)))


def network_auc(Y_true, Y_pred, is_directed=False, nan_mask=None):
    """In-sample AUC over dyads, optionally excluding missing entries."""
    if is_directed:
        indices = nondiag_indices_from_3d(Y_true)
    else:
        indices = triu_indices_from_3d(Y_true, 1)
    y_fit = np.asarray(Y_pred)[indices]
    y_true = np.asarray(Y_true)[indices]
    if nan_mask is not None:
        y_fit = y_fit[~nan_mask]
        y_true = y_true[~nan_mask]
    return roc_auc_score(y_true, y_fit)


def out_of_sample_auc(y_true, y_pred, test_indices):
    """Held-out dyad AUC on a train_test_split mask.

    ``y_pred`` is either the flat vector of held-out predictions (the
    reference's ``missings_`` layout, reference hdp_lpcm.py:706) or a full
    (T, n, n) prediction tensor such as this package's ``missings_``, which
    is sliced to the held-out dyads here."""
    indices = triu_indices_from_3d(y_true, k=1)
    y_pred = np.asarray(y_pred)
    if y_pred.ndim == 3:
        y_pred = y_pred[indices][test_indices]
    return roc_auc_score(np.asarray(y_true)[indices][test_indices], y_pred)


def variation_of_information(labels_true, labels_pred):
    """VI(z, z') = H(z) + H(z') - 2 I(z, z')."""
    return (entropy(labels_true) + entropy(labels_pred)
            - 2.0 * mutual_info_score(labels_true, labels_pred))


def _flat_post_burn(arr, n_burn, n_chains):
    """Post-burn samples pooled over chains: (S, ...) or (C, S, ...) traces
    -> (S', ...)."""
    arr = np.asarray(arr)
    if n_chains > 1:
        arr = arr[:, n_burn:].reshape((-1,) + arr.shape[2:])
    else:
        arr = arr[n_burn:]
    return arr


def posterior_mean_probas(model, max_samples=2000):
    """Posterior-mean edge-probability tensor (T, n, n): the Monte-Carlo
    average of p_ij^(s) over the stored post-burn draws.

    Unlike ``model.probas_`` (the probabilities of the single selected MAP /
    VI sample, reference lsm.py:290-308), this estimator integrates over
    the posterior, so it has no single-sample selection variance.  Chains
    are pooled; at most ``max_samples`` evenly-thinned draws are used.
    """
    from scipy.special import expit

    n_chains = getattr(model, 'n_chains', 1)
    nb = model.n_burn_
    Xs = _flat_post_burn(model.Xs_, nb, n_chains)        # (S, T, n, d)
    bs = _flat_post_burn(model.intercepts_, nb, n_chains)
    step = max(1, Xs.shape[0] // max_samples)
    Xs, bs = Xs[::step], bs[::step]
    if model.is_directed:
        radii = _flat_post_burn(model.radiis_, nb, n_chains)[::step]
    S, T, n, _ = Xs.shape
    total = np.zeros((T, n, n))
    for s in range(S):
        diff = Xs[s][:, :, None, :] - Xs[s][:, None, :, :]
        dist = np.sqrt(np.sum(diff * diff, axis=-1))     # (T, n, n)
        if model.is_directed:
            r = radii[s]
            eta = (bs[s][0] * (1.0 - dist / r[None, None, :])
                   + bs[s][1] * (1.0 - dist / r[None, :, None]))
        else:
            eta = bs[s][0] - dist
        total += expit(eta)
    probas = total / S
    for t in range(T):
        np.fill_diagonal(probas[t], 0.0)
    return probas


def posterior_mean_auc(model, max_samples=2000):
    """In-sample AUC of :func:`posterior_mean_probas` — the
    selection-variance-free companion of ``model.auc_``."""
    return network_auc(model.Y_fit_, posterior_mean_probas(model,
                                                           max_samples),
                       is_directed=model.is_directed)
