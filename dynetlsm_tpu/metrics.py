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
