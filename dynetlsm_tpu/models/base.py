"""Shared estimator machinery for the three model classes."""
import numpy as np
import jax

from ..array_utils import triu_indices_from_3d, nondiag_indices_from_3d
from ..config import DTYPE
from ..imputer import SimpleNetworkImputer


def validate_network(Y, is_directed, copy=True):
    """Validate the dynamic adjacency tensor and locate missing dyads.

    Returns (Y float64 array, nan_mask over dyad vector, miss_mask (T,n,n)
    boolean tensor, sample_missing flag).  Missing dyads are coded -1
    (NaNs are converted), mirroring reference lsm.py:341-360.
    """
    Y = np.array(Y, dtype=np.float64, copy=copy)
    if Y.ndim != 3 or Y.shape[1] != Y.shape[2]:
        raise ValueError('Y must have shape (n_time_steps, n_nodes, n_nodes), '
                         'got %r' % (Y.shape,))
    Y[np.isnan(Y)] = -1.0

    if is_directed:
        indices = nondiag_indices_from_3d(Y)
    else:
        indices = triu_indices_from_3d(Y, k=1)
    nan_mask = Y[indices] == -1

    miss_mask = Y == -1
    if not is_directed:
        miss_mask |= np.swapaxes(miss_mask, 1, 2)
    for t in range(Y.shape[0]):
        np.fill_diagonal(miss_mask[t], False)

    return Y, nan_mask, miss_mask, bool(nan_mask.any())


def to_device_f32(x):
    return jax.numpy.asarray(np.asarray(x, dtype=DTYPE))


def chain_traces_to_numpy(traces, n_chains):
    """Reorder scan traces from (samples, chains, ...) to reference layout.

    Single chain -> (samples, ...) exactly like the reference's trace
    attributes; multiple chains -> (chains, samples, ...).
    """
    out = {}
    for name, arr in traces.items():
        arr = np.asarray(arr)
        if n_chains == 1:
            out[name] = arr[:, 0]
        else:
            out[name] = np.swapaxes(arr, 0, 1)
    return out


def total_iterations(n_iter, tune, burn):
    """Total stored samples = n_iter + tune + burn (reference semantics:
    lsm.py:362-368 folds tune/burn into n_iter)."""
    total = n_iter
    if tune:
        total += tune
    if burn:
        total += burn
    return total
