"""Competitor baselines for the simulation studies: spectral SBM fits.

The reference compares the HDP-LPCM against dynamic/static stochastic
block models fitted by the R ``dynsbm`` package, driven from R scripts
(`/root/reference/examples/homogeneous_dynsbm.R:31-50`,
`homogeneous_sbm.R`, `inhomogeneous_sbm.R`) that call back into the
Python package for data generation and metrics.  Those scripts run
unchanged against this package (``dynetlsm <- import("dynetlsm_tpu")``
is the only edit) when R + dynsbm are available; this script provides a
NATIVE competitor column with no R dependency — regularized spectral
clustering, the standard consistent SBM estimator — under the same
protocol: the same simulation replicates, the same selected-K and
true-K rows, the same ARI / VI metrics, per-replicate CSVs plus a
median table.

Two competitor variants mirror the reference's two R baselines:

* ``static``  — one SBM per time step (spectral clustering of each
  Y[t]; reference ``homogeneous_sbm.R`` / ``inhomogeneous_sbm.R``),
  labels matched across steps by Hungarian alignment for the dynamic
  metrics;
* ``dynamic`` — one clustering of the time-aggregated adjacency
  (the time-homogeneous-membership analog of ``homogeneous_dynsbm.R``'s
  coupled model).

K is selected by the spectral eigengap (the ICL analog for spectral
fits).

Usage::

    python examples/competitor_sbm.py [n_reps] [easy|hard] [out_dir]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def spectral_labels(A, k):
    """Regularized spectral clustering of one adjacency matrix: leading
    eigenvectors of the degree-regularized normalized adjacency, row
    normalized, k-means."""
    from sklearn.cluster import KMeans
    n = A.shape[0]
    deg = A.sum(axis=1)
    tau = deg.mean()                       # regularization (Amini et al.)
    d_inv = 1.0 / np.sqrt(deg + tau)
    L = d_inv[:, None] * A * d_inv[None, :]
    vals, vecs = np.linalg.eigh(L)
    U = vecs[:, -k:]
    norms = np.linalg.norm(U, axis=1, keepdims=True)
    U = U / np.clip(norms, 1e-12, None)
    return KMeans(n_clusters=k, n_init=10, random_state=0).fit_predict(U)


def eigengap_k(A, k_max=8):
    """K maximizing the eigengap of the regularized normalized adjacency
    spectrum (spectral analog of the R scripts' ICL selection)."""
    deg = A.sum(axis=1)
    tau = deg.mean()
    d_inv = 1.0 / np.sqrt(deg + tau)
    L = d_inv[:, None] * A * d_inv[None, :]
    vals = np.sort(np.abs(np.linalg.eigvalsh(L)))[::-1]
    gaps = vals[:k_max] - vals[1:k_max + 1]
    return int(np.argmax(gaps[1:]) + 2)    # k >= 2


def align_labels(ref, z):
    """Permute ``z``'s labels to best match ``ref`` (Hungarian on the
    confusion matrix) so per-step static fits form a coherent dynamic
    labeling."""
    from scipy.optimize import linear_sum_assignment
    k = max(ref.max(), z.max()) + 1
    cost = np.zeros((k, k))
    for a in range(k):
        for b in range(k):
            cost[a, b] = -np.sum((z == a) & (ref == b))
    rows, cols = linear_sum_assignment(cost)
    mapping = {a: b for a, b in zip(rows, cols)}
    return np.asarray([mapping[v] for v in z])


def fit_competitor(Y, k, variant='static'):
    """Dynamic label matrix (T, n) from the spectral competitor."""
    T = Y.shape[0]
    if variant == 'dynamic':
        z = spectral_labels(Y.mean(axis=0), k)
        return np.broadcast_to(z, (T, Y.shape[1])).copy()
    zs = [spectral_labels(Y[t], k) for t in range(T)]
    for t in range(1, T):
        zs[t] = align_labels(zs[t - 1], zs[t])
    return np.stack(zs)


def run_study(n_reps=50, sim_type='hard', out_dir=None, variant='static',
              n_time_steps=6, n_nodes=120, true_k=6):
    """The homogeneous simulation study's competitor column (reference
    homogeneous_dynsbm.R:31-58 protocol): per replicate, the
    eigengap-selected number of clusters plus ARI / VI at the true K."""
    from sklearn.metrics import adjusted_rand_score
    from dynetlsm_tpu.datasets import homogeneous_simulation
    from dynetlsm_tpu.metrics import variation_of_information

    rows = []
    for seed in range(n_reps):
        Y, X, z, intercept = homogeneous_simulation(
            n_time_steps=n_time_steps, n_nodes=n_nodes,
            random_state=seed, simulation_type=sim_type)[:4]
        zt = np.asarray(z).reshape(Y.shape[0], -1)
        z_hat = fit_competitor(Y, true_k, variant=variant)
        rows.append({
            'seed': seed,
            'num_clusters': eigengap_k(Y.mean(axis=0)),
            'rand_index': adjusted_rand_score(zt.ravel(), z_hat.ravel()),
            'vi': float(variation_of_information(zt.ravel(),
                                                 z_hat.ravel())),
        })
        print(rows[-1], flush=True)
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            import csv
            path = os.path.join(out_dir, 'rep_%03d.csv' % seed)
            with open(path, 'w', newline='') as fh:
                w = csv.DictWriter(fh, fieldnames=list(rows[-1]))
                w.writeheader()
                w.writerow(rows[-1])

    med = {k: float(np.median([r[k] for r in rows]))
           for k in ('num_clusters', 'rand_index', 'vi')}
    print('median over %d reps (%s, %s): %r'
          % (len(rows), sim_type, variant, med), flush=True)
    return rows, med


if __name__ == '__main__':
    n_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sim_type = sys.argv[2] if len(sys.argv) > 2 else 'hard'
    out = sys.argv[3] if len(sys.argv) > 3 else None
    for variant in ('static', 'dynamic'):
        run_study(n_reps, sim_type,
                  out_dir=None if out is None else
                  '%s_%s' % (out, variant),
                  variant=variant)
