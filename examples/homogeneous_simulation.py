"""Homogeneous simulation study with known ground truth
(reference examples/homogeneous_simulation.py:66-184): per replicate, fit
the HDP-LPCM (or LPCM) on a 10%-held-out network, then score

* posterior group-count probabilities + MAP counts per time step,
* in-sample AUC, out-of-sample AUC (from the Gibbs-imputed missings),
  one-step-ahead forecast AUC against the generator's ground-truth Y_ahead,
* variation of information and adjusted Rand (pooled / per-step / average),

writing one CSV per replicate to ``results/`` and printing the median
metric table at the end — the same columns as the reference study.

The reference runs 50 replicates as independent cluster jobs
(reference examples/homogeneous_simulation.py:28-30, 175-184); here each
replicate is a single-chip TPU fit inside one loop.

Usage: python examples/homogeneous_simulation.py [n_reps] [n_iter]
                                                 [model_type] [sim_type]
"""
import os
import sys

import numpy as np
import pandas as pd

from sklearn.metrics import adjusted_rand_score, roc_auc_score

from dynetlsm_tpu import DynamicNetworkHDPLPCM, DynamicNetworkLPCM
from dynetlsm_tpu.datasets import homogeneous_simulation
from dynetlsm_tpu.metrics import variation_of_information, out_of_sample_auc
from dynetlsm_tpu.model_selection import train_test_split

# argv is parsed under __main__ only, so the replicate entry point stays
# importable (e.g. by the smoke tests)
N_REPS = 10
N_ITER = 10_000
MODEL_TYPE = 'hdp_lpcm'
SIM_TYPE = 'hard'
OUT_DIR = 'results'

STAT_NAMES = ['insample_auc', 'outsample_auc', 'onestep_auc', 'vi',
              'rand_index', 'vi_avg', 'rand_avg']


def counts_per_time_step(z):
    """MAP number of occupied groups per time step
    (reference examples/homogeneous_simulation.py:49-55)."""
    return np.array([np.unique(z[t]).shape[0] for t in range(z.shape[0])])


def posterior_per_time_step(model):
    """Posterior distribution over group counts per time step
    (reference examples/homogeneous_simulation.py:57-65)."""
    T = model.Y_fit_.shape[0]
    probas = np.zeros((T, model.n_components + 1))
    for t in range(T):
        freq = model.posterior_group_counts_[t]
        index = model.posterior_group_ids_[t]
        probas[t, index] = freq / freq.sum()
    return probas


def benchmark_single(n_iter=10_000, burn=2_500, tune=2_500,
                     outfile_name='benchmark.csv', model_type='hdp_lpcm',
                     selection_type='vi', sim_type='hard', random_state=0):
    """One replicate (reference examples/homogeneous_simulation.py:66-172)."""
    # T=7 generated steps: fit on the first 6, the last is the forecast
    # ground truth (reference: Y, Y_ahead = Y[:6], Y[6])
    Y, X, z, intercept, mus, sigmas, probas, probas_ahead = \
        homogeneous_simulation(n_time_steps=7, n_nodes=120,
                               simulation_type=sim_type,
                               random_state=random_state)
    Y, Y_ahead = Y[:6], Y[6]
    z = z[:6]
    Y_obs, test_indices = train_test_split(Y, test_size=0.1,
                                           random_state=random_state)

    if model_type == 'hdp_lpcm':
        model = DynamicNetworkHDPLPCM(
            n_iter=n_iter, burn=burn, tune=tune, tune_interval=1000,
            is_directed=False, selection_type=selection_type,
            n_components=10, random_state=random_state).fit(Y_obs)
    else:
        model = DynamicNetworkLPCM(
            n_iter=n_iter, burn=burn, tune=tune, tune_interval=1000,
            is_directed=False, selection_type=selection_type,
            n_components=6, random_state=random_state).fit(Y_obs)

    # posterior group-count probabilities + MAP counts
    if model_type == 'hdp_lpcm':
        results = pd.DataFrame(posterior_per_time_step(model))
    else:
        results = pd.DataFrame()
    results['map_counts'] = counts_per_time_step(model.z_)

    # goodness-of-fit: in-sample, held-out (Gibbs-imputed missings), and
    # one-step-ahead forecast scored on the true next network
    results['insample_auc'] = model.auc_
    results['outsample_auc'] = out_of_sample_auc(
        Y, model.missings_, test_indices)
    indices = np.tril_indices(Y.shape[1], k=-1)
    pred_probas = model.forecast_probas_marginalized_[indices]
    results['onestep_auc'] = roc_auc_score(Y_ahead[indices], pred_probas)

    # label recovery: VI and adjusted Rand, pooled + per-step + averaged
    results['vi'] = variation_of_information(z.ravel(), model.z_.ravel())
    vi = 0.0
    for t in range(Y.shape[0]):
        vi_t = variation_of_information(z[t], model.z_[t])
        results['vi_%d' % t] = vi_t
        vi += vi_t
    results['vi_avg'] = vi / Y.shape[0]

    results['rand_index'] = adjusted_rand_score(z.ravel(), model.z_.ravel())
    adj = 0.0
    for t in range(Y.shape[0]):
        adj_t = adjusted_rand_score(z[t], model.z_[t])
        results['rand_%d' % t] = adj_t
        adj += adj_t
    results['rand_avg'] = adj / Y.shape[0]

    results.to_csv(outfile_name, index=False)
    return results


def main():
    n_reps = int(sys.argv[1]) if len(sys.argv) > 1 else N_REPS
    n_iter = int(sys.argv[2]) if len(sys.argv) > 2 else N_ITER
    model_type = sys.argv[3] if len(sys.argv) > 3 else MODEL_TYPE
    sim_type = sys.argv[4] if len(sys.argv) > 4 else SIM_TYPE
    os.makedirs(OUT_DIR, exist_ok=True)
    for i in range(n_reps):
        out = os.path.join(OUT_DIR, 'benchmark_%d.csv' % i)
        res = benchmark_single(
            n_iter=n_iter, burn=n_iter // 4, tune=n_iter // 4,
            random_state=i, model_type=model_type, sim_type=sim_type,
            outfile_name=out)
        print('rep %d:' % i,
              ' '.join('%s=%.3f' % (s, res[s].iloc[0]) for s in STAT_NAMES))

    # median metric table over replicates
    # (reference examples/homogeneous_simulation.py:186-205)
    data = np.array([
        pd.read_csv(os.path.join(OUT_DIR, 'benchmark_%d.csv' % i))
        [STAT_NAMES].iloc[0].to_numpy() for i in range(n_reps)])
    med = np.median(data, axis=0)
    print('\nmedian over %d replicates:' % n_reps)
    for name, val in zip(STAT_NAMES, med):
        print('  %-14s %.4f' % (name, val))


if __name__ == '__main__':
    main()
