"""Time-inhomogeneous simulation study (2 -> 6 -> 4 communities) from the
HDP-LPCM paper (reference examples/inhomogeneous_simulation.py).

For each replicate: generate the 10-step network, hold out the final step
and 10% of dyads, fit the HDP-LPCM on the first 9 steps, and score

* in-sample / out-of-sample / one-step-ahead forecast AUC,
* variation of information and adjusted Rand index vs the truth
  (pooled and per time step),
* the posterior distribution of the number of groups per time step.

The reference runs 50 replicates as independent cluster processes
(reference examples/inhomogeneous_simulation.py:28,151-156); here
replicates run as a loop on one chip (each fit already vmaps its own
chains).  Set N_REPS / N_ITER / SIM_TYPE via the environment.
"""
import os

import numpy as np
import pandas as pd
from sklearn.metrics import adjusted_rand_score, roc_auc_score

from dynetlsm_tpu import DynamicNetworkHDPLPCM
from dynetlsm_tpu.datasets import inhomogeneous_simulation
from dynetlsm_tpu.metrics import variation_of_information, out_of_sample_auc
from dynetlsm_tpu.model_selection import train_test_split

N_REPS = int(os.environ.get('N_REPS', '5'))
N_ITER = int(os.environ.get('N_ITER', '10000'))
N_BURN = int(os.environ.get('N_BURN', '5000'))
N_TUNE = int(os.environ.get('N_TUNE', '1000'))
SIM_TYPE = os.environ.get('SIM_TYPE', 'hard')   # 'easy' or 'hard'
OUT_DIR = os.environ.get('OUT_DIR', 'results_inhomogeneous')


def counts_per_time_step(z):
    return np.array([np.unique(z[t]).shape[0] for t in range(z.shape[0])])


def posterior_per_time_step(model):
    """Posterior probability of each group count at each time step."""
    T = model.Y_fit_.shape[0]
    probas = np.zeros((T, model.n_components + 1))
    for t in range(T):
        freq = model.posterior_group_counts_[t]
        index = model.posterior_group_ids_[t]
        probas[t, index] = freq / freq.sum()
    return probas


def benchmark_single(outfile_name, random_state):
    Y, X, z, intercept, *_ = inhomogeneous_simulation(
        n_nodes=120, random_state=random_state, simulation_type=SIM_TYPE)

    Y, Y_ahead = Y[:9], Y[9]
    Y_obs, test_indices = train_test_split(Y, test_size=0.1,
                                           random_state=random_state)

    model = DynamicNetworkHDPLPCM(
        n_iter=N_ITER, burn=N_BURN, tune=N_TUNE, tune_interval=1000,
        is_directed=False, selection_type='vi', n_components=10,
        random_state=random_state).fit(Y_obs)

    results = pd.DataFrame(posterior_per_time_step(model))
    results['map_counts'] = counts_per_time_step(model.z_)

    results['insample_auc'] = model.auc_
    results['outsample_auc'] = out_of_sample_auc(
        Y, model.missings_, test_indices)

    indices = np.tril_indices(Y.shape[1], k=-1)
    pred_probas = model.forecast_probas_marginalized_[indices]
    results['onestep_auc'] = roc_auc_score(Y_ahead[indices], pred_probas)

    results['vi'] = variation_of_information(z[:9].ravel(),
                                             model.z_.ravel())
    results['rand_index'] = adjusted_rand_score(z[:9].ravel(),
                                                model.z_.ravel())
    vi = ari = 0.0
    for t in range(Y.shape[0]):
        results['vi_{}'.format(t)] = variation_of_information(z[t],
                                                              model.z_[t])
        results['rand_{}'.format(t)] = adjusted_rand_score(z[t], model.z_[t])
        vi += results['vi_{}'.format(t)].iloc[0]
        ari += results['rand_{}'.format(t)].iloc[0]
    results['vi_avg'] = vi / Y.shape[0]
    results['rand_avg'] = ari / Y.shape[0]

    results.to_csv(outfile_name, index=False)
    return results


if __name__ == '__main__':
    os.makedirs(OUT_DIR, exist_ok=True)
    stat_names = ['insample_auc', 'outsample_auc', 'onestep_auc', 'vi',
                  'rand_index', 'vi_avg', 'rand_avg']
    rows = []
    for i in range(N_REPS):
        res = benchmark_single(
            os.path.join(OUT_DIR, 'benchmark_{}.csv'.format(i)),
            random_state=i)
        rows.append(res.loc[0, stat_names].values)
        print('rep %d: %s' % (i, dict(zip(stat_names,
                                          np.round(rows[-1], 3)))))

    data = pd.DataFrame(np.array(rows), columns=stat_names)
    print('Median Metrics:')
    print(data.median(axis=0))
    print('Metrics SD:')
    print(data.std(axis=0))
