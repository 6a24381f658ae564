"""Detection-limit study: how far apart do two communities need to be
before the HDP-LPCM can detect them (reference examples/detection_limit.py)?

Sweeps the between/within edge-probability ratio ``r`` (group separation)
at a fixed label-transition probability, fits the HDP-LPCM on each
generated network, and records the posterior over the number of groups
plus VI / ARI against the generating labels.  Configure via R_RATIO /
TRANS_PROBA / N_REPS / N_ITER environment variables.
"""
import os

import numpy as np
import pandas as pd
from sklearn.metrics import adjusted_rand_score

from dynetlsm_tpu import DynamicNetworkHDPLPCM
from dynetlsm_tpu.datasets import detection_limit_simulation
from dynetlsm_tpu.metrics import variation_of_information

R_RATIO = float(os.environ.get('R_RATIO', '0.5'))       # 0.1 ... 0.9
TRANS_PROBA = float(os.environ.get('TRANS_PROBA', '0.1'))  # 0.1, 0.2, 0.4
N_REPS = int(os.environ.get('N_REPS', '5'))
N_ITER = int(os.environ.get('N_ITER', '10000'))
N_BURN = int(os.environ.get('N_BURN', '5000'))
N_TUNE = int(os.environ.get('N_TUNE', '1000'))
OUT_DIR = os.environ.get(
    'OUT_DIR', 'results_ratio_{}_{}'.format(TRANS_PROBA, R_RATIO))


def counts_per_time_step(z):
    return np.array([np.unique(z[t]).shape[0] for t in range(z.shape[0])])


def posterior_per_time_step(model):
    T = model.Y_fit_.shape[0]
    probas = np.zeros((T, model.n_components + 1))
    for t in range(T):
        freq = model.posterior_group_counts_[t]
        index = model.posterior_group_ids_[t]
        probas[t, index] = freq / freq.sum()
    return probas


def benchmark_single(outfile_name, random_state):
    Y, X, z, probas, r, _ = detection_limit_simulation(
        r=R_RATIO, trans_proba=TRANS_PROBA, random_state=random_state)

    model = DynamicNetworkHDPLPCM(
        n_iter=N_ITER, burn=N_BURN, tune=N_TUNE, tune_interval=1000,
        is_directed=False, selection_type='vi', n_components=5,
        random_state=random_state).fit(Y)

    results = pd.DataFrame(posterior_per_time_step(model))
    results['map_counts'] = counts_per_time_step(model.z_)
    results['ratio'] = r
    results['vi'] = variation_of_information(z.ravel(), model.z_.ravel())
    results['rand_index'] = adjusted_rand_score(z.ravel(), model.z_.ravel())
    for t in range(Y.shape[0]):
        results['vi_{}'.format(t)] = variation_of_information(z[t],
                                                              model.z_[t])
        results['rand_{}'.format(t)] = adjusted_rand_score(z[t], model.z_[t])

    results.to_csv(outfile_name, index=False)
    return results


if __name__ == '__main__':
    os.makedirs(OUT_DIR, exist_ok=True)
    stat_names = ['vi', 'rand_index', 'map_counts']
    rows = []
    for i in range(N_REPS):
        res = benchmark_single(
            os.path.join(OUT_DIR, 'benchmark_{}.csv'.format(i)),
            random_state=i)
        rows.append(res.loc[0, stat_names].values)
        print('rep %d (r=%.2f): %s' % (i, R_RATIO, dict(
            zip(stat_names, np.round(np.asarray(rows[-1], float), 3)))))

    data = pd.DataFrame(np.array(rows), columns=stat_names)
    print('Median metrics at separation ratio %.2f:' % R_RATIO)
    print(data.median(axis=0))
