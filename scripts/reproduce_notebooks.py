"""Reproduce the reference notebooks' headline results with TPU timings.

The reference's notebooks are its de-facto integration benchmarks
(reference notebooks/"Sampson's Monastery.ipynb" and "Synthetic Network
(Community Splitting).ipynb"); their committed tqdm rates are the baseline
numbers in BASELINE.md.  This script runs the same fits at the same
iteration budgets and prints wall-clock, sweep rates, and the posterior
summaries the notebooks report.  Output is recorded in
docs/reproductions.md.

Run:  python scripts/reproduce_notebooks.py [--quick]
"""
import sys
import time

import numpy as np

QUICK = '--quick' in sys.argv
SCALE = 0.01 if QUICK else 1.0


def it(n):
    return max(int(n * SCALE), 100)


def banner(title):
    print('\n' + '=' * 72 + '\n' + title + '\n' + '=' * 72, flush=True)


def sampson_monastery():
    """Reference notebook cell 4: HDP-LPCM, 199,999 total iterations at
    17.45 it/s (~3h11m single-core)."""
    from dynetlsm_tpu import DynamicNetworkHDPLPCM
    from dynetlsm_tpu.datasets import load_monks

    banner("Sampson's Monastery — HDP-LPCM "
           '(reference: 17.45 it/s, 3h11m for 200k sweeps)')
    Y, labels, names = load_monks(is_directed=False)

    n_iter, tune, burn = it(100_000), it(50_000), it(50_000)
    total = n_iter + tune + burn
    t0 = time.time()
    model = DynamicNetworkHDPLPCM(
        n_components=10, n_iter=n_iter, tune=tune, burn=burn,
        selection_type='vi', random_state=42).fit(Y)
    elapsed = time.time() - t0

    nb = model.n_burn_
    lam = np.ravel(model.lambdas_)[nb:]
    b = np.ravel(model.intercepts_)[nb:]
    vals, freqs = np.unique(model.counts_, return_counts=True)
    print('total sweeps      : %d in %.1f s  (%.0f it/s; reference 17.45)'
          % (total, elapsed, total / elapsed))
    print('selected groups   : %d (VI)' % np.unique(model.z_).shape[0])
    print('posterior mode #groups: %d' % vals[np.argmax(freqs)])
    print('lambda mean (sd)  : %.4f (%.4f)' % (lam.mean(), lam.std()))
    print('intercept mean (sd): %.4f (%.4f)' % (b.mean(), b.std()))
    print('in-sample AUC     : %.4f' % model.auc_)
    from dynetlsm_tpu.metrics import posterior_mean_auc
    print('posterior-mean AUC: %.4f' % posterior_mean_auc(model))
    return total / elapsed


def community_splitting():
    """Reference notebook cells 4/10: LSM at 61.22 it/s and HDP-LPCM at
    17.11 it/s on the 2->4 splitting network (T=4... the notebook uses
    n=50, T=2 splits observed over 6 steps; budgets 10k sweeps)."""
    from dynetlsm_tpu import DynamicNetworkLSM, DynamicNetworkHDPLPCM
    from dynetlsm_tpu.datasets import simple_splitting_dynamic_network
    from sklearn.metrics import adjusted_rand_score

    banner('Community splitting (n=50) — LSM + HDP-LPCM '
           '(reference: 61.22 / 17.11 it/s for 10k sweeps)')
    Y, z = simple_splitting_dynamic_network(n_nodes=50, n_time_steps=6,
                                            random_state=42)

    n_iter, tune, burn = it(5_000), it(2_500), it(2_500)
    total = n_iter + tune + burn

    t0 = time.time()
    lsm = DynamicNetworkLSM(n_iter=n_iter, tune=tune, burn=burn,
                            random_state=42).fit(Y)
    t_lsm = time.time() - t0
    print('LSM  : %d sweeps in %.1f s (%.0f it/s; reference 61.22), AUC %.4f'
          % (total, t_lsm, total / t_lsm, lsm.auc_))

    t0 = time.time()
    hdp = DynamicNetworkHDPLPCM(n_components=10, n_iter=n_iter, tune=tune,
                                burn=burn, selection_type='vi',
                                random_state=42).fit(Y)
    t_hdp = time.time() - t0
    ari = adjusted_rand_score(z.ravel(), hdp.z_.ravel())
    counts = [np.unique(hdp.z_[t]).shape[0] for t in range(Y.shape[0])]
    print('HDP  : %d sweeps in %.1f s (%.0f it/s; reference 17.11), AUC %.4f'
          % (total, t_hdp, total / t_hdp, hdp.auc_))
    print('HDP  : ARI %.3f, groups per step %s (truth: 2 then 4)'
          % (ari, counts))
    return total / t_lsm, total / t_hdp


def real_data_quality():
    """GoT + alliances quality rows at a budget the reference shim can
    match in reasonable wall-clock (3,000 sweeps per fit): in-sample
    selected-sample AUC, posterior-mean AUC, held-out dyad AUC (10% of
    dyads masked), and one-step-ahead forecast AUC (fit on the first T-1
    steps, scored on step T).  The same-estimator reference figures come
    from `python scripts/reference_shim.py realdata` (same budgets, same
    split fraction/seed policy).  Results recorded in
    docs/reproductions.md."""
    from sklearn.metrics import roc_auc_score
    from dynetlsm_tpu import DynamicNetworkHDPLPCM
    from dynetlsm_tpu.datasets import load_got, load_alliances
    from dynetlsm_tpu.metrics import posterior_mean_auc, out_of_sample_auc
    from dynetlsm_tpu.model_selection import train_test_split

    n_iter, tune, burn = it(2_000), it(500), it(500)

    def make():
        return DynamicNetworkHDPLPCM(
            n_components=25, n_iter=n_iter, tune=tune, burn=burn,
            selection_type='vi', random_state=42)

    for name, Y in (('Game of Thrones (8 seasons)', load_got()[0]),
                    ('military alliances 1950-75', load_alliances()[0])):
        banner('%s — quality at a %d-sweep budget (T=%d, n=%d)'
               % (name, n_iter + tune + burn, Y.shape[0], Y.shape[1]))
        t0 = time.time()
        full = make().fit(Y)
        print('in-sample AUC (selected sample): %.4f' % full.auc_)
        print('posterior-mean AUC             : %.4f'
              % posterior_mean_auc(full))

        Y_obs, test_idx = train_test_split(Y, test_size=0.1, random_state=3)
        held = make().fit(Y_obs)
        print('held-out dyad AUC (10%% masked) : %.4f'
              % out_of_sample_auc(Y, held.missings_, test_idx))

        fore = make().fit(Y[:-1])
        idx = np.tril_indices(Y.shape[1], k=-1)
        one = roc_auc_score(Y[-1][idx],
                            fore.forecast_probas_marginalized_[idx])
        print('one-step forecast AUC          : %.4f' % one)
        print('3 fits in %.1f s' % (time.time() - t0))


if __name__ == '__main__':
    r1 = sampson_monastery()
    r2, r3 = community_splitting()
    if '--realdata' in sys.argv or not QUICK:
        real_data_quality()
    print('\nSpeedups vs the reference notebook rates (single chain):')
    print('  Sampson HDP-LPCM : %.0fx' % (r1 / 17.45))
    print('  splitting LSM    : %.0fx' % (r2 / 61.22))
    print('  splitting HDP    : %.0fx' % (r3 / 17.11))
