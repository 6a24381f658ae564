"""Homogeneous simulation study with known ground truth
(reference examples/homogeneous_simulation.py): fit the HDP-LPCM, score
AUC / adjusted Rand / VI against the generating labels, and measure
one-step-ahead forecast quality.

The reference runs 50 replicates as independent cluster jobs
(reference examples/homogeneous_simulation.py:28); here replicates map to
vmapped chains or a loop on one chip.
"""
import numpy as np
from sklearn.metrics import adjusted_rand_score

from dynetlsm_tpu import DynamicNetworkHDPLPCM
from dynetlsm_tpu.datasets import homogeneous_simulation
from dynetlsm_tpu.metrics import network_auc, variation_of_information
from dynetlsm_tpu.model_selection import train_test_split

N_ITER, N_TUNE, N_BURN = 10_000, 2_500, 2_500

Y, X, z_true, intercept, mus, sigmas, probas, probas_ahead = \
    homogeneous_simulation(n_nodes=120, n_time_steps=6, random_state=42)

# held-out dyads for out-of-sample AUC
Y_train, test_mask = train_test_split(Y, test_size=0.1, random_state=0)

model = DynamicNetworkHDPLPCM(
    n_iter=N_ITER, tune=N_TUNE, burn=N_BURN,
    n_components=10, selection_type='vi', random_state=1).fit(Y_train)

T = Y.shape[0]
print('in-sample AUC :', model.auc_)
print('oracle AUC    :', network_auc(Y, probas))
print('ARI per step  :', [round(adjusted_rand_score(z_true[t], model.z_[t]), 3)
                          for t in range(T)])
print('VI per step   :', [round(variation_of_information(
    z_true[t], model.z_[t]), 3) for t in range(T)])
