"""HDP-LPCM on Game of Thrones season networks (reference examples/GoT.py).

The reference notes its 400k-sweep budget 'will take days to sample'
(reference examples/GoT.py:20-28) on CPU; here the same number of posterior
samples comes from vmapped chains in minutes.
"""
from dynetlsm_tpu import DynamicNetworkHDPLPCM
from dynetlsm_tpu.datasets import load_got

N_ITER, N_TUNE, N_BURN = 20_000, 5_000, 5_000

Y, names = load_got(seasons=[1, 2, 3, 4])
model = DynamicNetworkHDPLPCM(
    n_iter=N_ITER, tune=N_TUNE, burn=N_BURN,
    n_components=25, selection_type='vi', thin=10, random_state=123).fit(Y)

print('in-sample AUC:', model.auc_)
print('communities per season:',
      [len(set(model.z_[t].tolist())) for t in range(Y.shape[0])])
print('one-step-ahead forecast shape:',
      model.forecast_probas_marginalized_.shape)
