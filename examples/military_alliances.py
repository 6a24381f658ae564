"""HDP-LPCM on Cold-War military alliances
(reference examples/military_alliances.py)."""
from dynetlsm_tpu import DynamicNetworkHDPLPCM
from dynetlsm_tpu.datasets import load_alliances

N_ITER, N_TUNE, N_BURN = 20_000, 5_000, 5_000

Y, names = load_alliances()
model = DynamicNetworkHDPLPCM(
    n_iter=N_ITER, tune=N_TUNE, burn=N_BURN,
    n_components=25, selection_type='vi', thin=10, random_state=123).fit(Y)

print('in-sample AUC:', model.auc_)
for t in range(Y.shape[0]):
    print('  %d communities in %d' % (len(set(model.z_[t].tolist())),
                                      1950 + 5 * t))
