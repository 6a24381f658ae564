"""HDP-LPCM on Sampson's monastery (reference examples/sampson_monks.py).

The paper budget is 165,000 sweeps + 15,000 tune + 20,000 burn
(reference examples/sampson_monks.py:21-27); with vmapped chains on a TPU
chip the same posterior sample count takes seconds.
"""
import matplotlib
matplotlib.use('Agg')
import matplotlib.pyplot as plt

from dynetlsm_tpu import DynamicNetworkHDPLPCM
from dynetlsm_tpu.datasets import load_monks
from dynetlsm_tpu.plots import (
    plot_latent_space, alluvial_plot, plot_posterior_counts)

N_ITER, N_TUNE, N_BURN = 10_000, 2_500, 2_500

Y, groups, names = load_monks(is_directed=False)
model = DynamicNetworkHDPLPCM(
    n_iter=N_ITER, tune=N_TUNE, burn=N_BURN,
    n_components=10, selection_type='vi', random_state=42).fit(Y)

print('in-sample AUC:', model.auc_)
print('communities found:', sorted(set(model.z_.ravel().tolist())))
print('Geweke z (logp):', model.logp_geweke_)

fig, ax = plot_latent_space(model, t=1, node_names=names)
fig.savefig('sampson_latent_space.png', dpi=150)
plt.close(fig)

fig, ax = alluvial_plot(model.z_)
fig.savefig('sampson_alluvial.png', dpi=150)
plt.close(fig)

fig, _ = plot_posterior_counts(model, t=0)
fig.savefig('sampson_counts.png', dpi=150)
