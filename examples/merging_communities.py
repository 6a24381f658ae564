"""Merging-communities study: three communities gradually absorbed into one
(reference examples/merging_communities.py).

Generates the 5-step merging network, fits the HDP-LPCM, and produces the
paper figure — adjacency matrices, true latent space with cluster
contours, and the estimated latent space Procrustes-aligned to the truth —
plus the inferred blending coefficient interval and the adjusted Rand
index.
"""
import os

import numpy as np
import matplotlib
matplotlib.use('Agg')
import matplotlib.pyplot as plt
import networkx as nx
from sklearn.metrics import adjusted_rand_score

from dynetlsm_tpu import DynamicNetworkHDPLPCM
from dynetlsm_tpu.datasets import merging_dynamic_network
from dynetlsm_tpu.math.procrustes import longitudinal_procrustes_rotation
from dynetlsm_tpu.plots import get_colors, normal_contour

N_ITER = int(os.environ.get('N_ITER', '10000'))
N_BURN = int(os.environ.get('N_BURN', '10000'))
N_TUNE = int(os.environ.get('N_TUNE', '5000'))

Y, X, z, intercept, probas, mus, sigmas = merging_dynamic_network(
    n_nodes=120, lmbda=0.6, n_time_steps=5, random_state=42)
T, n, _ = Y.shape

model = DynamicNetworkHDPLPCM(
    n_components=10, n_iter=N_ITER, burn=N_BURN, tune=N_TUNE,
    tune_interval=1000, random_state=42).fit(Y)

# rotate the estimate onto the truth to make the panels comparable
X_rot, R = longitudinal_procrustes_rotation(X, model.X_)
X_rot, R = np.asarray(X_rot), np.asarray(R)
mu_rot = np.asarray(model.mu_) @ R


n_labels = int(max(z.max(), model.z_.max())) + 1
colors = get_colors(np.arange(n_labels))


def draw_latent(ax_row, X_plot, z_plot, mu_plot, sig_plot, label):
    for t in range(T):
        G = nx.from_numpy_array(Y[t])
        pos = {i: X_plot[t, i] for i in range(n)}
        nx.draw(G, pos=pos, node_color=colors[z_plot[t]], edge_color='k',
                edgecolors='k', node_size=50, width=0.75, ax=ax_row[t])
        for k in np.unique(z_plot[t]):
            normal_contour(mu_plot[k], sig_plot[k] * np.eye(2), n_std=[2],
                           ax=ax_row[t], zorder=1, alpha=0.4,
                           facecolor=colors[k], linestyle='--',
                           linewidth=1, edgecolor='k')
        ax_row[t].margins(y=0.1)
    ax_row[0].axis('on')
    for side in ('top', 'right', 'bottom', 'left'):
        ax_row[0].spines[side].set_visible(False)
    ax_row[0].set_ylabel(label, fontsize=20)


fig, ax = plt.subplots(figsize=(18, 8), ncols=T, nrows=3,
                       sharey='row', sharex='row', subplot_kw=dict(aspect=1))
order = np.argsort(z[0])
for t in range(T):
    ax[0, t].imshow(Y[t][order][:, order], cmap='gray_r')
    ax[0, t].xaxis.set_visible(False)
    ax[0, t].yaxis.set_visible(False)
    ax[0, t].set_title('t = {}'.format(t + 1), fontsize=18)

draw_latent(ax[1], X, z, mus, sigmas, 'Truth')
draw_latent(ax[2], X_rot, model.z_, mu_rot, model.sigma_, 'Estimated')
fig.savefig('merging_results.png', dpi=300, bbox_inches='tight')

lam = np.ravel(model.lambdas_)[model.n_burn_:]
print('lambda 95%:', np.quantile(lam, q=[0.025, 0.975]))
print('ARI:', adjusted_rand_score(z.ravel(), model.z_.ravel()))
