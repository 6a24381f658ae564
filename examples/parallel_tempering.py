"""Parallel tempering on a metastable directed posterior.

Beyond-reference capability demo.  The directed social-radii model turns
metastable when latent distances dwarf the O(1/n) radii: the geometry
factors (1 - d/r) are ~-15, so the joint over (intercepts, Y-fit) is
near-bimodal between sparse-graph/large-intercept and
dense-graph/small-intercept explanations, and single-site Gibbs chains
need tens of thousands of sweeps to cross (measured in
tests/test_geweke_joint.py).  Setting ``n_temps`` turns each chain into a
temperature ladder riding the same vmapped chain axis; replica exchange
lets configurations escape through the hot rungs.

Here: independent chains vs the same slot budget spent on ladders, on a
synthetic directed network in the hard regime.  Compare the spread of
per-chain posterior means — the tempered cold chains agree with each
other; the untempered chains straggle in different metastable basins.
"""
import numpy as np

from dynetlsm_tpu import DynamicNetworkLSM
from dynetlsm_tpu.datasets import network_from_dynamic_latent_space


def make_hard_directed_network(T=3, n=24, d=2, random_state=42):
    """Synthetic directed network whose latent scale sits in the
    metastable regime (distances >> radii)."""
    rng = np.random.RandomState(random_state)
    X = np.cumsum(np.concatenate(
        [1.2 * rng.randn(1, n, d), 0.4 * rng.randn(T - 1, n, d)]), axis=0)
    radii = rng.dirichlet(np.ones(n))
    Y, _ = network_from_dynamic_latent_space(
        X, intercept=np.array([1.0, 0.8]), radii=radii,
        random_state=random_state)
    return Y


def run(n_iter=2_000, tune=500, burn=500, n_slots=8, random_state=42):
    """Fit the same slot budget as independent chains vs ladders; returns
    (per-chain intercept means untempered, tempered, adapted ladder)."""
    Y = make_hard_directed_network(random_state=random_state)
    common = dict(n_iter=n_iter, tune=tune, burn=burn, is_directed=True,
                  random_state=random_state)

    plain = DynamicNetworkLSM(n_chains=n_slots, **common).fit(Y)
    tempered = DynamicNetworkLSM(n_chains=2, n_temps=n_slots // 2,
                                 beta_min=0.05, **common).fit(Y)

    b_plain = plain.intercepts_[:, :, 0].mean(axis=1)   # per-chain means
    b_pt = tempered.intercepts_[:, :, 0].mean(axis=1)   # cold slots only
    return b_plain, b_pt, tempered.temper_ladder_


if __name__ == '__main__':
    b_plain, b_pt, ladder = run()
    print('untempered  per-chain mean b_in:', np.round(b_plain, 3),
          ' spread:', round(float(b_plain.std()), 3))
    print('tempered    per-chain mean b_in:', np.round(b_pt, 3),
          ' spread:', round(float(b_pt.std()), 3))
    print('adapted ladder:', np.round(ladder, 3))
