"""Approximate-BIC model selection over posterior cluster counts.

Replaces reference model_selection/approx_bic.py: for each occupied-cluster
count K observed in the posterior, take the MAP sample with that count,
renormalise to its active clusters, and score a two-part BIC (network
likelihood + forward-algorithm marginal of the latent mixture).
"""
import numpy as np
import jax.numpy as jnp

from ..mcmc.labels import latent_marginal_loglikelihood
from ..ops.distances import pairwise_distances
from ..ops.likelihoods import (
    undirected_loglik_full, directed_loglik_full)

__all__ = ['select_bic', 'DynamicNetworkMixtureModel']


class DynamicNetworkMixtureModel:
    """Container for a renormalised per-K MAP model
    (reference approx_bic.py:12-24)."""

    def __init__(self, beta, init_weights, trans_weights, X, mu, sigma,
                 lmbda, z, intercept, radii=None):
        self.beta = beta
        self.init_weights = init_weights
        self.trans_weights = trans_weights
        self.X = X
        self.mu = mu
        self.sigma = sigma
        self.lmbda = lmbda
        self.z = z
        self.intercept = intercept
        self.radii = radii


def _renormalize_sample(zs, beta, weights, mus, sigmas):
    """Restrict one posterior sample to its active clusters
    (reference approx_bic.py:104-120)."""
    active = np.unique(zs.ravel())
    k = active.shape[0]
    T = weights.shape[0]

    beta_a = beta[active].copy()
    beta_a /= beta_a.sum()

    init_w = weights[0, 0, active].copy()
    init_w /= init_w.sum()

    trans_w = np.zeros((T, k, k))
    for t in range(1, T):
        trans_w[t] = weights[t][np.ix_(active, active)]
        trans_w[t] /= trans_w[t].sum(axis=1, keepdims=True)

    return active, beta_a, init_w, trans_w, mus[active], sigmas[active]


def select_bic(Y, traces, n_burn, is_directed, n_features):
    """Per-K MAP extraction + BIC scoring (reference approx_bic.py:79-162).

    Parameters
    ----------
    Y : (T, n, n) fitted network
    traces : dict with post-burn-inclusive arrays Xs, intercepts, mus,
        sigmas, betas, weights, lambdas, zs, logps (+ radiis if directed),
        all with the sample axis leading.
    n_burn : samples to discard from the front.

    Returns (bic (M, 4) [K, bic, net-loglik, map_id], models, counts).
    """
    T, n_nodes, _ = Y.shape
    zs = traces['zs']
    logps = traces['logps']
    S = zs.shape[0]

    counts = np.array([np.unique(zs[i].ravel()).shape[0]
                       for i in range(n_burn, S)])

    # The per-K loop evaluates many tiny ragged-shape expressions; running
    # them eagerly on a remote accelerator costs a dispatch round-trip per
    # primitive.  Pin this post-processing to the host CPU backend (the
    # arrays are K <= n_components sized — microseconds of compute).
    import jax
    try:
        cpu = jax.devices('cpu')[0]
    except RuntimeError:  # pragma: no cover - cpu platform always present
        cpu = None
    with jax.default_device(cpu):
        return _select_bic_body(Y, traces, n_burn, is_directed, n_features,
                                zs, logps, counts)


def _select_bic_body(Y, traces, n_burn, is_directed, n_features, zs, logps,
                     counts):
    T, n_nodes, _ = Y.shape
    Yj = jnp.asarray(Y, jnp.float32)
    bic, models = [], []
    for k in np.unique(counts):
        masked = np.where(counts == k, logps[n_burn:], -np.inf)
        map_id = int(np.argmax(masked)) + n_burn

        X = traces['Xs'][map_id]
        intercept = traces['intercepts'][map_id]
        lmbda = float(np.ravel(traces['lambdas'][map_id])[0])
        radii = traces['radiis'][map_id] if is_directed else None

        active, beta_a, init_w, trans_w, mu_a, sigma_a = _renormalize_sample(
            zs[map_id], traces['betas'][map_id], traces['weights'][map_id],
            traces['mus'][map_id], traces['sigmas'][map_id])

        dist = pairwise_distances(jnp.asarray(X, jnp.float32))
        if is_directed:
            loglik_k = float(directed_loglik_full(
                Yj, dist, jnp.asarray(radii, jnp.float32),
                float(intercept[0]), float(intercept[1])))
            bic_k = -2 * loglik_k
            n_params = 2 + n_nodes
            offdiag = Y.sum() - np.einsum('tii->', Y)
            bic_k += n_params * np.log(offdiag)
        else:
            loglik_k = float(undirected_loglik_full(
                Yj, dist, float(intercept[0])))
            bic_k = -2 * loglik_k
            bic_k += np.log(0.5 * (Y.sum() - np.einsum('tii->', Y)))

        bic_k -= 2 * float(latent_marginal_loglikelihood(
            jnp.asarray(X, jnp.float32), jnp.asarray(init_w, jnp.float32),
            jnp.asarray(trans_w, jnp.float32), jnp.asarray(mu_a, jnp.float32),
            jnp.asarray(sigma_a, jnp.float32), lmbda))

        n_params = ((n_features + 1) * k + (k - 1) + (k - 1)
                    + (T - 1) * k * (k - 1))
        bic_k += n_params * np.log(n_nodes * T)

        models.append(DynamicNetworkMixtureModel(
            beta=beta_a, init_weights=init_w, trans_weights=trans_w,
            X=X, mu=mu_a, sigma=sigma_a, lmbda=lmbda, z=zs[map_id],
            intercept=intercept, radii=radii))
        bic.append([k, bic_k, loglik_k, map_id])

    return np.array(bic), models, counts
