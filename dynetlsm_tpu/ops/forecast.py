"""Posterior-marginalised one-step-ahead forecasting.

TPU-native replacement for the reference Cython kernel ``marginal_forecast``
(forecast.pyx:79-128): the per-(sample, dyad, component) triple loop becomes
a ``lax.scan`` over posterior samples of fused (n, K)/(n, n) tensor ops.
The reference's active-cluster renormalisation (forecast.pyx:57-67) is
reproduced with masks over the fixed component axis, so shapes stay static.
"""
import jax
import jax.numpy as jnp

from ..config import SMALL_EPS
from .distances import pairwise_distances

import numpy as _np
LOG_2PI = float(_np.log(2.0 * _np.pi))  # host constant: no device call at import


def _node_mixture_weights(x, x_prev, z, trans, mu, sigma, lmbda,
                          renormalize):
    """w_i = sum_k W[z_i, k] N(x_i ; lam mu_k + (1-lam) x_prev_i, sigma_k I)
    with W the (optionally active-renormalised) transition matrix.

    Shapes: x, x_prev (n, d); z (n,); trans (K, K); mu (K, d); sigma (K,).
    Returns (n,) mixture densities.
    """
    K = sigma.shape[0]
    if renormalize:
        active = jnp.zeros((K,), x.dtype).at[z].set(1.0)
        w = trans * active[None, :]
        w = w / jnp.clip(jnp.sum(w * active[None, :], axis=1, keepdims=True),
                         SMALL_EPS, None)
        w = w * active[None, :]
    else:
        w = trans
    w_rows = w[z]                                            # (n, K)

    mean = lmbda * mu[None, :, :] + (1.0 - lmbda) * x_prev[:, None, :]
    ss = jnp.sum((x[:, None, :] - mean) ** 2, axis=-1)       # (n, K)
    d = x.shape[-1]
    pdf = jnp.exp(-0.5 * d * (LOG_2PI + jnp.log(sigma))[None, :]
                  - 0.5 * ss / sigma[None, :])
    return jnp.sum(w_rows * pdf, axis=-1)


def marginal_forecast(x, x_prev, z, trans_weights, mus, sigmas, intercepts,
                      lmbdas, renormalize=True):
    """Importance-weighted posterior average of one-step-ahead edge
    probabilities (reference forecast.pyx:79-128).

    Parameters
    ----------
    x : (n, d) forecast-time plug-in positions
    x_prev : (S, n, d) last-time positions per posterior sample
    z : (S, n) last-time labels
    trans_weights : (S, K, K) transition matrices (last time step)
    mus : (S, K, d); sigmas : (S, K); intercepts, lmbdas : (S,)

    Returns probas : (n, n) with unit diagonal weights normalisation.
    """
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[0]
    dist = pairwise_distances(x)
    S = x_prev.shape[0]

    def body(carry, sample):
        probas, sum_w = carry
        xp, zz, tw, mu, sig, b, lam = sample
        wi = _node_mixture_weights(x, xp, zz, tw, mu, sig, lam, renormalize)
        wij = wi[:, None] * wi[None, :]
        probas = probas + wij * jax.nn.sigmoid(b - dist) / S
        sum_w = sum_w + wij / S
        return (probas, sum_w), None

    init = (jnp.zeros((n, n), jnp.float32), jnp.zeros((n, n), jnp.float32))
    samples = (jnp.asarray(x_prev, jnp.float32), jnp.asarray(z, jnp.int32),
               jnp.asarray(trans_weights, jnp.float32),
               jnp.asarray(mus, jnp.float32), jnp.asarray(sigmas, jnp.float32),
               jnp.asarray(intercepts, jnp.float32),
               jnp.asarray(lmbdas, jnp.float32))
    (probas, sum_w), _ = jax.lax.scan(body, init, samples)

    sum_w = sum_w.at[jnp.arange(n), jnp.arange(n)].set(1.0)
    probas = probas / jnp.clip(sum_w, SMALL_EPS, None)
    # the reference leaves the diagonal untouched at zero (no self-loops)
    return probas * (1.0 - jnp.eye(n, dtype=probas.dtype))
