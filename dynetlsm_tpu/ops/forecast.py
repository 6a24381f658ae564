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


def _pp_forecast_step(u, eps, x_last, active, z_last, trans, mu, sigma,
                      intercept, lmbda):
    """One posterior sample's predictive draw + edge probabilities
    (the body of reference hdp_lpcm.py:590-630's per-sample loop).

    The reference renormalises the transition matrix over the sample's
    active clusters after compacting labels; here the component axis stays
    fixed at K and inactive columns are masked to zero instead — identical
    row distributions, static shapes.

    u : (n,) uniforms for the label draws; eps : (n, d) normals for the
    position draws; active : (K,) 0/1 active-cluster mask over the sample's
    *full* label trace.  ``sigma`` multiplies ``eps`` directly, matching the
    reference's use of the sampled variances as scale factors
    (hdp_lpcm.py:616-620).
    Returns (n, n) expit(intercept - dist) at the sampled positions.
    """
    w = trans * active[None, :]
    w = w / jnp.clip(jnp.sum(w, axis=1, keepdims=True), SMALL_EPS, None)
    rows = w[z_last]                                      # (n, K)
    cdf = jnp.cumsum(rows, axis=1)
    # count-based inverse CDF: flat (inactive, zero-mass) segments are
    # crossed together with their preceding active column, so the count is
    # the *original* cluster index.  Clamping u below the row total keeps a
    # roundoff tail (u > cdf[-1]) on the last active cluster instead of
    # falling onto a possibly-inactive K-1; the lower clamp keeps u == 0.0
    # (uniform draws include 0) off a zero-mass cluster-0 prefix.
    u = jnp.clip(u, 1e-12, cdf[:, -1] * (1.0 - 1e-6))
    zt = jnp.sum((u[:, None] > cdf).astype(jnp.int32), axis=1)
    mean = lmbda * mu[zt] + (1.0 - lmbda) * x_last
    xt = sigma[zt][:, None] * eps + mean
    dist = pairwise_distances(xt[None])[0]
    return jax.nn.sigmoid(intercept - dist)


def posterior_predictive_forecast(key, x_last, z_full, trans_last, mus,
                                  sigmas, intercepts, lmbdas):
    """Posterior-predictive one-step-ahead edge probabilities
    (reference hdp_lpcm.py:590-630, ``forecast_probas_pp_``).

    For every posterior sample: resample next-step labels from the
    active-renormalised last transition row, resample positions from the
    mixture dynamics, and average ``expit(intercept - dist)``.  The
    reference's per-sample / per-group Python loops become one
    ``lax.scan`` over samples of fused (n, K)/(n, n) tensor ops.

    Parameters
    ----------
    x_last : (S, n, d) last-time positions per posterior sample
    z_full : (S, T, n) full label traces (the active set is taken over all
        time steps, matching reference label_utils.renormalize_weights)
    trans_last : (S, K, K) last-time transition matrices
    mus : (S, K, d); sigmas : (S, K); intercepts, lmbdas : (S,)

    Returns probas : (n, n).  Like the reference, the diagonal is left at
    ``expit(intercept)`` (hdp_lpcm.py:629 applies no diagonal reset).
    """
    x_last = jnp.asarray(x_last, jnp.float32)
    S, n, d = x_last.shape
    z_full = jnp.asarray(z_full, jnp.int32)
    K = jnp.asarray(trans_last).shape[-1]

    def active_mask(z):
        return jnp.zeros((K,), jnp.float32).at[z.reshape(-1)].set(1.0)

    actives = jax.vmap(active_mask)(z_full)               # (S, K)

    def body(carry, sample):
        probas, k = carry
        xl, act, zl, tw, mu, sig, b, lam = sample
        k, k_u, k_e = jax.random.split(k, 3)
        u = jax.random.uniform(k_u, (n,), jnp.float32)
        eps = jax.random.normal(k_e, (n, d), jnp.float32)
        p = _pp_forecast_step(u, eps, xl, act, zl, tw, mu, sig, b, lam)
        return (probas + p / S, k), None

    samples = (x_last, actives, z_full[:, -1],
               jnp.asarray(trans_last, jnp.float32),
               jnp.asarray(mus, jnp.float32),
               jnp.asarray(sigmas, jnp.float32),
               jnp.asarray(intercepts, jnp.float32),
               jnp.asarray(lmbdas, jnp.float32))
    (probas, _), _ = jax.lax.scan(
        body, (jnp.zeros((n, n), jnp.float32), key), samples)
    return probas
