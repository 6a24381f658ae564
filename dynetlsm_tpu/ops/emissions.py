"""Spherical-Gaussian emission kernels for the HMM label samplers.

TPU-native replacement for the reference Cython kernel
``compute_gaussian_likelihood`` (gaussian_likelihood_fast.pyx:30-54) which
computes, per node, a (T, K) matrix of emission likelihoods

    N(X_t ; mu_k, sigma_k I)                        for t = 0
    N(X_t ; lam*mu_k + (1-lam)*X_{t-1}, sigma_k I)  for t > 0

Here the whole (T, n, K) tensor is computed in one fused broadcast pass and
normalised per (t, node) in log space.
"""
import jax.numpy as jnp

import numpy as _np
LOG_2PI = float(_np.log(2.0 * _np.pi))  # host constant: no device call at import


def spherical_normal_logpdf(x, mean, var):
    """Log pdf of a spherical multivariate Gaussian, broadcasting over any
    leading axes (reference gaussian_likelihood_fast.pyx:17-27)."""
    d = x.shape[-1]
    sum_sq = jnp.sum((x - mean) ** 2, axis=-1)
    return -0.5 * d * (LOG_2PI + jnp.log(var)) - 0.5 * sum_sq / var


def emission_logliks(X, mu, sigma, lmbda):
    """Emission log-likelihood tensor for all nodes and components.

    Parameters
    ----------
    X : (T, n, d) latent positions
    mu : (K, d) component means
    sigma : (K,) spherical component variances
    lmbda : scalar blending coefficient

    Returns
    -------
    loglik : (T, n, K)
    """
    T, n, d = X.shape
    # means per (t, n, k, d): t=0 -> mu_k ; t>0 -> lam*mu_k + (1-lam)*X[t-1]
    mu_b = mu[None, None, :, :]                                   # (1,1,K,d)
    X_prev = jnp.concatenate([jnp.zeros_like(X[:1]), X[:-1]], axis=0)
    mean_t0 = jnp.broadcast_to(mu_b, (T, n, mu.shape[0], d))
    mean_tp = lmbda * mu_b + (1.0 - lmbda) * X_prev[:, :, None, :]
    is_t0 = (jnp.arange(T) == 0)[:, None, None, None]
    mean = jnp.where(is_t0, mean_t0, mean_tp)
    diff = X[:, :, None, :] - mean
    sum_sq = jnp.sum(diff * diff, axis=-1)                        # (T,n,K)
    return (-0.5 * d * (LOG_2PI + jnp.log(sigma))[None, None, :]
            - 0.5 * sum_sq / sigma[None, None, :])


def emission_likelihoods(X, mu, sigma, lmbda, normalize=True):
    """exp of :func:`emission_logliks`, optionally max-normalised per (t, n)
    (reference gaussian_likelihood_fast.pyx:51-54 normalises per row)."""
    ll = emission_logliks(X, mu, sigma, lmbda)
    if normalize:
        ll = ll - jnp.max(ll, axis=-1, keepdims=True)
    return jnp.exp(ll)
