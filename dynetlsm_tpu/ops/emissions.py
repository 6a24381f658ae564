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


def emission_logliks_kn(X, mu, sigma, lmbda):
    """Emission log-likelihood tensor in (T, K, n) layout.

    Uses the expanded-square decomposition so the only O(T n K) products
    are (n, d) x (d, K) matmuls (MXU): with mean_tik = lam mu_k +
    (1-lam) X_{t-1,i},

      |x - m|^2 = |x|^2 - 2 lam x.mu - 2 (1-lam) x.x_prev
                  + lam^2 |mu|^2 + 2 lam (1-lam) mu.x_prev
                  + (1-lam)^2 |x_prev|^2

    The naive (T, n, K, d) broadcast puts (K, d) = (25, 2) on the vector
    tiles — ~2% lane utilisation; here everything is (T, K, n) with nodes
    on lanes.

    Parameters
    ----------
    X : (T, n, d); mu : (K, d); sigma : (K,); lmbda : scalar

    Returns
    -------
    loglik : (T, K, n)
    """
    T, n, d = X.shape
    # precision='highest': TPU default matmul precision feeds bf16 inputs,
    # which would round mu/X (~2^-8 relative) in the emission exponent
    G = jnp.einsum('kd,tnd->tkn', mu, X, precision='highest',
                   preferred_element_type=jnp.float32)        # (T, K, n)
    x_sq = jnp.sum(X * X, axis=-1)[:, None, :]                # (T, 1, n)
    mu_sq = jnp.sum(mu * mu, axis=-1)[None, :, None]          # (1, K, 1)
    X_prev = jnp.concatenate([jnp.zeros_like(X[:1]), X[:-1]], axis=0)
    G_prev = jnp.concatenate([jnp.zeros_like(G[:1]), G[:-1]], axis=0)
    x_dot = jnp.sum(X * X_prev, axis=-1)[:, None, :]          # (T, 1, n)
    xp_sq = jnp.concatenate([jnp.zeros_like(x_sq[:1]), x_sq[:-1]], axis=0)

    lam = jnp.asarray(lmbda, X.dtype)
    one_m = 1.0 - lam
    sum_sq_t0 = x_sq - 2.0 * G + mu_sq
    sum_sq_tp = (x_sq - 2.0 * lam * G - 2.0 * one_m * x_dot
                 + lam * lam * mu_sq + 2.0 * lam * one_m * G_prev
                 + one_m * one_m * xp_sq)
    is_t0 = (jnp.arange(T) == 0)[:, None, None]
    sum_sq = jnp.where(is_t0, sum_sq_t0, sum_sq_tp)
    return (-0.5 * d * (LOG_2PI + jnp.log(sigma))[None, :, None]
            - 0.5 * sum_sq / sigma[None, :, None])


def emission_logliks(X, mu, sigma, lmbda):
    """(T, n, K)-layout emission log-likelihoods (reference
    gaussian_likelihood_fast.pyx:30-54)."""
    return jnp.swapaxes(emission_logliks_kn(X, mu, sigma, lmbda), 1, 2)


def emission_likelihoods_kn(X, mu, sigma, lmbda, normalize=True):
    """exp of :func:`emission_logliks_kn`, optionally max-normalised per
    (t, node) (reference gaussian_likelihood_fast.pyx:51-54)."""
    ll = emission_logliks_kn(X, mu, sigma, lmbda)
    if normalize:
        ll = ll - jnp.max(ll, axis=1, keepdims=True)
    return jnp.exp(ll)


def emission_likelihoods(X, mu, sigma, lmbda, normalize=True):
    """exp of :func:`emission_logliks`, optionally max-normalised per (t, n)
    (reference gaussian_likelihood_fast.pyx:51-54 normalises per row)."""
    return jnp.swapaxes(
        emission_likelihoods_kn(X, mu, sigma, lmbda, normalize=normalize),
        1, 2)
