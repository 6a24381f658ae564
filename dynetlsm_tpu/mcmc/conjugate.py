"""Conjugate Gibbs blocks for the mixture parameters (mu, sigma, lambda)
and their hyper-priors.

The reference loops components and time steps with boolean masks
(hdp_lpcm.py:901-972, lpcm.py:581-653); here every posterior sufficient
statistic is a masked einsum over the (T, n, K) responsibility tensor —
batched matmuls on the MXU, no data-dependent shapes.
"""
import jax
import jax.numpy as jnp

from ..config import SMALL_EPS
from ..math.distributions import sample_inv_gamma, sample_gamma, truncated_normal


def sample_cluster_means(key, X, resp, nk, sigma, lmbda, mean_variance_prior):
    """Gaussian conjugate update of the component means
    (reference hdp_lpcm.py:901-920).

    X : (T, n, d); resp : (T, n, K); nk : (T, K); sigma : (K,)
    Returns mu : (K, d).
    """
    T, n, d = X.shape
    K = sigma.shape[0]
    X_prev = jnp.concatenate([jnp.zeros_like(X[:1]), X[:-1]], axis=0)

    # precision: 1/tau^2 + nk0/sigma_k + (lam^2/sigma_k) * sum_{t>0} nk
    nk_rest = jnp.sum(nk[1:], axis=0) if T > 1 else jnp.zeros(K)
    pk = (1.0 / mean_variance_prior
          + nk[0] / sigma
          + (lmbda ** 2 / sigma) * nk_rest)

    # mean statistic (highest precision: TPU default matmul precision would
    # round the position values to bf16 inside the sufficient statistics)
    m0 = jnp.einsum('ik,id->kd', resp[0], X[0],
                    precision='highest') / sigma[:, None]
    diff_rest = X[1:] - (1.0 - lmbda) * X_prev[1:]
    m_rest = jnp.einsum('tik,tid->kd', resp[1:], diff_rest,
                        precision='highest')
    mk = m0 + (lmbda / sigma[:, None]) * m_rest

    var = 1.0 / pk
    mean = var[:, None] * mk
    noise = jax.random.normal(key, (K, d), X.dtype)
    return mean + jnp.sqrt(var)[:, None] * noise


def sample_cluster_variances(key, X, resp, nk, mu, lmbda, a, b):
    """Inverse-gamma conjugate update of the spherical component variances
    (reference hdp_lpcm.py:923-937).

    The residual sums of squares use the expanded-square decomposition
    (|r - s mu_k|^2 = |r|^2 - 2 s r.mu_k + s^2 |mu_k|^2, weighted by resp),
    so the only O(T n K) work is (n, K) x (n, d) matmuls — no (T, n, K, d)
    broadcast tensor ever hits HBM.

    Returns sigma : (K,).
    """
    T, n, d = X.shape
    K = mu.shape[0]

    ak = 0.5 * (jnp.sum(nk, axis=0) * d + a)
    mu_sq = jnp.sum(mu * mu, axis=-1)                            # (K,)

    # t=0 residuals: X0 - mu_k (highest precision throughout: bf16-input
    # matmuls would round the residual statistics feeding the posterior)
    x0_sq = jnp.sum(X[0] * X[0], axis=-1)                        # (n,)
    s0 = jnp.einsum('ik,id->kd', resp[0], X[0],
                    precision='highest')                         # (K, d)
    ss0 = (jnp.matmul(resp[0].T, x0_sq, precision='highest')
           - 2.0 * jnp.sum(s0 * mu, axis=-1)
           + nk[0] * mu_sq)
    if T > 1:
        # t>0 residuals: (X_t - (1-lam) X_{t-1}) - lam mu_k
        base = X[1:] - (1.0 - lmbda) * X[:-1]                    # (T-1, n, d)
        base_sq = jnp.sum(base * base, axis=-1)                  # (T-1, n)
        sb = jnp.einsum('tik,tid->kd', resp[1:], base,
                        precision='highest')                     # (K, d)
        nk_rest = jnp.sum(nk[1:], axis=0)                        # (K,)
        ss_rest = (jnp.einsum('tik,ti->k', resp[1:], base_sq,
                              precision='highest')
                   - 2.0 * lmbda * jnp.sum(sb * mu, axis=-1)
                   + (lmbda * lmbda) * nk_rest * mu_sq)
    else:
        ss_rest = jnp.zeros(K)
    bk = 0.5 * b + 0.5 * (ss0 + ss_rest)
    # float32 floor: empty clusters with a collapsing b_scale hyper-prior can
    # spiral sigma -> 0, which poisons the 1/sigma terms of the latent prior
    # (float64 headroom hides this in the reference)
    return jnp.clip(sample_inv_gamma(key, ak, bk), 1e-8, None)


def sample_lambda(key, X, z, mu, sigma, lambda_prior, lambda_variance_prior,
                  resp=None):
    """Truncated-normal conjugate update of the blending coefficient
    (reference hdp_lpcm.py:939-954).

    With ``resp`` (one-hot responsibilities of ``z``) the per-site cluster
    parameters come from MXU matmuls instead of gathers — identical values
    (one-hot contraction)."""
    T = X.shape[0]
    if T == 1:
        # no transitions: sample from the (truncated) prior
        return truncated_normal(key, jnp.asarray(lambda_prior, X.dtype),
                                jnp.asarray(lambda_variance_prior, X.dtype))
    if resp is not None:
        # highest precision keeps the one-hot contraction bit-identical to
        # the gather (TPU default would truncate mu/sigma to bf16)
        mu_z = jnp.einsum('tnk,kd->tnd', resp[1:], mu,
                          precision='highest')           # (T-1, n, d)
        sig_z = jnp.einsum('tnk,k->tn', resp[1:], sigma,
                           precision='highest')[..., None]
    else:
        mu_z = mu[z[1:]]                            # (T-1, n, d)
        sig_z = sigma[z[1:]][..., None]             # (T-1, n, 1)
    ml_diff = (mu_z - X[:-1]) / sig_z
    X_diff = X[1:] - X[:-1]
    ml = jnp.sum(ml_diff * X_diff)
    sl = 1.0 / lambda_variance_prior + jnp.sum((mu_z - X[:-1]) ** 2 / sig_z)
    sl = 1.0 / sl
    ml = sl * (ml + lambda_prior / lambda_variance_prior)
    return truncated_normal(key, ml, sl)


def sample_mean_variance_hyper(key, mu, a0, b0):
    """Inverse-gamma update of tau^2, the prior variance of the cluster means
    (reference hdp_lpcm.py:957-964)."""
    K = mu.shape[0]
    b = 0.5 * b0 + 0.5 * jnp.sum(mu * mu)
    a = 0.5 * (a0 + K)
    return jnp.clip(sample_inv_gamma(key, a, b), 1e-8, None)


def sample_sigma_scale_hyper(key, sigma, a, c0, d0):
    """Gamma update of b, the scale of the InvGamma prior on the cluster
    variances (reference hdp_lpcm.py:967-972)."""
    K = sigma.shape[0]
    scale = 0.5 * d0 + 0.5 * jnp.sum(1.0 / jnp.clip(sigma, SMALL_EPS, None))
    shape = 0.5 * (c0 + K * a)
    return jnp.clip(sample_gamma(key, shape, scale), 1e-8, None)
