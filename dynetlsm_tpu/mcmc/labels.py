"""Blocked HMM label sampling (forward-filter backward-sample, batched).

TPU-native replacement for the reference per-node Python FFBS
(sample_labels.py:73-190): emissions for all (t, node, component) are one
fused kernel, the backward message recursion is a ``lax.scan`` over T of
(n, K) x (K, K) matmuls (MXU), and the forward sampling pass draws all
nodes' labels per time step with one Gumbel-argmax.

Transition-count statistics use one-hot outer products (batched matmuls)
instead of scalar accumulation.
"""
import jax
import jax.numpy as jnp

from ..config import SMALL_EPS
from ..ops.emissions import (
    emission_likelihoods, emission_likelihoods_kn, emission_logliks)


def _backward_messages(lik, w):
    """Backward messages and partial marginals, (K, n) layout (nodes on
    vector lanes: K=25 on lanes would use 20% of each tile).

    lik : (T, K, n) emission likelihoods
    w : (T, K, K) transition matrices (w[t] used for the t-1 -> t step)

    Returns partial_marg (T, K, n) = lik[t] * bwds_msg[t] with
    bwds_msg[T-1]=1 (reference sample_labels.py:164-170).
    """
    T = lik.shape[0]

    def step(bwds, t):
        pm = lik[t] * bwds                              # (K, n)
        # highest precision: bf16 inputs (TPU matmul default) would round
        # the transition probabilities inside the message recursion
        b = jnp.matmul(w[t], pm, precision='highest')   # b[j,i] = sum_k w[t,j,k] pm[k,i]
        b = b / jnp.clip(jnp.sum(b, axis=0, keepdims=True), SMALL_EPS, None)
        return b, pm

    bwds_last = jnp.ones_like(lik[0])
    bwds0, pm_rev = jax.lax.scan(step, bwds_last, jnp.arange(T - 1, 0, -1))
    pm = jnp.concatenate([(lik[0] * bwds0)[None], pm_rev[::-1]], axis=0)
    return pm


def _forward_sample(key, pm, w0, w):
    """Sample labels forward in time given (K, n) partial marginals
    (reference sample_labels.py:173-188).

    Returns z : (T, n) int32.
    """
    T, K, n = pm.shape
    keys = jax.random.split(key, T)

    logits0 = jnp.log(jnp.clip(w0[:, None] * pm[0], SMALL_EPS, None))
    g0 = jax.random.gumbel(keys[0], (K, n), pm.dtype)
    z0 = jnp.argmax(logits0 + g0, axis=0).astype(jnp.int32)

    def step(z_prev, inputs):
        t_key, pm_t, w_t = inputs
        # w_t[z_prev].T as a one-hot contraction: (n, K) @ (K, K) on the
        # MXU instead of an n-row gather (bit-exact at highest precision —
        # one exact product plus K-1 exact zeros; TPU default precision
        # would truncate w_t to bf16 first)
        oh = jax.nn.one_hot(z_prev, K, dtype=pm_t.dtype)
        probas = jnp.matmul(oh, w_t, precision='highest').T * pm_t  # (K, n)
        logits = jnp.log(jnp.clip(probas, SMALL_EPS, None))
        g = jax.random.gumbel(t_key, (K, n), pm.dtype)
        z_t = jnp.argmax(logits + g, axis=0).astype(jnp.int32)
        return z_t, z_t

    _, z_rest = jax.lax.scan(step, z0, (keys[1:], pm[1:], w[1:]))
    return jnp.concatenate([z0[None], z_rest], axis=0)


def _label_statistics(z, K):
    """Cluster statistics from sampled labels.

    Returns (n_trans (T, K, K), nk (T, K), resp (T, n, K)) with the
    reference's convention that n_trans[0, 0, k] stores the initial counts
    (sample_labels.py:146-152, 182-188).
    """
    T, n = z.shape
    resp = jax.nn.one_hot(z, K, dtype=jnp.float32)       # (T, n, K)
    nk = jnp.sum(resp, axis=1)                           # (T, K)
    trans = jnp.einsum('tij,tik->tjk', resp[:-1], resp[1:])  # (T-1, K, K)
    init_counts = jnp.zeros((K, K), jnp.float32).at[0].set(nk[0])
    n_trans = jnp.concatenate([init_counts[None], trans], axis=0)
    return n_trans, nk, resp


def sample_labels_block(key, X, mu, sigma, lmbda, weights):
    """Blocked FFBS with time-inhomogeneous transitions (HDP-LPCM).

    weights : (T, K, K); weights[0, 0] holds the initial distribution
    (reference convention, hdp_lpcm.py:123).
    Returns (z, n_trans, nk, resp).
    """
    K = sigma.shape[0]
    lik = emission_likelihoods_kn(X, mu, sigma, lmbda, normalize=True)
    pm = _backward_messages(lik, weights)
    z = _forward_sample(key, pm, weights[0, 0], weights)
    n_trans, nk, resp = _label_statistics(z, K)
    return z, n_trans, nk, resp


def sample_labels_block_lpcm(key, X, mu, sigma, lmbda, init_weights,
                             trans_weights):
    """Blocked FFBS with a time-constant transition matrix (LPCM)
    (reference sample_labels.py:73-131)."""
    T = X.shape[0]
    K = sigma.shape[0]
    w = jnp.broadcast_to(trans_weights, (T,) + trans_weights.shape)
    lik = emission_likelihoods_kn(X, mu, sigma, lmbda, normalize=True)
    pm = _backward_messages(lik, w)
    z = _forward_sample(key, pm, init_weights, w)
    n_trans, nk, resp = _label_statistics(z, K)
    return z, n_trans, nk, resp


def sample_labels_gibbs(key, X, mu, sigma, lmbda, w0, w):
    """Per-site forward label sampling without backward messages
    (reference sample_labels.py:22-70) — kept for parity/testing; the
    blocked FFBS samplers are what the fits use.

    w0 : (K,) initial distribution; w : (K, K) time-constant transitions.
    Returns (z, n_trans, nk, resp).
    """
    from ..config import LOG_GUARD
    T, n, d = X.shape
    K = sigma.shape[0]
    loglik = emission_logliks(X, mu, sigma, lmbda)       # (T, n, K)
    keys = jax.random.split(key, T)

    logits0 = jnp.log(w0 + LOG_GUARD)[None, :] + loglik[0]
    g0 = jax.random.gumbel(keys[0], (n, K), loglik.dtype)
    z0 = jnp.argmax(logits0 + g0, axis=-1).astype(jnp.int32)

    def step(z_prev, inputs):
        t_key, ll_t = inputs
        logits = jnp.log(w[z_prev] + LOG_GUARD) + ll_t
        g = jax.random.gumbel(t_key, (n, K), loglik.dtype)
        z_t = jnp.argmax(logits + g, axis=-1).astype(jnp.int32)
        return z_t, z_t

    _, z_rest = jax.lax.scan(step, z0, (keys[1:], loglik[1:]))
    z = jnp.concatenate([z0[None], z_rest], axis=0)
    n_trans, nk, resp = _label_statistics(z, K)
    return z, n_trans, nk, resp


def latent_marginal_loglikelihood(X, init_w, trans_w, mu, sigma, lmbda):
    """Forward-algorithm marginal log-likelihood of the latent positions
    under the mixture HMM, summed over nodes — batched version of the
    reference's per-node loop (model_selection/approx_bic.py:56-76).

    trans_w : (T, K, K) (entry 0 unused).
    """
    lik = emission_likelihoods(X, mu, sigma, lmbda, normalize=False)
    T = X.shape[0]

    fwd = init_w[None, :] * lik[0]                      # (n, K)
    c = jnp.clip(jnp.sum(fwd, axis=-1), SMALL_EPS, None)
    loglik = jnp.sum(jnp.log(c))
    fwd = fwd / c[:, None]

    def step(carry, t):
        fwd, loglik = carry
        f = lik[t] * jnp.matmul(fwd, trans_w[t],
                                precision='highest')    # sum_j w[t,j,k] fwd[i,j]
        c = jnp.clip(jnp.sum(f, axis=-1), SMALL_EPS, None)
        loglik = loglik + jnp.sum(jnp.log(c))
        return (f / c[:, None], loglik), None

    (_, loglik), _ = jax.lax.scan(step, (fwd, loglik), jnp.arange(1, T))
    return loglik


def log_normalize(log_probas, axis=-1):
    """Probabilities from unnormalised log-probabilities, batched
    (reference sample_labels.py:8-13 — in-place, host-side there)."""
    x = log_probas - jnp.max(log_probas, axis=axis, keepdims=True)
    x = jnp.exp(x)
    return x / jnp.sum(x, axis=axis, keepdims=True)
