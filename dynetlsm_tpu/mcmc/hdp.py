"""Sticky HDP-HMM auxiliary-variable samplers (jittable).

Replaces reference sample_auxillary.py (CRF table counts + sticky override
variables) and sample_concentration.py (Escobar-West updates) with
fixed-shape masked formulations:

* table counts m[t,j,k] = sum_{i<n_tjk} Bernoulli(p / (p + i)) are computed
  by padding the arange to n_nodes and masking i < n_tjk — one big
  (T, K, K, n_max) uniform draw instead of data-dependent loops.
"""
import jax
import jax.numpy as jnp

from ..config import SMALL_EPS
from ..math.distributions import sample_beta, sample_gamma


def sample_tables(key, n_trans, beta, alpha_init, alpha, kappa, n_max):
    """CRF table counts (reference sample_auxillary.py:6-28).

    n_trans : (T, K, K) transition counts (n_trans[0, 0] = initial counts)
    n_max : static int, max possible count (n_nodes)

    Returns m : (T, K, K) float table counts.
    """
    T, K, _ = n_trans.shape
    # success probabilities p[t, j, k]
    p0 = alpha_init * beta                               # (K,) for t=0 row 0
    p_t = alpha * beta[None, :] + kappa * jnp.eye(K)     # (K, K) for t >= 1
    p = jnp.broadcast_to(p_t[None], (T, K, K))
    p = p.at[0].set(jnp.zeros((K, K)).at[0].set(p0))
    # float32 guard: beta entries of inactive clusters can underflow to 0,
    # which would make the i=0 probability 0/0 = NaN (float64 headroom hides
    # this in the reference)
    p = jnp.clip(p, SMALL_EPS, None)

    i = jnp.arange(n_max, dtype=jnp.float32)             # (n_max,)
    probs = p[..., None] / (p[..., None] + i)            # (T, K, K, n_max)
    u = jax.random.uniform(key, probs.shape)
    mask = i[None, None, None, :] < n_trans[..., None]
    return jnp.sum(jnp.where(mask, (u < probs).astype(jnp.float32), 0.0),
                   axis=-1)


def sample_mbar(key, m, beta, kappa, alpha, n_max):
    """Sticky override variables w and the corrected table counts m_bar
    (reference sample_auxillary.py:31-50).

    w[t, j] ~ Binomial(m[t+1, j, j], rho / (rho + beta_j (1 - rho))) is
    drawn as a masked Bernoulli sum over a padded arange (like the table
    counts) — ``jax.random.binomial`` NaNs on batched (n=0, p=1) corners.

    Returns (m_bar_sum (K,), w (T-1, K)).
    """
    T, K, _ = m.shape
    rho = kappa / (alpha + kappa)
    p = rho / (rho + beta * (1.0 - rho))                 # (K,)
    diag_m = jnp.einsum('tkk->tk', m[1:])                # (T-1, K)
    i = jnp.arange(n_max, dtype=jnp.float32)
    u = jax.random.uniform(key, (T - 1, K, n_max))
    trial = (u < p[None, :, None]).astype(jnp.float32)
    w = jnp.sum(jnp.where(i[None, None, :] < diag_m[..., None], trial, 0.0),
                axis=-1)
    # m_bar[t] = m[t+1] - diag(w[t]); summed over (t, j) plus initial row
    m_bar_sum = jnp.sum(m[1:], axis=(0, 1)) - jnp.sum(w, axis=0) + m[0, 0]
    return m_bar_sum, w


def sample_concentration_param(key, alpha, n_clusters, n_samples,
                               prior_shape=1.0, prior_rate=1.0):
    """Escobar & West (1995) auxiliary-variable concentration update
    (reference sample_concentration.py:6-21)."""
    k_eta, k_mix, k_gam = jax.random.split(key, 3)
    eta = sample_beta(k_eta, alpha + 1.0, jnp.clip(n_samples, 1.0, None))
    m_shape = prior_shape + n_clusters - 1.0
    m_scale = prior_rate - jnp.log(jnp.clip(eta, SMALL_EPS, None))
    log_odds = (m_shape / m_scale) / jnp.clip(n_samples, 1.0, None)
    mix = jax.random.uniform(k_mix) < (log_odds / (1.0 + log_odds))
    m_shape = jnp.where(mix, m_shape + 1.0, m_shape)
    # degenerate-count guard: keeps the Gamma shape strictly positive so a
    # transient zero-table state cannot poison the chain with NaNs
    m_shape = jnp.clip(m_shape, 0.01, None)
    return sample_gamma(k_gam, m_shape, m_scale)


def sample_alpha_kappa_rho(key, n_trans, m, w, alpha, kappa,
                           alpha_kappa_shape, alpha_kappa_rate,
                           rho_a=8.0, rho_b=2.0):
    """Joint (alpha + kappa) gamma-augmentation update and the stickiness
    fraction rho ~ Beta (reference hdp_lpcm.py:998-1023).

    The reference restricts the auxiliary draws to rows with
    n_dot[t, j] > 0; zero rows are masked out of the shape/rate sums here.

    Returns (alpha_new, kappa_new).
    """
    k_s, k_r, k_g, k_rho = jax.random.split(key, 4)
    alpha_kappa = alpha + kappa

    n_dot = jnp.sum(n_trans[1:], axis=2)                 # (T-1, K)
    valid = n_dot > 0
    s = jax.random.uniform(k_s, n_dot.shape) < (n_dot / (n_dot + alpha_kappa))
    # Beta(alpha_kappa + 1, n_dot) via two gammas, elementwise
    ga = jax.random.gamma(k_r, jnp.full(n_dot.shape, alpha_kappa + 1.0))
    gb = jax.random.gamma(jax.random.fold_in(k_r, 1),
                          jnp.clip(n_dot, SMALL_EPS, None))
    r = ga / jnp.clip(ga + gb, SMALL_EPS, None)

    m_dot = jnp.sum(m[1:], axis=2)                       # (T-1, K)
    shape = (alpha_kappa_shape
             + jnp.sum(jnp.where(valid, m_dot, 0.0))
             - jnp.sum(jnp.where(valid, s.astype(jnp.float32), 0.0)))
    rate = alpha_kappa_rate - jnp.sum(
        jnp.where(valid, jnp.log(jnp.clip(r, SMALL_EPS, None)), 0.0))
    alpha_kappa = sample_gamma(k_g, shape, rate)

    # rho ~ Beta(rho_a + sum(w), rho_b + sum(m[1:]) - sum(w))
    n_success = jnp.sum(w)
    rho = sample_beta(k_rho, rho_a + n_success,
                      jnp.clip(jnp.sum(m[1:]) - n_success + rho_b,
                               SMALL_EPS, None))
    kappa_new = alpha_kappa * rho
    alpha_new = alpha_kappa - kappa_new
    return alpha_new, kappa_new
