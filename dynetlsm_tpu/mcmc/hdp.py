"""Sticky HDP-HMM auxiliary-variable samplers (jittable).

Replaces reference sample_auxillary.py (CRF table counts + sticky override
variables) and sample_concentration.py (Escobar-West updates) with
fixed-shape masked formulations:

* table counts m[t,j,k] = sum_{i<n_tjk} Bernoulli(p / (p + i)) are computed
  by a capped arange: the first ``cap`` Bernoullis are drawn exactly (padded
  + masked, fixed shapes), and the i >= cap tail — whose success
  probabilities are all <= p/(p+cap) — is drawn as one Poisson with the
  exact tail mean p * (digamma(p+c) - digamma(p+cap)).  Le Cam's theorem
  bounds the total-variation error of the Poisson tail by
  sum q_i^2 <= p/(p+cap) * mean, i.e. a few percent of an already-small
  tail count at cap=64.  With ``cap >= n_max`` the sampler is exact and
  bit-identical to the uncapped masked-arange formulation.  This turns the
  (T, K, K, n) uniform tensor — ~100M draws/sweep at T=10, n=500, K=25,
  32 chains — into (T, K, K, cap) + (T, K, K) draws.
"""
import jax
import jax.numpy as jnp
from jax.scipy.special import digamma

from ..config import SMALL_EPS
from ..math.distributions import sample_beta, sample_gamma, sample_gamma_fixed


def _fast_poisson(key, lam, n_terms=8):
    """Vectorised Poisson sampler without rejection loops.

    ``jax.random.poisson`` lowers to data-dependent while-loops that cost
    ~5 ms at the (C, T, K, K) shapes of the CRF tail; here small rates use
    inverse-CDF with a truncated series (P(X > 8 | lam <= 2.5) < 1e-3) and
    larger rates the rounded-Normal approximation — both one fused pass.
    """
    k_u, k_z = jax.random.split(key)
    u = jax.random.uniform(k_u, lam.shape)
    # CDF_j = e^-lam * sum_{i<=j} lam^i / i!; X = #{j : u > CDF_j}
    term = jnp.exp(-lam)
    cdf = term
    small = jnp.zeros_like(lam)
    for j in range(1, n_terms + 1):
        small = small + (u > cdf).astype(lam.dtype)
        term = term * lam / j
        cdf = cdf + term
    z = jax.random.normal(k_z, lam.shape)
    large = jnp.round(lam + jnp.sqrt(jnp.maximum(lam, 0.0)) * z)
    return jnp.where(lam > 2.5, jnp.maximum(large, 0.0), small)


def sample_tables(key, n_trans, beta, alpha_init, alpha, kappa, n_max,
                  cap=64):
    """CRF table counts (reference sample_auxillary.py:6-28).

    n_trans : (T, K, K) transition counts (n_trans[0, 0] = initial counts)
    n_max : static int, max possible count (n_nodes)
    cap : static int, number of exactly-sampled Bernoulli terms per cell;
        the remainder is a Poisson tail (see module docstring).

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

    L = min(cap, n_max)
    k_head, k_tail = jax.random.split(key)
    # (L, cells) layout: the (T, K, K, L) form puts L = 64 on lanes (padded
    # to 128) and K = 25 on sublanes (padded to 32), wasting ~2.5x of every
    # vector op; with cells = T*K*K on lanes and the arange on sublanes the
    # tiles pad by < 1%
    cells = T * K * K
    i_col = jnp.arange(L, dtype=jnp.float32)[:, None]    # (L, 1)
    u = jax.random.uniform(k_head, (L, cells))
    p_row = jnp.reshape(p, (1, cells))
    # u < p/(p+i)  <=>  u*i < p*(1-u): division-free (the probs tensor and
    # its divide were the most expensive part of this block).
    # i = 0 succeeds with probability 1 by definition; the explicit OR
    # guards tiny p where p*(1-u) flushes to zero (TPU has no subnormals)
    trial = jnp.logical_or(u * i_col < p_row * (1.0 - u),
                           i_col == 0.0).astype(jnp.float32)
    mask = i_col < jnp.reshape(n_trans, (1, cells))
    m = jnp.reshape(jnp.sum(jnp.where(mask, trial, 0.0), axis=0), (T, K, K))
    if n_max > L:
        c = n_trans.astype(jnp.float32)
        tail_len = jnp.maximum(c - L, 0.0)
        # exact tail mean: sum_{i=L}^{c-1} p/(p+i) = p (psi(p+c) - psi(p+L))
        tail_mean = jnp.where(tail_len > 0.0,
                              p * (digamma(p + jnp.maximum(c, L))
                                   - digamma(p + L)),
                              0.0)
        tail = _fast_poisson(k_tail, tail_mean)
        m = m + jnp.clip(tail, 0.0, tail_len)
    return m


def sample_mbar(key, m, beta, kappa, alpha, n_max, cap=64):
    """Sticky override variables w and the corrected table counts m_bar
    (reference sample_auxillary.py:31-50).

    w[t, j] ~ Binomial(m[t+1, j, j], rho / (rho + beta_j (1 - rho))) is
    drawn as a masked Bernoulli sum over a padded arange (like the table
    counts) — ``jax.random.binomial`` NaNs on batched (n=0, p=1) corners.
    Counts above ``cap`` (table counts are O(log n), so this is rare) get a
    rounded-Normal tail: Binomial(c - cap, p) ~ N((c-cap) p, (c-cap) p q).

    Returns (m_bar_sum (K,), w (T-1, K)).
    """
    T, K, _ = m.shape
    rho = kappa / (alpha + kappa)
    p = rho / (rho + beta * (1.0 - rho))                 # (K,)
    diag_m = jnp.einsum('tkk->tk', m[1:])                # (T-1, K)
    L = min(cap, n_max)
    i = jnp.arange(L, dtype=jnp.float32)
    k_head, k_tail = jax.random.split(key)
    u = jax.random.uniform(k_head, (T - 1, K, L))
    trial = (u < p[None, :, None]).astype(jnp.float32)
    w = jnp.sum(jnp.where(i[None, None, :] < diag_m[..., None], trial, 0.0),
                axis=-1)
    if n_max > L:
        tail_len = jnp.maximum(diag_m - L, 0.0)          # (T-1, K)
        mean = tail_len * p[None, :]
        var = mean * (1.0 - p[None, :])
        z = jax.random.normal(k_tail, mean.shape)
        tail = jnp.round(mean + jnp.sqrt(jnp.maximum(var, 0.0)) * z)
        w = w + jnp.clip(tail, 0.0, tail_len)
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
    # Beta(alpha_kappa + 1, n_dot) via two fixed-round gammas, elementwise
    # (jax.random.gamma's rejection while-loop serialises poorly on TPU)
    ga = sample_gamma_fixed(k_r, jnp.full(n_dot.shape, alpha_kappa + 1.0))
    gb = sample_gamma_fixed(jax.random.fold_in(k_r, 1),
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
