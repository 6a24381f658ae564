"""Jittable primitive distributions used by the Gibbs blocks.

Replaces reference dynetlsm/distributions.py (scipy.stats based, host-only)
with counter-based ``jax.random`` samplers usable inside jitted sweeps.
"""
import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln, ndtr, ndtri

from ..config import SMALL_EPS


# ---------------------------------------------------------------------------
# Gamma (fixed-round) / Dirichlet
# ---------------------------------------------------------------------------

_TINY = 1e-20


def _gamma_mt_fixed(key, alpha, n_rounds=2):
    """Fixed-round Marsaglia-Tsang Gamma(alpha, 1) sampler for alpha >= 1.

    ``jax.random.gamma`` lowers to a data-dependent rejection while-loop
    that serialises poorly on TPU (~3.6 ms/sweep for the (C, T, K, K)
    transition-weight draws at the north-star scale).  Marsaglia-Tsang
    accepts >= 95% of proposals per round for alpha >= 1, so two unrolled
    rounds leave < 0.25% of draws unaccepted; those fall back to the last
    round's squeezed proposal d*(1+c x)^3 — itself the mode-matched
    Wilson-Hilferty approximation of the target — bounding the total
    variation error of the sampler by ~2.5e-3 per draw (validated
    distributionally in tests/test_distributions.py).
    """
    d = alpha - 1.0 / 3.0
    c = 1.0 / jnp.sqrt(9.0 * d)
    k_x, k_u = jax.random.split(key)
    shape = (n_rounds,) + jnp.shape(alpha)
    xs = jax.random.normal(k_x, shape)
    us = jax.random.uniform(k_u, shape, minval=_TINY)
    v = (1.0 + c * xs) ** 3
    ok = jnp.logical_and(
        v > 0.0,
        jnp.log(us) < (0.5 * xs * xs + d - d * v
                       + d * jnp.log(jnp.maximum(v, _TINY))))
    val = d * jnp.maximum(v[-1], _TINY)          # fallback: last proposal
    for r in range(n_rounds - 1, -1, -1):        # first accepted round wins
        val = jnp.where(ok[r], d * v[r], val)
    return val


def sample_gamma_fixed(key, alpha, n_rounds=2):
    """Gamma(alpha, 1) with fixed-round Marsaglia-Tsang (alpha >= 1) and the
    boost identity G(a) = G(a+1) * U^(1/a) for alpha < 1 — no rejection
    loops, so the whole draw is one fused vector pass on TPU."""
    alpha = jnp.asarray(alpha)
    small = alpha < 1.0
    a_core = jnp.where(small, alpha + 1.0, alpha)
    k_mt, k_b = jax.random.split(key)
    g = _gamma_mt_fixed(k_mt, a_core, n_rounds=n_rounds)
    u = jax.random.uniform(k_b, alpha.shape, minval=_TINY)
    boost = jnp.exp(jnp.log(u) / jnp.maximum(alpha, _TINY))
    return jnp.where(small, g * boost, g)


def sample_dirichlet(key, alphas):
    """Dirichlet sample via normalised fixed-round Gammas with clipping.

    The reference clips non-positive concentrations before sampling
    (distributions.py:87-94) and re-normalises zero draws
    (metropolis.py:63-67); we additionally clip the resulting sample away
    from exact zeros, which float32 gamma sampling can produce.
    Batched over leading axes of ``alphas``.
    """
    alphas = jnp.clip(alphas, SMALL_EPS, None)
    g = sample_gamma_fixed(key, alphas)
    g = jnp.clip(g, SMALL_EPS, None)
    out = g / jnp.sum(g, axis=-1, keepdims=True)
    # renormalised clip: float32 division can underflow small components to
    # exactly 0, which downstream CRF probabilities cannot tolerate
    out = jnp.clip(out, SMALL_EPS, None)
    return out / jnp.sum(out, axis=-1, keepdims=True)


def dirichlet_logpdf(x, alphas):
    """Log density of Dirichlet(alphas) at x with the reference's clipping
    (distributions.py:97-102)."""
    alphas = jnp.clip(alphas, SMALL_EPS, None)
    x = jnp.clip(x, SMALL_EPS, None)
    return (jnp.sum((alphas - 1.0) * jnp.log(x), axis=-1)
            + gammaln(jnp.sum(alphas, axis=-1))
            - jnp.sum(gammaln(alphas), axis=-1))


# ---------------------------------------------------------------------------
# Truncated normal on (lower, upper)
# ---------------------------------------------------------------------------

def truncated_normal(key, mean, var, lower=0.0, upper=1.0):
    """Sample N(mean, var) truncated to (lower, upper) via inverse CDF.

    (reference distributions.py:72-77 uses scipy.truncnorm)
    """
    std = jnp.sqrt(var)
    a = (lower - mean) / std
    b = (upper - mean) / std
    ua, ub = ndtr(a), ndtr(b)
    u = jax.random.uniform(key, jnp.shape(mean),
                           minval=jnp.finfo(jnp.float32).tiny, maxval=1.0)
    # clip away from 0/1 so ndtri stays finite in float32
    p = jnp.clip(ua + u * (ub - ua), 1e-6, 1.0 - 1e-6)
    draw = mean + std * ndtri(p)
    # float32 inverse-CDF rounding can land the draw exactly on — or one
    # ulp past — a bound (TPU's ndtr/ndtri differ from host rounding), and
    # the p-clip above can push past a bound when the conditional mass
    # window is < 1e-6; the truncated density is zero there, which turned
    # into logp = -inf mid-chain.  Clamp into the open interval.
    margin = 1e-6 * (upper - lower)
    return jnp.clip(draw, lower + margin, upper - margin)


def truncated_normal_logpdf(x, mean, var, lower=0.0, upper=1.0):
    """(reference distributions.py:80-84)"""
    std = jnp.sqrt(var)
    a = (lower - mean) / std
    b = (upper - mean) / std
    z = (x - mean) / std
    log_phi = -0.5 * (z * z) - 0.5 * jnp.log(2.0 * jnp.pi) - jnp.log(std)
    log_mass = jnp.log(jnp.clip(ndtr(b) - ndtr(a), SMALL_EPS, None))
    inside = (x > lower) & (x < upper)
    return jnp.where(inside, log_phi - log_mass, -jnp.inf)


# ---------------------------------------------------------------------------
# Categorical / misc
# ---------------------------------------------------------------------------

def sample_categorical_logits(key, logits, axis=-1):
    """Gumbel-argmax categorical sampler, batched over leading axes."""
    g = jax.random.gumbel(key, logits.shape, dtype=logits.dtype)
    return jnp.argmax(logits + g, axis=axis)


def sample_inv_gamma(key, shape, rate):
    """Sample 1 / Gamma(shape, rate) i.e. InvGamma(shape, scale=rate).

    The reference draws ``1 / rng.gamma(shape=a, scale=1/b)``
    (e.g. hdp_lpcm.py:937).  Batched over leading axes.
    """
    g = sample_gamma_fixed(key, jnp.asarray(shape, jnp.float32))
    return rate / jnp.clip(g, SMALL_EPS, None)


def sample_gamma(key, shape, rate):
    """Gamma(shape, rate) sample (mean shape / rate).

    Fixed-round Marsaglia-Tsang (see :func:`sample_gamma_fixed`):
    ``jax.random.gamma``'s rejection while-loop serialises poorly on TPU
    even at the small per-chain shapes of the concentration updates."""
    return sample_gamma_fixed(key, jnp.asarray(shape, jnp.float32)) / rate


def sample_beta(key, a, b):
    ga = sample_gamma_fixed(key, jnp.asarray(a, jnp.float32))
    gb = sample_gamma_fixed(jax.random.fold_in(key, 1),
                            jnp.asarray(b, jnp.float32))
    return ga / jnp.clip(ga + gb, SMALL_EPS, None)


# ---------------------------------------------------------------------------
# multivariate t (reference distributions.py:42-69)
# ---------------------------------------------------------------------------

def multivariate_t_logpdf(x, df, mu0, S):
    """Log pdf of a multivariate t with scalar (spherical) or full scale.

    S may be a scalar (spherical scale) or a (p, p) matrix.
    """
    x = jnp.atleast_1d(x)
    mu0 = jnp.atleast_1d(mu0)
    p = x.shape[-1]
    S = jnp.asarray(S)
    if S.ndim < 2:
        rss = jnp.sum((x - mu0) ** 2, axis=-1) / S
        log_var = p * 0.5 * jnp.log(S)
    else:
        L = jnp.linalg.cholesky(S)
        sol = jax.scipy.linalg.solve_triangular(L, (x - mu0), lower=True)
        rss = jnp.sum(sol * sol, axis=0)
        log_var = jnp.sum(jnp.log(jnp.diagonal(L)))
    return (gammaln((p + df) / 2.0)
            - gammaln(df / 2.0) - log_var
            - (p / 2.0) * jnp.log(df * jnp.pi)
            - 0.5 * (df + p) * jnp.log1p(rss / df))


def multivariate_t_pdf(x, df, mu0, S):
    return jnp.exp(multivariate_t_logpdf(x, df, mu0, S))


# alias matching the reference spelling (reference distributions.py:42)
multivariate_t_log_pdf = multivariate_t_logpdf


# ---------------------------------------------------------------------------
# spherical normal / categorical (reference distributions.py:13-39)
# ---------------------------------------------------------------------------

def spherical_normal_log_pdf(x, mean, var):
    """Log pdf of a spherical multivariate Gaussian over the trailing axis
    (reference distributions.py:22-28), batched over leading axes."""
    mean = jnp.atleast_1d(jnp.asarray(mean))
    p = mean.shape[-1]
    sum_sq = jnp.sum((x - mean) ** 2, axis=-1)
    return -0.5 * p * jnp.log(2.0 * jnp.pi * var) - 0.5 * sum_sq / var


def spherical_normal_pdf(x, mean, var):
    """(reference distributions.py:31-39)"""
    return jnp.exp(spherical_normal_log_pdf(x, mean, var))


def sample_categorical(key, probas, axis=-1):
    """Categorical(probas) draw along ``axis`` (reference
    distributions.py:13-19 samples one index host-side from a cdf walk;
    here a Gumbel-argmax over log-probabilities, batched and jittable)."""
    logits = jnp.log(jnp.clip(probas, _TINY, None))
    return sample_categorical_logits(key, logits, axis=axis)
