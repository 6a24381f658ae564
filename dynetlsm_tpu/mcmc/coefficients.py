"""Metropolis updates for intercepts and social radii.

Mirrors reference sample_coefficients.py:12-121 — random-walk MH for the
intercept(s) with a normal prior, and Dirichlet-proposal MH for the radii
simplex — against the full network log-likelihood with cached distances.
"""
import jax
import jax.numpy as jnp

from ..ops.likelihoods import undirected_loglik_full, directed_loglik_full
from ..ops.case_control import approx_directed_loglik_full
from .metropolis import random_walk_accept, dirichlet_metropolis_step


def _directed_loglik(Y, dist, X, radii, b_in, b_out, cc):
    """Full or case-control directed log-likelihood dispatch
    (reference sample_coefficients.py:21-40)."""
    if cc is not None:
        return approx_directed_loglik_full(
            X, radii, cc['out_edges'], cc['degrees'], cc['ctrl_out'],
            b_in, b_out)
    return directed_loglik_full(Y, dist, radii, b_in, b_out)


def sample_intercept_undirected(key, Y, dist, intercept, step_size,
                                prior_mean, prior_var):
    """(reference sample_coefficients.py:77-86)

    intercept : (1,); returns (new_intercept, accepted: (1,))
    """
    k_eps, k_acc = jax.random.split(key)
    prop = intercept + step_size * jax.random.normal(k_eps, (1,), intercept.dtype)

    def logp(b):
        ll = undirected_loglik_full(Y, dist, b[0])
        return ll - (b[0] - prior_mean) ** 2 / (2.0 * prior_var)

    accept = random_walk_accept(k_acc, logp(prop) - logp(intercept))
    new = jnp.where(accept, prop, intercept)
    return new, jnp.full((1,), accept.astype(intercept.dtype))


def sample_intercepts_directed(key, Y, dist, intercept, radii, step_size,
                               prior_mean, prior_var, X=None, cc=None):
    """Sequential MH for (intercept_in, intercept_out)
    (reference sample_coefficients.py:18-75).

    intercept, step_size, prior_mean : (2,).  Returns (new, accepted (2,)).
    """
    keys = jax.random.split(key, 4)

    def logp(b_in, b_out, prior_idx, b):
        ll = _directed_loglik(Y, dist, X, radii, b_in, b_out, cc)
        return ll - (b - prior_mean[prior_idx]) ** 2 / (2.0 * prior_var)

    # intercept_in
    prop_in = intercept[0] + step_size[0] * jax.random.normal(keys[0])
    ratio = (logp(prop_in, intercept[1], 0, prop_in)
             - logp(intercept[0], intercept[1], 0, intercept[0]))
    acc_in = random_walk_accept(keys[1], ratio)
    b_in = jnp.where(acc_in, prop_in, intercept[0])

    # intercept_out (sees the updated intercept_in)
    prop_out = intercept[1] + step_size[1] * jax.random.normal(keys[2])
    ratio = (logp(b_in, prop_out, 1, prop_out)
             - logp(b_in, intercept[1], 1, intercept[1]))
    acc_out = random_walk_accept(keys[3], ratio)
    b_out = jnp.where(acc_out, prop_out, intercept[1])

    new = jnp.stack([b_in, b_out])
    acc = jnp.stack([acc_in, acc_out]).astype(intercept.dtype)
    return new, acc


def sample_radii(key, Y, dist, intercept, radii, step_size, X=None, cc=None):
    """Dirichlet-proposal MH on the radii simplex; the Dirichlet(1) prior is
    constant so only the likelihood enters (reference
    sample_coefficients.py:91-121)."""
    def logp(r):
        return _directed_loglik(Y, dist, X, r, intercept[0], intercept[1], cc)

    return dirichlet_metropolis_step(key, radii, logp, step_size)
