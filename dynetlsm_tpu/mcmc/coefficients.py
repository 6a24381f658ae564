"""Metropolis updates for intercepts and social radii.

Mirrors reference sample_coefficients.py:12-121 — random-walk MH for the
intercept(s) with a normal prior, and Dirichlet-proposal MH for the radii
simplex — against the full network log-likelihood with cached distances.

Each sampler also returns the network log-likelihood at the *accepted*
state so the sweep's final log-joint evaluation can reuse it instead of
re-reading the (T, n, n) tensors (the reference recomputes the full
likelihood once per MH candidate plus once for the stored logp,
lsm.py:508-566 — 3-7 dense passes per sweep; here it is 1-3).
"""
import jax
import jax.numpy as jnp

from ..ops.likelihoods import (
    undirected_loglik_pair, directed_loglik_full, directed_loglik_pair)
from ..ops.case_control import (
    approx_directed_loglik_full, approx_undirected_loglik_full)
from .metropolis import random_walk_accept, dirichlet_metropolis_step


def _directed_loglik(Y, dist, X, radii, b_in, b_out, cc):
    """Full or case-control directed log-likelihood dispatch
    (reference sample_coefficients.py:21-40)."""
    if cc is not None:
        return approx_directed_loglik_full(
            X, radii, cc['out_edges'], cc['degrees'], cc['ctrl_out'],
            cc['ctrl_out_valid'], b_in, b_out, shared_ctrl='colors' in cc)
    return directed_loglik_full(Y, dist, radii, b_in, b_out)


def _directed_loglik_pair(Y, dist, X, radii, bs_cur, bs_prop, cc):
    if cc is not None:
        return (_directed_loglik(Y, dist, X, radii, *bs_cur, cc),
                _directed_loglik(Y, dist, X, radii, *bs_prop, cc))
    return directed_loglik_pair(Y, dist, radii, bs_cur, bs_prop)


def sample_intercept_undirected(key, Y, dist, intercept, step_size,
                                prior_mean, prior_var, X=None, cc=None,
                                temper=None):
    """(reference sample_coefficients.py:77-86)

    intercept : (1,); returns (new_intercept, accepted: (1,), loglik_new).
    With ``cc`` the candidates are scored by the undirected case-control
    approximation; otherwise with ``dist=None`` (and ``X`` given) both
    candidates are evaluated by the fused Pallas kernel directly from the
    positions — the (T, n, n) distance tensor is never materialised
    (ops/pallas_loglik.py).
    """
    k_eps, k_acc = jax.random.split(key)
    prop = intercept + step_size * jax.random.normal(k_eps, (1,), intercept.dtype)

    if cc is not None:
        def cc_ll(b):
            return approx_undirected_loglik_full(
                X, cc['out_edges'], cc['degrees'][..., 1], cc['ctrl_out'],
                cc['ctrl_out_valid'], b, shared_ctrl='colors' in cc)
        ll_cur, ll_prop = cc_ll(intercept[0]), cc_ll(prop[0])
    elif dist is None:
        from ..ops.pallas_loglik import undirected_loglik_pair_fused
        ll_cur, ll_prop = undirected_loglik_pair_fused(
            Y, X, intercept[0], prop[0])
    else:
        ll_cur, ll_prop = undirected_loglik_pair(Y, dist, intercept[0],
                                                 prop[0])

    def logprior(b):
        return -(b[0] - prior_mean) ** 2 / (2.0 * prior_var)

    delta_ll = ll_prop - ll_cur
    if temper is not None:
        delta_ll = temper * delta_ll
    accept = random_walk_accept(
        k_acc, delta_ll + logprior(prop) - logprior(intercept))
    new = jnp.where(accept, prop, intercept)
    ll_new = jnp.where(accept, ll_prop, ll_cur)
    return new, jnp.full((1,), accept.astype(intercept.dtype)), ll_new


def sample_intercepts_directed(key, Y, dist, intercept, radii, step_size,
                               prior_mean, prior_var, X=None, cc=None,
                               temper=None):
    """Sequential MH for (intercept_in, intercept_out)
    (reference sample_coefficients.py:18-75).

    intercept, step_size, prior_mean : (2,).
    Returns (new, accepted (2,), loglik_new).

    With ``dist=None`` (and no ``cc``) every candidate is scored by the
    fused directed Pallas evaluator directly from the positions — the
    (T, n, n) distance tensor is never materialised
    (ops/pallas_loglik.py directed_loglik_cands_fused).
    """
    keys = jax.random.split(key, 4)
    fused = cc is None and dist is None
    if fused:
        from ..ops.pallas_loglik import directed_loglik_cands_fused

    def logprior(b, prior_idx):
        return -(b - prior_mean[prior_idx]) ** 2 / (2.0 * prior_var)

    def tempered(delta_ll):
        return delta_ll if temper is None else temper * delta_ll

    # intercept_in: both candidates in one fused pass
    prop_in = intercept[0] + step_size[0] * jax.random.normal(keys[0])
    if fused:
        ll = directed_loglik_cands_fused(
            Y, X, jnp.stack([radii, radii]),
            jnp.stack([jnp.stack([intercept[0], intercept[1]]),
                       jnp.stack([prop_in, intercept[1]])]))
        ll_cur, ll_prop = ll[0], ll[1]
    else:
        ll_cur, ll_prop = _directed_loglik_pair(
            Y, dist, X, radii, (intercept[0], intercept[1]),
            (prop_in, intercept[1]), cc)
    ratio = (tempered(ll_prop - ll_cur)
             + logprior(prop_in, 0) - logprior(intercept[0], 0))
    acc_in = random_walk_accept(keys[1], ratio)
    b_in = jnp.where(acc_in, prop_in, intercept[0])
    ll_in = jnp.where(acc_in, ll_prop, ll_cur)

    # intercept_out (sees the updated intercept_in; its current-state
    # likelihood is the accepted value from the previous step)
    prop_out = intercept[1] + step_size[1] * jax.random.normal(keys[2])
    if fused:
        ll_prop_out = directed_loglik_cands_fused(
            Y, X, radii[None], jnp.stack([b_in, prop_out])[None])[0]
    else:
        ll_prop_out = _directed_loglik(Y, dist, X, radii, b_in, prop_out,
                                       cc)
    ratio = (tempered(ll_prop_out - ll_in)
             + logprior(prop_out, 1) - logprior(intercept[1], 1))
    acc_out = random_walk_accept(keys[3], ratio)
    b_out = jnp.where(acc_out, prop_out, intercept[1])
    ll_new = jnp.where(acc_out, ll_prop_out, ll_in)

    new = jnp.stack([b_in, b_out])
    acc = jnp.stack([acc_in, acc_out]).astype(intercept.dtype)
    return new, acc, ll_new


def sample_radii(key, Y, dist, intercept, radii, step_size, X=None, cc=None,
                 loglik_cur=None, temper=None):
    """Dirichlet-proposal MH on the radii simplex; the Dirichlet(1) prior is
    constant so only the likelihood enters (reference
    sample_coefficients.py:91-121).

    ``loglik_cur`` — the network log-likelihood at the current radii (e.g.
    returned by the intercept sampler) — skips one dense evaluation.
    With ``dist=None`` (no ``cc``) the proposal is scored by the fused
    directed Pallas evaluator (see ``sample_intercepts_directed``).
    Returns (new_radii, accepted, loglik_new).
    """
    if cc is None and dist is None:
        from ..ops.pallas_loglik import directed_loglik_cands_fused

        def logp(r):
            return directed_loglik_cands_fused(
                Y, X, r[None],
                jnp.stack([intercept[0], intercept[1]])[None])[0]
    else:
        def logp(r):
            return _directed_loglik(Y, dist, X, r, intercept[0],
                                    intercept[1], cc)

    return dirichlet_metropolis_step(key, radii, logp, step_size,
                                     logp_cur=loglik_cur, temper=temper)
