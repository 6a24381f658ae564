"""Parallel tempering (replica exchange) across the vmapped chain axis.

Beyond-reference capability.  The Geweke joint-distribution work
(tests/test_geweke_joint.py) demonstrated that the directed model's
(intercepts, Y) pair can turn metastable: when latent distances dwarf the
O(1/n) social radii, the geometry factors (1 - d/r) are large and the
joint is near-bimodal between empty-graph/large-intercept and
dense-graph/small-intercept states, with single-site Gibbs
autocorrelation times in the tens of thousands of sweeps.  Replica
exchange is the classical remedy — and on this architecture it is almost
free: the temperature ladder rides the existing vmapped/sharded chain
axis, a swap is an elementwise gather over that axis, and the only extra
per-swap work is one dense network-log-likelihood pass.

Design:

* Each chain slot carries a fixed inverse temperature ``state.temper``
  (beta).  The sweeps temper ONLY the network likelihood: MH acceptance
  ratios scale their log-likelihood difference by beta
  (mcmc/latent.py, mcmc/coefficients.py), and missing-dyad resampling
  draws Bernoulli(expit(beta * eta)) — the exact conditional of
  p(Y | theta)^beta (mcmc/sweeps.py:_resample_missing).  All prior-side
  blocks (FFBS labels, conjugate mu/sigma/lambda, CRF/HDP auxiliaries)
  are untouched: they do not see Y.  ``temper=None`` (the default)
  compiles the identical untempered sweep.
* After every ``swap_every`` sweeps, adjacent-temperature slots propose
  to exchange configurations (even pairs and odd pairs on alternating
  rounds).  The acceptance ratio for targets prior x likelihood^beta is
  exp((beta_i - beta_j) (ll_j - ll_i)) with ll the UNTEMPERED network
  log-likelihood.  Bookkeeping (PRNG keys, step sizes, acceptance
  counters, MAP/procrustes references, the ladder itself) stays with the
  slot; only the model configuration swaps.
* Posterior samples are read from the cold (beta = 1) slots.  Multiple
  independent ladders stack along the same chain axis.
"""
import numpy as np

import jax
import jax.numpy as jnp

from ..ops.distances import pairwise_distances
from .driver import replicate_state
from .sweeps import _network_loglik

# state fields exchanged by a replica swap: the model configuration.
# Everything else (keys, counters, step sizes, MAP/procrustes tracking,
# the temperature itself) is slot bookkeeping and stays put.
_SWAP_FIELDS = frozenset({
    'X', 'intercept', 'radii', 'Y', 'logp',
    'z', 'mu', 'sigma', 'lmbda', 'weights', 'beta', 'gamma', 'alpha_init',
    'alpha', 'kappa', 'init_weights', 'trans_weights', 'mean_var', 'b_scale',
})


def temper_ladder(n_temps, beta_min=0.1, n_ladders=1, dtype=jnp.float32):
    """Geometric inverse-temperature ladder(s), cold chain first.

    Returns a (n_ladders * n_temps,) array: each block of ``n_temps``
    slots runs [1, ..., beta_min] geometrically spaced.  Geometric
    spacing equalises the expected swap acceptance between neighbours
    when the log-likelihood scale is roughly temperature-independent.
    """
    if n_temps < 2:
        raise ValueError('a temperature ladder needs n_temps >= 2')
    one = np.geomspace(1.0, beta_min, n_temps)
    return jnp.asarray(np.tile(one, n_ladders), dtype)


def replicate_tempered(state0, betas, key):
    """Broadcast a single-chain state across the ladder slots and attach
    the inverse temperatures (cf. driver.replicate_state).  Also zeroes
    the per-pair swap-acceptance accumulator so ladder adaptation works
    out of the box when the PT step is built with ``adapt_until > 0``."""
    betas = jnp.asarray(betas)
    state = replicate_state(state0, betas.shape[0], key)
    return state._replace(temper=betas,
                          acc_swap=jnp.zeros(betas.shape[0], betas.dtype))


def _swap_partners(n_chains, n_temps):
    """Adjacent-pair partner indices for the two alternating phases,
    confined to each ladder's block of ``n_temps`` slots."""
    if n_chains % n_temps:
        raise ValueError('n_chains=%d is not a whole number of %d-slot '
                         'ladders' % (n_chains, n_temps))
    idx = np.arange(n_chains)
    j = idx % n_temps
    partners = []
    for phase in (0, 1):
        p = idx.copy()
        lo = (j % 2 == phase) & (j + 1 < n_temps)
        p[lo] = idx[lo] + 1
        hi = (j % 2 != phase) & (j > 0)
        # j-1 is a phase-parity pair head iff (j-1) % 2 == phase
        hi &= ((j - 1) % 2 == phase)
        p[hi] = idx[hi] - 1
        partners.append(jnp.asarray(p, jnp.int32))
    return partners


def _adapt_ladder(temper, acc_swap, n_temps, n_attempts, eta=0.6):
    """One ladder-adaptation step: redistribute the inter-rung log-beta
    spacings toward equal per-pair swap acceptance (Vousden, Farr &
    Mandel 2016 style), keeping each ladder's endpoints (1, beta_min)
    fixed.  ``acc_swap[i]`` holds accepted swaps of the pair (i, i+1)
    since the last adaptation; each pair is attempted ``n_attempts``
    times per window.
    """
    C = temper.shape[0]
    L = C // n_temps
    tb = temper.reshape(L, n_temps)
    rate = (acc_swap.reshape(L, n_temps)[:, :n_temps - 1]
            / jnp.maximum(n_attempts, 1.0))               # (L, P)
    logb = jnp.log(jnp.clip(tb, 1e-30, None))
    s = logb[:, :-1] - logb[:, 1:]                        # spacings >= 0
    s_new = s * jnp.exp(eta * (rate - jnp.mean(rate, axis=1, keepdims=True)))
    # keep the total span (and so beta_min) fixed
    s_new = s_new * (jnp.sum(s, axis=1, keepdims=True)
                     / jnp.clip(jnp.sum(s_new, axis=1, keepdims=True),
                                1e-30, None))
    logb_new = jnp.concatenate(
        [jnp.zeros((L, 1), temper.dtype),
         -jnp.cumsum(s_new, axis=1)], axis=1)
    return jnp.exp(logb_new).reshape(C)


def make_pt_step(sweep_fn, cfg, Y_fixed, n_temps, swap_every=1,
                 adapt_until=0, adapt_interval=100):
    """Wrap a single-chain sweep into a chain-batched parallel-tempering
    step ``pt_step(state, it_hint) -> state``.

    The returned function runs the vmapped sweep, then (every
    ``swap_every`` sweeps) one round of adjacent replica exchange.  Use
    with driver.make_scan_runner(multi_chain=False) — the chain axis is
    handled here.

    With ``adapt_until > 0`` and ``state.acc_swap`` present, the ladder
    spacings adapt every ``adapt_interval`` sweeps while
    ``it < adapt_until`` (the estimators pass their tune window),
    equalising per-pair swap acceptance with the ladder endpoints fixed.
    The ladder freezes afterwards, so post-tune samples come from a
    time-homogeneous kernel — exactly the contract of the existing MH
    step-size adaptation.
    """
    if cfg.n_control is not None:
        raise ValueError('parallel tempering with the case-control '
                         'likelihood is not supported (the tempered '
                         'estimator would need its own control sets)')
    step = jax.vmap(sweep_fn, in_axes=(0, None))
    Yd = Y_fixed

    def net_ll(state):
        Y = state.Y if cfg.sample_missing else Yd
        dist = pairwise_distances(state.X)
        return _network_loglik(cfg, Y, dist, state.intercept, state.radii)

    def swap(state, it0):
        C = state.temper.shape[0]
        partner0, partner1 = _swap_partners(C, n_temps)
        idx = jnp.arange(C, dtype=jnp.int32)
        phase = (it0 // swap_every) % 2
        partner = jnp.where(phase == 0, partner0, partner1)

        ll = jax.vmap(net_ll)(state)                      # (C,) untempered
        delta = (state.temper - state.temper[partner]) * (ll[partner] - ll)
        # one shared uniform per unordered pair so both endpoints agree
        key = jax.random.fold_in(state.key[0], 0x7e3a)
        u = jax.random.uniform(key, (C,))
        log_u = jnp.log(u[jnp.minimum(idx, partner)])
        accept = jnp.logical_and(partner != idx, log_u < delta)
        perm = jnp.where(accept, partner, idx)

        state = type(state)(*[
            (leaf if (leaf is None or name not in _SWAP_FIELDS)
             else jax.tree.map(lambda x: x[perm], leaf))
            for name, leaf in zip(state._fields, state)])
        if state.acc_swap is not None:
            head = jnp.logical_and(accept, partner == idx + 1)
            state = state._replace(
                acc_swap=state.acc_swap + head.astype(state.acc_swap.dtype))
        return state

    def adapt(state, it0):
        # each pair is a phase head once per 2 swap rounds
        n_attempts = adapt_interval / (2.0 * swap_every)
        temper = _adapt_ladder(state.temper, state.acc_swap, n_temps,
                               n_attempts)
        return state._replace(temper=temper,
                              acc_swap=jnp.zeros_like(state.acc_swap))

    def pt_step(state, it_hint=None):
        it0 = (jnp.reshape(state.it, (-1,))[0] if it_hint is None
               else jnp.reshape(jnp.asarray(it_hint), (-1,))[0])
        state = step(state, it0)
        do = ((it0 + 1) % swap_every) == 0
        state = jax.lax.cond(do, lambda s: swap(s, it0), lambda s: s, state)
        if adapt_until > 0 and state.acc_swap is not None:
            do_adapt = jnp.logical_and(it0 < adapt_until,
                                       ((it0 + 1) % adapt_interval) == 0)
            state = jax.lax.cond(do_adapt, lambda s: adapt(s, it0),
                                 lambda s: s, state)
        return state

    return pt_step
