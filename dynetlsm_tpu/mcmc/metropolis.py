"""Vectorised adaptive Metropolis machinery.

The reference keeps one Python ``Metropolis`` object per parameter
(metropolis.py:85-136) with per-object step sizes adapted every
``tune_interval`` iterations.  Here step sizes and acceptance counters are
plain arrays living in the sampler state, adapted with the same piecewise
schedule via ``jnp.select`` — fully vectorised over (time, node, chain).
"""
import jax
import jax.numpy as jnp

from ..math.distributions import sample_dirichlet, dirichlet_logpdf


def tune_step_size_random_walk(step_size, acc_rate):
    """Piecewise step-size adaptation targeting 25-40% acceptance
    (reference metropolis.py:5-20).  Branch order matters and matches the
    reference's if/elif chain."""
    conds = [acc_rate < 0.001, acc_rate < 0.05, acc_rate < 0.25,
             acc_rate > 0.95, acc_rate > 0.75, acc_rate > 0.4]
    factors = [0.1, 0.5, 0.9, 10.0, 2.0, 1.1]
    factor = jnp.select(conds, [jnp.full_like(acc_rate, f) for f in factors],
                        jnp.ones_like(acc_rate))
    return step_size * factor


def tune_step_size_dirichlet(step_size, acc_rate):
    """Inverted schedule — for the Dirichlet proposal larger ``step_size``
    means smaller moves (reference metropolis.py:23-37)."""
    conds = [acc_rate < 0.001, acc_rate < 0.05, acc_rate < 0.25,
             acc_rate > 0.95, acc_rate > 0.75, acc_rate > 0.4]
    factors = [10.0, 2.0, 1.1, 0.1, 0.5, 0.9]
    factor = jnp.select(conds, [jnp.full_like(acc_rate, f) for f in factors],
                        jnp.ones_like(acc_rate))
    return step_size * factor


def maybe_tune(it, tune, tune_interval, step_size, n_accepted, kind='random_walk'):
    """Adapt ``step_size`` from accumulated acceptance counts when the tuning
    window closes; otherwise pass through.

    ``it`` is the (traced) sweep index.  Tuning is active while ``it < tune``
    and fires every ``tune_interval`` sweeps, mirroring the reference's
    ``steps_until_tune`` counter logic (metropolis.py:122-136).

    Returns (new_step_size, new_n_accepted).
    """
    if tune is None or tune == 0:
        return step_size, n_accepted
    tune_fn = (tune_step_size_dirichlet if kind == 'dirichlet'
               else tune_step_size_random_walk)
    do_tune = jnp.logical_and(it < tune, (it + 1) % tune_interval == 0)
    rate = n_accepted / tune_interval
    new_step = jnp.where(do_tune, tune_fn(step_size, rate), step_size)
    new_acc = jnp.where(do_tune, jnp.zeros_like(n_accepted), n_accepted)
    return new_step, new_acc


def random_walk_accept(key, logp_diff):
    """Standard MH accept for symmetric proposals; batched over the shape of
    ``logp_diff``.  Returns boolean accept mask."""
    u = jax.random.uniform(key, jnp.shape(logp_diff))
    return jnp.log(u) < logp_diff


def dirichlet_metropolis_step(key, x0, logp_fn, step_size, logp_cur=None):
    """One MH step with a Dirichlet(step_size * x0) proposal
    (reference metropolis.py:57-82).

    ``logp_fn(x)`` must return the target log density; pass ``logp_cur`` to
    reuse an already-computed value of ``logp_fn(x0)``.  Returns
    (x_new, accepted: float scalar, logp_new).
    """
    k_prop, k_acc = jax.random.split(key)
    x = sample_dirichlet(k_prop, step_size * x0)
    logp_prop = logp_fn(x)
    if logp_cur is None:
        logp_cur = logp_fn(x0)
    ratio = logp_prop - logp_cur
    # proposal asymmetry correction
    ratio += (dirichlet_logpdf(x0, step_size * x)
              - dirichlet_logpdf(x, step_size * x0))
    accept = random_walk_accept(k_acc, ratio)
    x_new = jnp.where(accept, x, x0)
    logp_new = jnp.where(accept, logp_prop, logp_cur)
    return x_new, accept.astype(x0.dtype), logp_new
