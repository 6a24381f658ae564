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


def tune_step_size_mala(step_size, acc_rate):
    """Step-size adaptation for the joint MALA move, targeting the ~0.45-0.70
    acceptance band around the 0.574 Langevin optimum (Roberts & Rosenthal
    1998) — same piecewise style as the random-walk schedule."""
    conds = [acc_rate < 0.001, acc_rate < 0.20, acc_rate < 0.45,
             acc_rate > 0.95, acc_rate > 0.70]
    factors = [0.1, 0.5, 0.9, 2.0, 1.1]
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
    tune_fn = {'dirichlet': tune_step_size_dirichlet,
               'mala': tune_step_size_mala}.get(
                   kind, tune_step_size_random_walk)
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


def dirichlet_metropolis_step(key, x0, logp_fn, step_size, logp_cur=None,
                              temper=None):
    """One MH step with a Dirichlet(step_size * x0) proposal
    (reference metropolis.py:57-82).

    ``logp_fn(x)`` must return the target log density; pass ``logp_cur`` to
    reuse an already-computed value of ``logp_fn(x0)``.  ``temper`` scales
    the target-density difference in the acceptance ratio (parallel
    tempering) while the returned log densities stay untempered.  Returns
    (x_new, accepted: float scalar, logp_new).
    """
    k_prop, k_acc = jax.random.split(key)
    x = sample_dirichlet(k_prop, step_size * x0)
    logp_prop = logp_fn(x)
    if logp_cur is None:
        logp_cur = logp_fn(x0)
    ratio = logp_prop - logp_cur
    if temper is not None:
        ratio = temper * ratio
    # proposal asymmetry correction
    ratio += (dirichlet_logpdf(x0, step_size * x)
              - dirichlet_logpdf(x, step_size * x0))
    accept = random_walk_accept(k_acc, ratio)
    x_new = jnp.where(accept, x, x0)
    logp_new = jnp.where(accept, logp_prop, logp_cur)
    return x_new, accept.astype(x0.dtype), logp_new


def random_walk_metropolis(key, x0, logp_fn, step_size):
    """One symmetric Gaussian random-walk MH step (reference
    metropolis.py:40-55), jittable.

    Returns (x_new, accepted: float scalar, accept_ratio).
    """
    k_prop, k_acc = jax.random.split(key)
    x = x0 + step_size * jax.random.normal(k_prop, jnp.shape(x0),
                                           jnp.result_type(x0))
    ratio = logp_fn(x) - logp_fn(x0)
    accept = random_walk_accept(k_acc, ratio)
    x_new = jnp.where(accept, x, x0)
    return x_new, accept.astype(jnp.result_type(x0)), ratio


def dirichlet_metropolis(key, x0, logp_fn, step_size):
    """One scaled-Dirichlet MH step with proposal-asymmetry correction
    (reference metropolis.py:57-82), jittable.

    Returns (x_new, accepted: float scalar, accept_ratio) — the reference's
    return convention; :func:`dirichlet_metropolis_step` additionally
    threads the cached log density for in-sweep reuse.
    """
    k_prop, k_acc = jax.random.split(key)
    x = sample_dirichlet(k_prop, step_size * x0)
    ratio = logp_fn(x) - logp_fn(x0)
    ratio += (dirichlet_logpdf(x0, step_size * x)
              - dirichlet_logpdf(x, step_size * x0))
    accept = random_walk_accept(k_acc, ratio)
    x_new = jnp.where(accept, x, x0)
    return x_new, accept.astype(jnp.result_type(x0)), ratio


class Metropolis:
    """Self-tuning MH driver for a user-supplied log density
    (reference metropolis.py:85-136).

    The in-sweep samplers adapt step sizes as state arrays; this class is
    the standalone host-side equivalent for ad-hoc targets: it carries the
    PRNG key, acceptance counters, and the same piecewise tuning schedule.
    """

    def __init__(self, step_size=0.1, tune=500, tune_interval=100,
                 proposal_type='random_walk', seed=0):
        if proposal_type not in ('random_walk', 'dirichlet'):
            raise ValueError("`proposal_type` must be in "
                             "{'random_walk', 'dirichlet'}, but got "
                             "%r" % (proposal_type,))
        self.step_size = step_size
        self.tune = tune
        self.tune_interval = tune_interval
        self.proposal_type = proposal_type
        self.n_accepted = 0
        self.n_steps = 0
        self.key = jax.random.PRNGKey(seed)

    def step(self, x, logp):
        self.key, sub = jax.random.split(self.key)
        fn = (dirichlet_metropolis if self.proposal_type == 'dirichlet'
              else random_walk_metropolis)
        x_new, accepted, _ = fn(sub, jnp.asarray(x), logp, self.step_size)
        self.n_accepted += float(accepted)
        self.n_steps += 1
        if self.tune:
            self.tune_step_size()
        return x_new

    def tune_step_size(self):
        if (self.n_steps < self.tune
                and self.n_steps % self.tune_interval == 0):
            rate = self.n_accepted / self.tune_interval
            tune_fn = (tune_step_size_dirichlet
                       if self.proposal_type == 'dirichlet'
                       else tune_step_size_random_walk)
            self.step_size = float(tune_fn(jnp.asarray(self.step_size),
                                           jnp.asarray(rate)))
            self.n_accepted = 0
