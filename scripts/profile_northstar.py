"""Per-block sweep profile at the north-star scale (T=10, n=500, K=25).

Times each Gibbs block of the HDP-LPCM sweep in isolation (jitted + vmapped
over chains, steady state) to direct optimization work.  Not part of the
benchmark contract — a developer tool backing PLAN.md's profile table.

Usage: python scripts/profile_northstar.py [n_chains]
"""
import sys
import time

import numpy as np

sys.path.insert(0, '.')
from bench import build_state_and_sweep, northstar_network  # noqa: E402


def _force(out):
    # jax.block_until_ready is unreliable through the axon relay (returns
    # before execution completes); a host fetch of an output element of the
    # last enqueued executable is the only trustworthy barrier.  Slice on
    # device first so only one scalar crosses the tunnel.
    import jax
    import jax.numpy as jnp
    return float(jnp.ravel(jax.tree.leaves(out)[0])[0])


def timeit(fn, *args, n_rounds=8):
    """Two-point difference timing: the scalar host fetch costs a fixed
    ~35 ms through the axon relay, so time r and 4r dispatches and divide
    the difference — the constant cancels."""
    out = fn(*args)
    _force(out)

    def run(r):
        t0 = time.time()
        for _ in range(r):
            out = fn(*args)
        _force(out)
        return time.time() - t0

    r1 = n_rounds
    t1 = min(run(r1), run(r1))
    t4 = min(run(4 * r1), run(4 * r1))
    return max(t4 - t1, 1e-9) / (3 * r1) * 1000.0  # ms


def main():
    import jax
    import jax.numpy as jnp
    from dynetlsm_tpu.mcmc.latent import sample_latent_positions
    from dynetlsm_tpu.mcmc.labels import sample_labels_block
    from dynetlsm_tpu.mcmc.hdp import sample_tables, sample_mbar
    from dynetlsm_tpu.ops.distances import pairwise_distances
    from dynetlsm_tpu.ops.likelihoods import (
        undirected_loglik_full, undirected_loglik_pair)

    n_chains = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    T, n, K = 10, 500, 25
    Y = northstar_network(T=T, n=n)
    state, sweep = build_state_and_sweep(Y, n_chains, K=K,
                                         quality_init=False)
    Yd = jnp.asarray(Y)

    results = {}

    # full sweep (no donation: the same state is reused across blocks)
    step = jax.jit(jax.vmap(sweep))
    results['full sweep'] = timeit(step, state)

    # parallel-tempering step at the same slot count (vmapped sweep +
    # replica exchange; the delta over 'full sweep' is the swap's dense
    # net-loglik pass + gathers, plus the XLA fallback of the X update)
    if n_chains % 8 == 0:
        from dynetlsm_tpu.mcmc.tempering import temper_ladder, make_pt_step
        from dynetlsm_tpu.mcmc.sweeps import SweepConfig
        state_pt = state._replace(
            temper=jnp.asarray(temper_ladder(8, 0.1, n_chains // 8)))
        # net_ll dispatch only needs the undirected/fixed-Y switches; the
        # sweep itself still carries bench's full config
        pt = make_pt_step(sweep, SweepConfig(n_components=K), Yd, 8,
                          swap_every=1)
        results['PT step (8-rung ladders)'] = timeit(
            jax.jit(pt), state_pt)

    # X update (exact scan)
    def x_exact(s):
        return sample_latent_positions(
            s.key, Yd, s.X, s.intercept, s.step_X, mu=s.mu, sigma=s.sigma,
            lmbda=s.lmbda, z=s.z, mixture=True, scheme='exact')
    results['X update (exact)'] = timeit(jax.jit(jax.vmap(x_exact)), state)

    def x_par(s):
        return sample_latent_positions(
            s.key, Yd, s.X, s.intercept, s.step_X, mu=s.mu, sigma=s.sigma,
            lmbda=s.lmbda, z=s.z, mixture=True, scheme='parallel')
    results['X update (parallel)'] = timeit(jax.jit(jax.vmap(x_par)), state)

    # FFBS
    def ffbs(s):
        return sample_labels_block(s.key, s.X, s.mu, s.sigma, s.lmbda,
                                   s.weights)
    results['FFBS labels'] = timeit(jax.jit(jax.vmap(ffbs)), state)

    # CRF tables
    def tables(s):
        n_trans = jnp.zeros((T, K, K)).at[0, 0, 0].set(float(n))
        m = sample_tables(s.key, n_trans, s.beta, s.alpha_init, s.alpha,
                          s.kappa, n_max=n, cap=64)
        return sample_mbar(s.key, m, s.beta, s.kappa, s.alpha, n_max=n,
                           cap=64)
    results['CRF tables+mbar (cap=64)'] = timeit(
        jax.jit(jax.vmap(tables)), state)

    def tables_exact(s):
        n_trans = jnp.zeros((T, K, K)).at[0, 0, 0].set(float(n))
        m = sample_tables(s.key, n_trans, s.beta, s.alpha_init, s.alpha,
                          s.kappa, n_max=n, cap=n)
        return sample_mbar(s.key, m, s.beta, s.kappa, s.alpha, n_max=n,
                           cap=n)
    results['CRF tables+mbar (exact)'] = timeit(
        jax.jit(jax.vmap(tables_exact)), state)

    # remaining Gibbs blocks (weights, conjugates, lambda, logp assembly)
    from dynetlsm_tpu.math.distributions import sample_dirichlet
    from dynetlsm_tpu.mcmc.conjugate import (
        sample_cluster_means, sample_cluster_variances, sample_lambda,
        sample_mean_variance_hyper, sample_sigma_scale_hyper)
    from dynetlsm_tpu.mcmc.labels import sample_labels_block as _slb

    def _resp(s):
        return jax.nn.one_hot(s.z, K, dtype=s.X.dtype)

    def weights_block(s):
        conc = (s.alpha * s.beta[None, None, :]
                + s.kappa * jnp.eye(K)[None]
                + jnp.ones((T - 1, K, K)))
        return sample_dirichlet(s.key, conc)
    results['weights dirichlet (T-1,K,K)'] = timeit(
        jax.jit(jax.vmap(weights_block)), state)

    def conj_block(s):
        resp = _resp(s)
        nk = resp.sum(axis=(0, 1))
        mu = sample_cluster_means(s.key, s.X, resp, nk, s.sigma, s.lmbda,
                                  s.mean_var)
        sigma = sample_cluster_variances(s.key, s.X, resp, nk, mu, s.lmbda,
                                         2.0, s.b_scale)
        lmbda = sample_lambda(s.key, s.X, s.z, mu, sigma, 0.9, 0.01)
        return mu, sigma, lmbda
    results['conjugate mu/sigma/lambda'] = timeit(
        jax.jit(jax.vmap(conj_block)), state)

    from dynetlsm_tpu.mcmc.sweeps import (
        _latent_mixture_loglik, _count_chain_loglik)
    from dynetlsm_tpu.math.distributions import dirichlet_logpdf

    def logp_block(s):
        resp = _resp(s)
        nk = resp.sum(axis=(0, 1))
        ll = _latent_mixture_loglik(s.X, s.z, s.mu, s.sigma, s.lmbda,
                                    resp=resp)
        ll += jnp.sum(dirichlet_logpdf(
            s.weights[1:],
            jnp.broadcast_to(s.alpha * s.beta[None, None, :]
                             + s.kappa * jnp.eye(K)[None],
                             (T - 1, K, K))))
        return ll
    results['logp assembly'] = timeit(jax.jit(jax.vmap(logp_block)), state)

    # distances + loglik passes
    dist_fn = jax.jit(jax.vmap(lambda s: pairwise_distances(s.X)))
    results['pairwise distances'] = timeit(dist_fn, state)
    dist = dist_fn(state)

    ll1 = jax.jit(jax.vmap(
        lambda s, d: undirected_loglik_full(Yd, d, s.intercept[0])))
    results['loglik x1'] = timeit(ll1, state, dist)
    ll2 = jax.jit(jax.vmap(
        lambda s, d: undirected_loglik_pair(Yd, d, s.intercept[0],
                                            s.intercept[0] + 0.1)))
    results['loglik pair'] = timeit(ll2, state, dist)

    print('\n%d chains, T=%d, n=%d, K=%d (ms/sweep, aggregate over chains)'
          % (n_chains, T, n, K))
    for k, v in results.items():
        print('  %-28s %8.2f ms' % (k, v))
    agg = n_chains / (results['full sweep'] / 1000.0)
    print('  -> full-sweep aggregate: %.1f sweeps/s x chains' % agg)


if __name__ == '__main__':
    main()
