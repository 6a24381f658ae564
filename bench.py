"""Headline benchmark: aggregate HDP-LPCM Gibbs-sweep throughput.

Baseline (BASELINE.md): the reference's single-core Cython sampler runs
17.45 sweeps/s on Sampson's monastery (T=3, n=18, K<=10).  This benchmark
runs the same model configuration on real Sampson data with many vmapped
chains on one TPU chip and reports aggregate sweeps/s (sweeps x chains / s)
at steady state, excluding compilation.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import time

import numpy as np

BASELINE_SWEEPS_PER_SEC = 17.45  # notebooks/Sampson's Monastery.ipynb cell 4


def build_state_and_sweep(Y, n_chains, K=10, seed=0):
    import jax
    import jax.numpy as jnp
    from dynetlsm_tpu.config import DTYPE
    from dynetlsm_tpu.math.init import longitudinal_kmeans, generalized_mds
    from dynetlsm_tpu.mcmc.states import MixtureState
    from dynetlsm_tpu.mcmc.sweeps import SweepConfig, make_hdp_sweep
    from dynetlsm_tpu.mcmc.driver import replicate_state

    rng = np.random.RandomState(seed)
    T, n, _ = Y.shape
    d = 2

    X0 = generalized_mds(Y, n_features=d, random_state=rng)
    X0 -= X0.mean(axis=(0, 1))
    mu0, sigma0, z0 = longitudinal_kmeans(X0, n_clusters=K, random_state=rng)
    weights0 = np.zeros((T, K, K))
    weights0[0, 0] = np.bincount(z0[0], minlength=K) / n
    beta0 = rng.dirichlet(np.full(K, 1.0 / K))
    for t in range(1, T):
        for k in range(K):
            weights0[t, k] = rng.dirichlet(beta0 + 4.0 * np.eye(K)[k])

    cfg = SweepConfig(tune=0, tune_interval=100, n_burn=0, n_components=K,
                      a0=36.0, b0=40.0, c0=5.0, d0=2.0)
    Yd = jnp.asarray(Y, DTYPE)
    sweep = make_hdp_sweep(Yd, None, np.zeros(1, np.float32), cfg)

    s0 = MixtureState(
        key=jax.random.PRNGKey(seed), it=jnp.zeros((), jnp.int32),
        X=jnp.asarray(X0, DTYPE), intercept=jnp.ones(1, DTYPE),
        radii=None, Y=None, z=jnp.asarray(z0, jnp.int32),
        mu=jnp.asarray(mu0, DTYPE), sigma=jnp.asarray(sigma0, DTYPE),
        lmbda=jnp.asarray(0.9, DTYPE), weights=jnp.asarray(weights0, DTYPE),
        beta=jnp.asarray(beta0, DTYPE), gamma=jnp.asarray(1.0, DTYPE),
        alpha_init=jnp.asarray(1.0, DTYPE), alpha=jnp.asarray(1.0, DTYPE),
        kappa=jnp.asarray(4.0, DTYPE), init_weights=None, trans_weights=None,
        mean_var=jnp.asarray(1.0, DTYPE), b_scale=jnp.asarray(2.4, DTYPE),
        step_X=jnp.full((T, n), 0.1, DTYPE), acc_X=jnp.zeros((T, n), DTYPE),
        step_int=jnp.full((1,), 0.1, DTYPE), acc_int=jnp.zeros((1,), DTYPE),
        step_radii=None, acc_radii=None, logp=jnp.zeros((), DTYPE),
        missing_sum=None)
    state = replicate_state(s0, n_chains, jax.random.PRNGKey(seed + 1))
    return state, sweep


def main():
    import jax
    from dynetlsm_tpu.datasets import load_monks
    from dynetlsm_tpu.mcmc.driver import make_scan_runner

    mode = os.environ.get('BENCH_MODE', 'sweeps')
    n_chains = int(os.environ.get('BENCH_CHAINS',
                                  '64' if mode == 'ess' else '512'))
    chunk = int(os.environ.get('BENCH_CHUNK', '200'))

    Y, _, _ = load_monks(is_directed=False)
    state, sweep = build_state_and_sweep(Y, n_chains)
    runner = make_scan_runner(sweep, lambda s: {'logp': s.logp}, chunk=chunk)

    # warm up (compile) + one timed-out-of-band chunk
    state, ys = runner(state, chunk)
    jax.block_until_ready(ys)

    if mode == 'ess':
        # effective samples of the log joint per wall-clock second, summed
        # over chains (the "ESS/sec" half of the BASELINE.json north-star);
        # the reference's 17.45 sweeps/s upper-bounds its ESS/s at 17.45.
        from dynetlsm_tpu.diagnostics import effective_n
        n_samples = int(os.environ.get('BENCH_ESS_SAMPLES', '2000'))
        t0 = time.time()
        logps = []
        remaining = n_samples
        while remaining > 0:
            step_n = min(chunk, remaining)
            state, ys = runner(state, step_n)
            logps.append(np.asarray(ys['logp'])[:step_n])
            remaining -= step_n
        elapsed = time.time() - t0
        logps = np.concatenate(logps, axis=0)        # (samples, chains)
        ess = sum(effective_n(logps[:, c]) for c in range(n_chains))
        print(json.dumps({
            'metric': 'hdp_lpcm_logp_ess_per_sec_sampson',
            'value': round(ess / elapsed, 2),
            'unit': 'ESS(logp)/s summed over %d chains (T=3, n=18, K=10, '
                    '1 chip)' % n_chains,
            'vs_baseline': round(ess / elapsed / BASELINE_SWEEPS_PER_SEC, 2),
        }))
        return

    n_rounds = 3
    t0 = time.time()
    for _ in range(n_rounds):
        state, ys = runner(state, chunk)
    jax.block_until_ready(ys)
    elapsed = time.time() - t0

    total_sweeps = n_rounds * chunk * n_chains
    value = total_sweeps / elapsed
    print(json.dumps({
        'metric': 'hdp_lpcm_aggregate_sweeps_per_sec_sampson',
        'value': round(value, 2),
        'unit': 'sweeps/s x chains (T=3, n=18, K=10, %d chains, 1 chip)'
                % n_chains,
        'vs_baseline': round(value / BASELINE_SWEEPS_PER_SEC, 2),
    }))


if __name__ == '__main__':
    main()
