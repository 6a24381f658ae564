"""Headline benchmarks: HDP-LPCM Gibbs-sweep throughput on one TPU chip.

Baseline (BASELINE.md): the reference's single-core Cython sampler runs
17.45 sweeps/s on Sampson's monastery (T=3, n=18, K<=10).  Two workloads:

* ``sampson``   — the reference's own headline config (T=3, n=18, K=10) on
  real Sampson data with many vmapped chains; aggregate sweeps/s.
* ``northstar`` — the BASELINE.json target scale (T=10, n=500, K=25) with
  chains sized to the chip; aggregate sweeps/s.
* ``ess``       — ESS(logp)/s on Sampson: effective posterior samples per
  wall-clock second summed over chains (mixing-aware throughput; the
  reference's 17.45 sweeps/s upper-bounds its ESS/s at 17.45).

``BENCH_MODE`` selects one mode or ``all`` (default).  Every measurement is
printed as its own JSON line as it completes; the FINAL line is the
headline (Sampson aggregate, the reference's own benchmark config) with the
north-star, north-star ESS, directed, and Sampson ESS results under
``"extra"``.
"""
import json
import os
import time

import numpy as np

BASELINE_SWEEPS_PER_SEC = 17.45  # notebooks/Sampson's Monastery.ipynb cell 4

# Measured same-workload north-star baselines (T=10, n=500, K=25): the
# reference sampler timed at this exact scale via
# `python scripts/reference_shim.py northstar 20 [directed]` with its hot
# Cython kernels replaced by native C equivalents (scripts/ref_kernels.c,
# parity <= 1e-12), single core; median over 19 main-loop sweeps.  See
# BASELINE.md.  The reference's ESS(logp)/s is upper-bounded by its sweep
# rate, so the same denominators are (generously) used for the ESS rows.
BASELINE_NS_SWEEPS_PER_SEC = 1.148           # undirected, measured r4
BASELINE_NS_DIRECTED_SWEEPS_PER_SEC = 0.6745  # directed, measured r4


def build_state_and_sweep(Y, n_chains, K=10, seed=0, quality_init=True,
                          table_cap=64, is_directed=False, n_control=None):
    import jax
    import jax.numpy as jnp
    from dynetlsm_tpu.config import DTYPE
    from dynetlsm_tpu.mcmc.states import MixtureState
    from dynetlsm_tpu.mcmc.sweeps import SweepConfig, make_hdp_sweep
    from dynetlsm_tpu.mcmc.driver import replicate_state

    rng = np.random.RandomState(seed)
    T, n, _ = Y.shape
    d = 2

    if quality_init:
        from dynetlsm_tpu.math.init import (
            longitudinal_kmeans, generalized_mds)
        X0 = generalized_mds(Y, n_features=d, is_directed=is_directed,
                             random_state=rng)
        X0 -= X0.mean(axis=(0, 1))
        mu0, sigma0, z0 = longitudinal_kmeans(X0, n_clusters=K,
                                              random_state=rng)
    else:
        X0 = rng.randn(T, n, d)
        mu0 = rng.randn(K, d)
        sigma0 = np.ones(K)
        z0 = rng.randint(0, K, size=(T, n))
    weights0 = np.zeros((T, K, K))
    weights0[0, 0] = np.bincount(z0[0], minlength=K) / n
    beta0 = rng.dirichlet(np.full(K, 1.0 / K))
    for t in range(1, T):
        for k in range(K):
            weights0[t, k] = rng.dirichlet(beta0 + 4.0 * np.eye(K)[k])

    cfg = SweepConfig(is_directed=is_directed, tune=0, tune_interval=100,
                      n_burn=0, n_components=K,
                      a0=36.0, b0=40.0, c0=5.0, d0=2.0, table_cap=table_cap,
                      tune_radii=is_directed, n_control=n_control,
                      # BENCH_LATENT=mala|parallel compares the alternative
                      # X-update kernels at identical configs
                      latent_update=os.environ.get('BENCH_LATENT', 'exact'))
    Yd = jnp.asarray(Y, DTYPE)
    n_int = 2 if is_directed else 1
    if n_control is not None:
        from dynetlsm_tpu.ops.case_control import (
            build_edge_lists, sample_control_nodes)
        lists = build_edge_lists(Y)
        cc_static = {k: jnp.asarray(v) for k, v in lists.items()}
        ctrl_in, ctrl_out = sample_control_nodes(
            jax.random.PRNGKey(seed + 7), Yd, n_control,
            directed=is_directed)
    else:
        cc_static = None
        ctrl_in = ctrl_out = None
    sweep = make_hdp_sweep(Yd, None, np.zeros(n_int, np.float32), cfg,
                           cc_static=cc_static)

    if is_directed:
        from dynetlsm_tpu.math.init import initialize_radii
        radii0 = jnp.asarray(initialize_radii(Y), DTYPE)
    s0 = MixtureState(
        key=jax.random.PRNGKey(seed), it=jnp.zeros((), jnp.int32),
        X=jnp.asarray(X0, DTYPE), intercept=jnp.ones(n_int, DTYPE),
        radii=radii0 if is_directed else None,
        Y=None, z=jnp.asarray(z0, jnp.int32),
        mu=jnp.asarray(mu0, DTYPE), sigma=jnp.asarray(sigma0, DTYPE),
        lmbda=jnp.asarray(0.9, DTYPE), weights=jnp.asarray(weights0, DTYPE),
        beta=jnp.asarray(beta0, DTYPE), gamma=jnp.asarray(1.0, DTYPE),
        alpha_init=jnp.asarray(1.0, DTYPE), alpha=jnp.asarray(1.0, DTYPE),
        kappa=jnp.asarray(4.0, DTYPE), init_weights=None, trans_weights=None,
        mean_var=jnp.asarray(1.0, DTYPE), b_scale=jnp.asarray(2.4, DTYPE),
        step_X=jnp.full((T, n), 0.1, DTYPE), acc_X=jnp.zeros((T, n), DTYPE),
        step_int=jnp.full((n_int,), 0.1, DTYPE),
        acc_int=jnp.zeros((n_int,), DTYPE),
        step_radii=jnp.asarray(175000.0, DTYPE) if is_directed else None,
        acc_radii=jnp.zeros((), DTYPE) if is_directed else None,
        logp=jnp.zeros((), DTYPE),
        missing_sum=None, ctrl_in=ctrl_in, ctrl_out=ctrl_out)
    state = replicate_state(s0, n_chains, jax.random.PRNGKey(seed + 1))
    return state, sweep


def northstar_network(T=10, n=500, n_groups=8, seed=3, directed=False):
    """Synthetic community network at the BASELINE.json target scale."""
    rng = np.random.RandomState(seed)
    z = rng.randint(0, n_groups, size=n)
    p_in, p_out = 0.1, 0.01
    same = (z[:, None] == z[None, :])
    P = np.where(same, p_in, p_out)
    Y = np.zeros((T, n, n), np.float32)
    for t in range(T):
        draw = (rng.uniform(size=(n, n)) < P).astype(np.float32)
        if directed:
            np.fill_diagonal(draw, 0.0)
            Y[t] = draw
        else:
            upper = np.triu(draw, 1)
            Y[t] = upper + upper.T
    return Y


def measure_sweeps(state, sweep, n_chains, chunk, n_rounds=3):
    from dynetlsm_tpu.mcmc.driver import make_scan_runner
    runner = make_scan_runner(sweep, lambda s: {'logp': s.logp}, chunk=chunk)
    state, ys0 = runner(state, chunk)          # compile + warm
    np.asarray(ys0['logp'])                    # host fetch: real barrier
    t0 = time.time()
    traces = []
    for _ in range(n_rounds):
        state, ys = runner(state, chunk)
        traces.append(ys['logp'])              # device refs: no sync
    np.asarray(traces[-1])                     # barrier on the last round
    elapsed = time.time() - t0
    # a sweep rate over a diverged posterior is not a result (a collapsed
    # sigma once drove the log joint to -inf while throughput looked fine);
    # every measured round AND the warm-up chunk must be finite — checking
    # only the final chunk would miss a transient divergence that recovered
    for tr in [ys0['logp']] + traces:
        assert np.isfinite(np.asarray(tr)).all(), \
            'non-finite logp in benchmark trace'
    return n_rounds * chunk * n_chains / elapsed


def measure_ess(state, sweep, n_chains, chunk, n_samples):
    """ESS(logp)/s summed over chains, with Geyer initial-positive-sequence
    truncation per chain (keeps each chain's estimate in (0, n] — the plain
    sum-all-lags estimator can go negative on noisy autocorrelation tails)."""
    import jax
    from dynetlsm_tpu.mcmc.driver import make_scan_runner
    from dynetlsm_tpu.diagnostics import effective_n_geyer
    runner = make_scan_runner(sweep, lambda s: {'logp': s.logp}, chunk=chunk)
    state, ys = runner(state, chunk)           # compile + reach steady state
    jax.block_until_ready(ys)
    t0 = time.time()
    logps = []
    remaining = n_samples
    while remaining > 0:
        step_n = min(chunk, remaining)
        state, ys = runner(state, step_n)
        logps.append(np.asarray(ys['logp'])[:step_n])
        remaining -= step_n
    elapsed = time.time() - t0
    logps = np.concatenate(logps, axis=0)      # (samples, chains)
    assert np.isfinite(logps).all(), 'non-finite logp in benchmark trace'
    ess = sum(effective_n_geyer(logps[:, c]) for c in range(n_chains))
    return ess / elapsed


def emit(record):
    print(json.dumps(record), flush=True)
    return record


def run_sampson(chunk):
    from dynetlsm_tpu.datasets import load_monks
    n_chains = int(os.environ.get('BENCH_CHAINS', '512'))
    Y, _, _ = load_monks(is_directed=False)
    state, sweep = build_state_and_sweep(Y, n_chains)
    value = measure_sweeps(state, sweep, n_chains, chunk)
    return emit({
        'metric': 'hdp_lpcm_aggregate_sweeps_per_sec_sampson',
        'value': round(value, 2),
        'unit': 'sweeps/s x chains (T=3, n=18, K=10, %d chains, 1 chip)'
                % n_chains,
        'vs_baseline': round(value / BASELINE_SWEEPS_PER_SEC, 2)})


def run_northstar(chunk):
    n_chains = int(os.environ.get('BENCH_NS_CHAINS', '32'))
    Y = northstar_network()
    state, sweep = build_state_and_sweep(Y, n_chains, K=25,
                                         quality_init=False)
    value = measure_sweeps(state, sweep, n_chains, chunk, n_rounds=2)
    return emit({
        'metric': 'hdp_lpcm_aggregate_sweeps_per_sec_northstar',
        'value': round(value, 2),
        'unit': 'sweeps/s x chains (T=10, n=500, K=25, %d chains, 1 chip)'
                % n_chains,
        'vs_baseline': round(value / BASELINE_NS_SWEEPS_PER_SEC, 2)})


def run_ess(chunk):
    from dynetlsm_tpu.datasets import load_monks
    n_chains = int(os.environ.get('BENCH_ESS_CHAINS', '64'))
    n_samples = int(os.environ.get('BENCH_ESS_SAMPLES', '2000'))
    Y, _, _ = load_monks(is_directed=False)
    state, sweep = build_state_and_sweep(Y, n_chains)
    value = measure_ess(state, sweep, n_chains, chunk, n_samples)
    return emit({
        'metric': 'hdp_lpcm_logp_ess_per_sec_sampson',
        'value': round(value, 2),
        'unit': 'ESS(logp)/s summed over %d chains (T=3, n=18, K=10, 1 chip)'
                % n_chains,
        'vs_baseline': round(value / BASELINE_SWEEPS_PER_SEC, 2)})


def run_ess_northstar(chunk):
    """Mixing-aware throughput at the north-star scale: multichain
    ESS(logp)/s at T=10, n=500, K=25 (VERDICT round-2 item 3 — the
    aggregate-sweeps number alone conflates chain count with mixing)."""
    n_chains = int(os.environ.get('BENCH_NS_CHAINS', '32'))
    n_samples = int(os.environ.get('BENCH_NS_ESS_SAMPLES', '400'))
    Y = northstar_network()
    state, sweep = build_state_and_sweep(Y, n_chains, K=25,
                                         quality_init=False)
    value = measure_ess(state, sweep, n_chains, chunk, n_samples)
    return emit({
        'metric': 'hdp_lpcm_logp_ess_per_sec_northstar',
        'value': round(value, 2),
        'unit': 'ESS(logp)/s summed over %d chains (T=10, n=500, K=25, '
                '1 chip)' % n_chains,
        'vs_baseline': round(value / BASELINE_NS_SWEEPS_PER_SEC, 2)})


def run_directed(chunk):
    """Directed social-radii HDP-LPCM throughput at the north-star scale —
    recorded evidence for the directed Pallas node-scan path
    (VERDICT round-2 item 3)."""
    n_chains = int(os.environ.get('BENCH_DIR_CHAINS', '32'))
    Y = northstar_network(directed=True)
    state, sweep = build_state_and_sweep(Y, n_chains, K=25,
                                         quality_init=False,
                                         is_directed=True)
    value = measure_sweeps(state, sweep, n_chains, chunk, n_rounds=2)
    return emit({
        'metric': 'hdp_lpcm_directed_aggregate_sweeps_per_sec_northstar',
        'value': round(value, 2),
        'unit': 'sweeps/s x chains (directed, T=10, n=500, K=25, %d chains, '
                '1 chip)' % n_chains,
        'vs_baseline': round(value / BASELINE_NS_DIRECTED_SWEEPS_PER_SEC,
                             2)})


def run_case_control(chunk):
    """Case-control (O(n*m)) HDP-LPCM throughput: the reference's large-n
    estimator (case_control_likelihood.py:36-112,
    directed_likelihoods_fast.pyx:208-270) as gathered-index kernels.
    Rows: directed + undirected at the north-star n=500, and one directed
    shape (n=5000) the dense path cannot serve."""
    m = int(os.environ.get('BENCH_CC_CONTROL', '145'))   # ~n^0.8 at n=500
    out = []
    # the large-n row is capped at n=2048: the dense adjacency is a
    # closed-over constant of the jitted sweep, and the axon remote-compile
    # tunnel rejects request bodies past ~100 MB (HTTP 413) — n=5000's
    # 250 MB int8 Y killed the whole bench run.  n=2048 still demonstrates
    # the O(n*m) scaling (the dense exact scan is ~1.9 s/sweep there).
    for directed, n, n_chains, label in (
            (True, 500, 16, 'cc_directed_northstar'),
            (False, 500, 16, 'cc_undirected_northstar'),
            (True, 2048, 8, 'cc_directed_n2048')):
        Y = northstar_network(n=n, directed=directed)
        state, sweep = build_state_and_sweep(
            Y, n_chains, K=25, quality_init=False, is_directed=directed,
            n_control=m)
        value = measure_sweeps(state, sweep, n_chains, chunk, n_rounds=2)
        out.append(emit({
            'metric': 'hdp_lpcm_%s_sweeps_per_sec' % label,
            'value': round(value, 2),
            'unit': 'sweeps/s x chains (T=10, n=%d, K=25, m=%d controls, '
                    '%d chains, 1 chip)' % (n, m, n_chains),
            'vs_baseline': round(
                value / (BASELINE_NS_DIRECTED_SWEEPS_PER_SEC if directed
                         else BASELINE_NS_SWEEPS_PER_SEC), 2)}))
    return out


def main():
    mode = os.environ.get('BENCH_MODE', 'all')
    chunk = int(os.environ.get('BENCH_CHUNK', '200'))
    ns_chunk = int(os.environ.get('BENCH_NS_CHUNK', '50'))

    if mode == 'sweeps':
        run_sampson(chunk)
        return
    if mode == 'northstar':
        run_northstar(ns_chunk)
        return
    if mode == 'ess':
        run_ess(chunk)
        return
    if mode == 'ess-northstar':
        run_ess_northstar(ns_chunk)
        return
    if mode == 'directed':
        run_directed(ns_chunk)
        return
    if mode == 'cc-northstar':
        run_case_control(ns_chunk)
        return

    # mode == 'all': measure everything; each result prints as it lands
    # (partial evidence survives an external timeout) and the FINAL line —
    # the one the driver parses — is the headline Sampson aggregate
    # carrying the other results in "extra".  Every row is fault-isolated:
    # one failing workload (e.g. a tunnel compile rejection) must not
    # swallow the headline and the rows that already ran.
    def attempt(fn, *args):
        try:
            return fn(*args)
        except Exception as e:                           # noqa: BLE001
            return emit({'error': '%s: %s' % (fn.__name__,
                                              str(e).splitlines()[0])})

    ns = attempt(run_northstar, ns_chunk)
    ess_ns = attempt(run_ess_northstar, ns_chunk)
    directed = attempt(run_directed, ns_chunk)
    cc = attempt(run_case_control, ns_chunk)
    ess = attempt(run_ess, chunk)
    sampson = run_sampson(chunk)
    emit(dict(sampson, extra={'northstar_sweeps': ns,
                              'northstar_ess': ess_ns,
                              'directed_northstar_sweeps': directed,
                              'case_control': cc,
                              'sampson_ess': ess}))


if __name__ == '__main__':
    main()
