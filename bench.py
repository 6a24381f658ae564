"""Headline benchmarks: HDP-LPCM Gibbs-sweep throughput on one TPU chip.

Baseline (BASELINE.md): the reference's single-core Cython sampler runs
17.45 sweeps/s on Sampson's monastery (T=3, n=18, K<=10) and a measured
1.148 / 0.6745 sweeps/s (undirected / directed) at the north-star scale
(T=10, n=500, K=25).  Workloads:

* ``sampson``   — the reference's own headline config (T=3, n=18, K=10) on
  real Sampson data with many vmapped chains; aggregate sweeps/s.
* ``northstar`` — the BASELINE.json target scale (T=10, n=500, K=25) with
  chains sized to the chip; aggregate sweeps/s.
* ``ess`` / ``ess-northstar`` — ESS(logp)/s summed over chains
  (mixing-aware throughput; the reference's sweep rate upper-bounds its
  ESS/s).
* ``directed``  — directed social-radii model at the north-star scale.
* ``tempered``  — north-star with 4-rung replica-exchange ladders (the
  tempering params lane keeps the fused Pallas scan).
* ``cc-n500`` / ``cc-n2048`` / ``cc-n20000`` — the case-control O(n*m)
  estimator (exact chromatic scan) at n = 500 / 2048 / 20000; the n=20000
  network is generated directly as edge lists (nothing materializes a
  dense adjacency).

``BENCH_MODE`` selects one mode or ``all`` (default).  In ``all`` mode
every row runs in its OWN SUBPROCESS with a wall-clock budget
(``BENCH_ROW_TIMEOUT``, default 900 s): a TPU worker crash or a runaway
cold compile costs that row, not the run (round-4 lesson: one faulting
row poisoned the whole process and the driver recorded nothing).  Rows
are ordered headline-first.  Every measurement prints as its own JSON
line as it completes; the FINAL line is the headline (Sampson aggregate,
the reference's own benchmark config) with the rest under ``"extra"``.
"""
import json
import os
import subprocess
import sys
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
                          table_cap=64, is_directed=False, n_control=None,
                          edge_lists=None, shape=None, n_temps=None):
    """Build a replicated MixtureState + HDP sweep for one bench workload.

    Either ``Y`` (dense (T, n, n)) or ``edge_lists`` + ``shape`` ((T, n),
    for n too large to materialize densely) describes the network.  With
    ``n_control`` set the sweep uses the exact chromatic case-control path
    (colored conflict graph + cross-class controls) and closes over NO
    dense adjacency.  ``n_temps`` builds a replica-exchange step instead
    of a plain sweep (chains = ladders * n_temps)."""
    import jax
    import jax.numpy as jnp
    from dynetlsm_tpu.config import DTYPE
    from dynetlsm_tpu.mcmc.states import MixtureState
    from dynetlsm_tpu.mcmc.sweeps import SweepConfig, make_hdp_sweep
    from dynetlsm_tpu.mcmc.driver import replicate_state

    rng = np.random.RandomState(seed)
    if Y is None:
        T, n = shape
    else:
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
    n_int = 2 if is_directed else 1
    if n_control is not None:
        from dynetlsm_tpu.ops.case_control import (
            build_edge_lists, color_conflict_graph, sample_controls_colored)
        lists_h = edge_lists if edge_lists is not None else \
            build_edge_lists(Y)
        colors, groups = color_conflict_graph(lists_h, n, seed=seed)
        lists_d = {k: jnp.asarray(v) for k, v in lists_h.items()}
        cc_static = dict(lists_d, colors=jnp.asarray(colors),
                         color_groups=jnp.asarray(groups),
                         ctrl_key=jax.random.PRNGKey(seed + 7))
        ctrl_in, ctrl_out = sample_controls_colored(
            jax.random.fold_in(cc_static['ctrl_key'], 0),
            cc_static['colors'], n, n_control, directed=is_directed)
        Yd = None      # the cc sweep never touches a dense adjacency
        degrees = np.asarray(lists_h['degrees'], np.float64)
    else:
        Yd = jnp.asarray(Y, DTYPE)
        cc_static = None
        ctrl_in = ctrl_out = None
    sweep = make_hdp_sweep(Yd, None, np.zeros(n_int, np.float32), cfg,
                           cc_static=cc_static)

    if is_directed:
        if Y is not None:
            from dynetlsm_tpu.math.init import initialize_radii
            radii0 = jnp.asarray(initialize_radii(Y), DTYPE)
        else:
            # degree-normalized radii from the edge lists (reference
            # latent_space.py:140-153 formula without the dense adjacency)
            r = 0.5 * (degrees[..., 0].sum(0) + degrees[..., 1].sum(0))
            r /= degrees[..., 1].sum()
            if np.any(r == 0.0):
                r += 1e-5
                r /= r.sum()
            radii0 = jnp.asarray(r, DTYPE)
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

    if n_temps is not None:
        from dynetlsm_tpu.mcmc.tempering import (
            temper_ladder, replicate_tempered, make_pt_step)
        betas = temper_ladder(n_temps, beta_min=0.2,
                              n_ladders=n_chains // n_temps)
        state = replicate_tempered(s0, betas, jax.random.PRNGKey(seed + 1))
        step = make_pt_step(sweep, cfg, Yd, n_temps)
        return state, step
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


def northstar_edge_lists(T=10, n=20000, n_groups=8, seed=3, directed=True):
    """Sparse community network generated directly as padded edge lists —
    the dense (T, n, n) tensor (16 GB at n=20000) never exists, matching
    the case-control estimator's O(n * m) memory contract
    (reference case_control_likelihood.py:59-87 is O(n * m) too).

    Edge probabilities scale as p = p_500 * (500 / n) so the expected
    degree stays at the north-star density (sparse large-n regime, the
    case-control use case)."""
    rng = np.random.RandomState(seed)
    z = rng.randint(0, n_groups, size=n)
    members = [np.flatnonzero(z == g) for g in range(n_groups)]
    scale = 500.0 / n
    p_in, p_out = 0.1 * scale, 0.01 * scale

    src_all, dst_all, t_all = [], [], []
    for t in range(T):
        for a in range(n_groups):
            for b in range(n_groups):
                if not directed and b < a:
                    continue
                na, nb = members[a].shape[0], members[b].shape[0]
                n_pairs = na * nb
                p = p_in if a == b else p_out
                count = rng.binomial(n_pairs, p)
                if count == 0:
                    continue
                flat = rng.choice(n_pairs, size=count, replace=False)
                i = members[a][flat // nb]
                j = members[b][flat % nb]
                keep = i != j
                i, j = i[keep], j[keep]
                if not directed:
                    # symmetrize: undirected dyads emitted once per block
                    # pair (a <= b), stored in both row lists
                    i, j = np.concatenate([i, j]), np.concatenate([j, i])
                    if a == b:
                        # drop duplicate unordered pairs within a block
                        key = np.minimum(i, j) * n + np.maximum(i, j)
                        _, first = np.unique(key, return_index=True)
                        pair_i, pair_j = i[first], j[first]
                        i = np.concatenate([pair_i, pair_j])
                        j = np.concatenate([pair_j, pair_i])
                src_all.append(i)
                dst_all.append(j)
                t_all.append(np.full(i.shape[0], t, np.int64))
    src = np.concatenate(src_all)
    dst = np.concatenate(dst_all)
    ts = np.concatenate(t_all)

    degrees = np.zeros((T, n, 2), np.int32)
    np.add.at(degrees[..., 1], (ts, src), 1)         # out-degree
    np.add.at(degrees[..., 0], (ts, dst), 1)         # in-degree
    max_out = max(int(degrees[..., 1].max()), 1)
    max_in = max(int(degrees[..., 0].max()), 1)
    out_edges = np.full((T, n, max_out), -1, np.int32)
    in_edges = np.full((T, n, max_in), -1, np.int32)

    def fill(lists, t_arr, row, col):
        order = np.lexsort((col, row, t_arr))
        t_s, r_s, c_s = t_arr[order], row[order], col[order]
        # slot index within each (t, row) run
        new_run = np.ones(t_s.shape[0], bool)
        new_run[1:] = (t_s[1:] != t_s[:-1]) | (r_s[1:] != r_s[:-1])
        run_start = np.maximum.accumulate(
            np.where(new_run, np.arange(t_s.shape[0]), 0))
        slot = np.arange(t_s.shape[0]) - run_start
        lists[t_s, r_s, slot] = c_s

    fill(out_edges, ts, src, dst)
    fill(in_edges, ts, dst, src)
    return {'degrees': degrees, 'in_edges': in_edges,
            'out_edges': out_edges}, (T, n)


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


def measure_sweeps_prebatched(state, step, n_chains, chunk, n_rounds=2):
    """measure_sweeps for chain-prebatched steps (parallel tempering: the
    pt_step handles the chain axis itself)."""
    from dynetlsm_tpu.mcmc.driver import make_scan_runner
    runner = make_scan_runner(step, lambda s: {'logp': s.logp}, chunk=chunk,
                              multi_chain=False)
    state, ys0 = runner(state, chunk)
    np.asarray(ys0['logp'])
    t0 = time.time()
    traces = []
    for _ in range(n_rounds):
        state, ys = runner(state, chunk)
        traces.append(ys['logp'])
    np.asarray(traces[-1])
    elapsed = time.time() - t0
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


def run_tempered(chunk):
    """North-star throughput under 4-rung replica exchange: the tempering
    params lane keeps the fused Pallas node scan, so the tempered
    aggregate should sit within ~15% of the untempered north-star row
    (VERDICT round-4 item 3).  Cold-chain (beta = 1) throughput is a
    quarter of the aggregate."""
    n_chains = int(os.environ.get('BENCH_NS_CHAINS', '32'))
    n_temps = int(os.environ.get('BENCH_N_TEMPS', '4'))
    Y = northstar_network()
    state, step = build_state_and_sweep(Y, n_chains, K=25,
                                        quality_init=False,
                                        n_temps=n_temps)
    value = measure_sweeps_prebatched(state, step, n_chains, chunk)
    return emit({
        'metric': 'hdp_lpcm_tempered_aggregate_sweeps_per_sec_northstar',
        'value': round(value, 2),
        'unit': 'sweeps/s x chains (T=10, n=500, K=25, %d ladders x %d '
                'rungs, 1 chip)' % (n_chains // n_temps, n_temps),
        'vs_baseline': round(value / BASELINE_NS_SWEEPS_PER_SEC, 2)})


def _emit_cc(value, n, m, n_chains, directed, label):
    return emit({
        'metric': 'hdp_lpcm_%s_sweeps_per_sec' % label,
        'value': round(value, 2),
        'unit': 'sweeps/s x chains (T=10, n=%d, K=25, m=%d controls, '
                '%d chains, 1 chip)' % (n, m, n_chains),
        'vs_baseline': round(
            value / (BASELINE_NS_DIRECTED_SWEEPS_PER_SEC if directed
                     else BASELINE_NS_SWEEPS_PER_SEC), 2)})


def run_cc_n500(chunk):
    """Case-control at the north-star n=500 (directed + undirected), the
    reference estimator's scale (case_control_likelihood.py:36-112)."""
    m = int(os.environ.get('BENCH_CC_CONTROL', '145'))   # ~n^0.8 at n=500
    n_chains = int(os.environ.get('BENCH_CC_CHAINS', '64'))
    out = []
    for directed, label in ((True, 'cc_directed_northstar'),
                            (False, 'cc_undirected_northstar')):
        Y = northstar_network(n=500, directed=directed)
        state, sweep = build_state_and_sweep(
            Y, n_chains, K=25, quality_init=False, is_directed=directed,
            n_control=m)
        value = measure_sweeps(state, sweep, n_chains, chunk, n_rounds=2)
        out.append(_emit_cc(value, 500, m, n_chains, directed, label))
    return out


def run_cc_n2048(chunk):
    """Case-control directed at n=2048 — the shape whose XLA fori-loop
    fallback took ~274 s/sweep and tripped the TPU watchdog in round 4;
    the chromatic scan serves it in milliseconds."""
    m = int(os.environ.get('BENCH_CC_CONTROL', '145'))
    n_chains = int(os.environ.get('BENCH_CC2048_CHAINS', '128'))
    Y = northstar_network(n=2048, directed=True)
    state, sweep = build_state_and_sweep(
        Y, n_chains, K=25, quality_init=False, is_directed=True,
        n_control=m)
    value = measure_sweeps(state, sweep, n_chains, chunk, n_rounds=2)
    return _emit_cc(value, 2048, m, n_chains, True, 'cc_directed_n2048')


def run_cc_n20000(chunk):
    """Case-control directed at n=20000, generated and fitted without any
    dense adjacency — the O(n*m) time AND memory contract the estimator
    exists for (the dense exact scan cannot serve this shape at all)."""
    m = int(os.environ.get('BENCH_CC20000_CONTROL', '64'))
    n_chains = int(os.environ.get('BENCH_CC20000_CHAINS', '8'))
    # ~1.4 s/sweep at this scale: a short chunk keeps each on-device scan
    # well inside the TPU execution watchdog
    chunk = int(os.environ.get('BENCH_CC20000_CHUNK', '10'))
    lists, shape = northstar_edge_lists(n=20000, directed=True)
    state, sweep = build_state_and_sweep(
        None, n_chains, K=25, quality_init=False, is_directed=True,
        n_control=m, edge_lists=lists, shape=shape)
    value = measure_sweeps(state, sweep, n_chains, chunk, n_rounds=2)
    return _emit_cc(value, 20000, m, n_chains, True, 'cc_directed_n20000')


_MODES = {
    'sweeps': (run_sampson, 'chunk'),
    'northstar': (run_northstar, 'ns_chunk'),
    'ess': (run_ess, 'chunk'),
    'ess-northstar': (run_ess_northstar, 'ns_chunk'),
    'directed': (run_directed, 'ns_chunk'),
    'tempered': (run_tempered, 'ns_chunk'),
    'cc-n500': (run_cc_n500, 'ns_chunk'),
    'cc-n2048': (run_cc_n2048, 'ns_chunk'),
    'cc-n20000': (run_cc_n20000, 'ns_chunk'),
}

# 'all' runs these as isolated subprocesses, headline rows first so a
# late-row fault or timeout cannot cost the rows before it
_ALL_ORDER = ('sweeps', 'northstar', 'ess-northstar', 'directed', 'ess',
              'tempered', 'cc-n500', 'cc-n2048', 'cc-n20000')


def _run_row_subprocess(mode, timeout):
    """One bench row in its own process: a TPU worker crash, a wedged
    tunnel, or a runaway cold compile costs exactly this row."""
    env = dict(os.environ, BENCH_MODE=mode)
    t0 = time.time()
    try:
        proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                              env=env, capture_output=True, text=True,
                              timeout=timeout)
    except subprocess.TimeoutExpired as e:
        out = (e.stdout or '') if isinstance(e.stdout, str) else \
            (e.stdout or b'').decode(errors='replace')
        rows = _parse_rows(out)
        if rows:
            return rows
        return emit({'error': '%s: row timeout after %.0f s' %
                              (mode, time.time() - t0)})
    rows = _parse_rows(proc.stdout)
    if rows:
        for r in rows:
            emit(r)
        return rows if len(rows) > 1 else rows[0]
    tail = (proc.stderr or '').strip().splitlines()
    return emit({'error': '%s: rc=%d %s' %
                          (mode, proc.returncode,
                           tail[-1][:200] if tail else 'no output')})


def _parse_rows(stdout):
    rows = []
    for line in (stdout or '').splitlines():
        line = line.strip()
        if line.startswith('{'):
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    return rows


def main():
    mode = os.environ.get('BENCH_MODE', 'all')
    chunk = int(os.environ.get('BENCH_CHUNK', '200'))
    ns_chunk = int(os.environ.get('BENCH_NS_CHUNK', '50'))

    if mode in _MODES:
        fn, which = _MODES[mode]
        fn(chunk if which == 'chunk' else ns_chunk)
        return
    if mode != 'all':
        raise SystemExit('unknown BENCH_MODE=%r' % mode)

    row_timeout = float(os.environ.get('BENCH_ROW_TIMEOUT', '900'))
    results = {}
    for name in _ALL_ORDER:
        results[name] = _run_row_subprocess(name, row_timeout)

    sampson = results.get('sweeps')
    if not isinstance(sampson, dict) or 'value' not in sampson:
        # headline row itself failed: emit a best-effort final line so the
        # driver still records the other rows
        sampson = {'metric': 'hdp_lpcm_aggregate_sweeps_per_sec_sampson',
                   'value': None, 'unit': 'sweeps/s x chains',
                   'vs_baseline': None,
                   'error': (sampson or {}).get('error', 'missing')}
    emit(dict(sampson, extra={
        'northstar_sweeps': results.get('northstar'),
        'northstar_ess': results.get('ess-northstar'),
        'directed_northstar_sweeps': results.get('directed'),
        'sampson_ess': results.get('ess'),
        'tempered_northstar_sweeps': results.get('tempered'),
        'case_control': [results.get('cc-n500'),
                         results.get('cc-n2048'),
                         results.get('cc-n20000')]}))


if __name__ == '__main__':
    main()
