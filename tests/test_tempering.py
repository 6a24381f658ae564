"""Parallel-tempering correctness and effectiveness tests.

Methodology note: chains start from exact prior draws, so every chain is
stationary from sweep 0 and per-ladder-block means are iid unbiased
estimates regardless of mixing speed — z-tests against iid
marginal-conditional draws use block-level standard errors, which stay
honest even when slot traces interleave configurations (replica exchange
deflates odd-lag autocorrelation, which fools autocorrelation-based ESS
estimators like Geyer's; block SEs don't care).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynetlsm_tpu.mcmc.states import LSMState
from dynetlsm_tpu.mcmc.sweeps import SweepConfig, make_lsm_sweep
from dynetlsm_tpu.mcmc.tempering import (
    temper_ladder, replicate_tempered, make_pt_step, _swap_partners)

from tests.test_geweke_joint import (
    _OFFD, NEVER_BURN, T, N_NODES, D,
    B_IN, B_OUT, D_BVAR, D_TAU_SQ, D_SIGMA_SQ,
    _directed_prior_draws, _directed_stats_np, _directed_stats_jax,
    _directed_chain_state)

# the "hard" directed regime: latent distances ~15x the O(1/n) radii make
# the (intercepts, Y) joint near-bimodal; single-site Gibbs has
# autocorrelation times of tens of thousands of sweeps here
# (tests/test_geweke_joint.py's directed section documents the
# measurement) — the regime parallel tempering exists for.  Reuses the
# Geweke suite's generative helpers at the hard scales.
HARD = dict(tau_sq=2.0, sigma_sq=0.3, b_var=1.0,
            b_in_mean=1.0, b_out_mean=0.8)


def _hard_draws(rng, M):
    return _directed_prior_draws(rng, M, **HARD)


def _hard_chain_state(rng):
    return _directed_chain_state(rng, step_X=0.8, step_int=0.5, **HARD)


def _scan_stats(step_fn, states, n_sweeps):
    @jax.jit
    def go(s0):
        return jax.lax.scan(
            lambda s, _: (lambda q: (q, jax.vmap(_directed_stats_jax)(q)))(
                step_fn(s)),
            s0, None, length=n_sweeps)[1]
    return np.asarray(go(states), np.float64)       # (N, C, S)


def test_ladder_and_partners():
    betas = np.asarray(temper_ladder(5, 0.1, n_ladders=3))
    assert betas.shape == (15,)
    assert np.allclose(betas[:5][0], 1.0) and np.isclose(betas[4], 0.1)
    assert np.all(np.diff(betas[:5]) < 0)
    assert np.allclose(betas[:5], betas[5:10])
    p0, p1 = (np.asarray(p) for p in _swap_partners(8, 4))
    # involutions confined to 4-slot blocks
    for p in (p0, p1):
        assert np.array_equal(p[p], np.arange(8))
        assert np.array_equal(p // 4, np.arange(8) // 4)
    with pytest.raises(ValueError):
        _swap_partners(10, 4)
    with pytest.raises(ValueError):
        temper_ladder(1)

    rng = np.random.RandomState(0)
    s = replicate_tempered(_hard_chain_state(rng), temper_ladder(4, 0.1),
                           jax.random.PRNGKey(1))
    assert s.temper.shape == (4,) and s.X.shape[0] == 4
    assert not np.array_equal(np.asarray(s.key[0]), np.asarray(s.key[1]))


def test_ladder_adaptation_unit():
    """High-acceptance pairs widen, low-acceptance pairs narrow; the
    ladder endpoints (1, beta_min) stay fixed per block."""
    from dynetlsm_tpu.mcmc.tempering import _adapt_ladder
    betas = np.asarray(temper_ladder(4, 0.1, n_ladders=2))
    acc = jnp.asarray(np.tile([10.0, 5.0, 0.0, 0.0], 2))   # heads 0,1,2
    new = np.asarray(_adapt_ladder(jnp.asarray(betas), acc, 4,
                                   n_attempts=10.0))
    for blk in (new[:4], new[4:]):
        assert np.isclose(blk[0], 1.0) and np.isclose(blk[3], 0.1,
                                                      rtol=1e-5)
        assert np.all(np.diff(blk) < 0)
    s_old = -np.diff(np.log(betas[:4]))
    s_new = -np.diff(np.log(new[:4]))
    assert s_new[0] > s_old[0]          # acceptance 1.0 pair widens
    assert s_new[2] < s_old[2]          # acceptance 0.0 pair narrows


def test_estimator_n_temps():
    """Public-API integration: a tempered fit runs the PT step, keeps only
    the cold slots in traces/attributes, and produces a sane fit."""
    from dynetlsm_tpu import DynamicNetworkLSM, DynamicNetworkHDPLPCM
    from dynetlsm_tpu.datasets import load_monks
    Y, _, _ = load_monks(is_directed=False)

    m = DynamicNetworkLSM(n_iter=40, tune=40, burn=40, tune_interval=20,
                          n_chains=2, n_temps=3, beta_min=0.2,
                          random_state=5).fit(Y)
    assert m.Xs_.shape[0] == 2                       # cold chains only
    assert m.logps_.shape[0] == 2
    assert np.isfinite(m.logps_).all()
    assert m.auc_ > 0.5
    # the final (tune-adapted) ladder is exposed, endpoints fixed
    ladder = m.temper_ladder_.reshape(2, 3)
    assert np.allclose(ladder[:, 0], 1.0)
    assert np.allclose(ladder[:, -1], 0.2, rtol=1e-5)
    assert np.all(np.diff(ladder, axis=1) < 0)

    h = DynamicNetworkHDPLPCM(n_iter=30, tune=30, burn=30, n_components=6,
                              n_chains=1, n_temps=2, beta_min=0.3,
                              random_state=7).fit(Y)
    assert h.X_.shape == Y.shape[:2] + (2,)
    assert np.isfinite(h.logps_).all()

    with pytest.raises(ValueError):
        DynamicNetworkLSM(n_temps=2, node_devices=2,
                          latent_update='parallel').fit(Y[:, :16, :16])


def test_pt_swap_preserves_distribution():
    """Replica exchange at equal temperatures is pure config relabeling:
    the per-slot marginal must match iid prior/model draws.  This drives
    the full swap machinery (partner pairing, shared pair uniforms,
    config-field gathers) under the real sweep."""
    rng = np.random.RandomState(23)
    mc = _directed_stats_np(_directed_prior_draws(rng, 30000))

    cfg = SweepConfig(is_directed=True, sample_missing=True, tune=0,
                      n_burn=NEVER_BURN, tau_sq=D_TAU_SQ,
                      sigma_sq=D_SIGMA_SQ,
                      intercept_variance_prior=D_BVAR, tune_radii=False,
                      center=False)
    miss = jnp.asarray(np.broadcast_to(_OFFD, (T, N_NODES, N_NODES)))
    sweep = make_lsm_sweep(None, miss,
                           np.array([B_IN, B_OUT], np.float32), cfg)
    NT, NB, NSW = 4, 12, 2500
    states = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[_directed_chain_state(rng) for _ in range(NT * NB)])
    states = states._replace(temper=jnp.ones((NT * NB,), jnp.float32))
    pt = make_pt_step(sweep, cfg, None, NT, swap_every=1)
    sc = _scan_stats(pt, states, NSW)

    blocks = sc.reshape(NSW, NB, NT, -1).mean(axis=(0, 2))   # (NB, S)
    gm, se = blocks.mean(0), blocks.std(0, ddof=1) / np.sqrt(NB)
    mc_mean = mc.mean(0)
    mc_se = mc.std(0, ddof=1) / np.sqrt(mc.shape[0])
    z = (gm - mc_mean) / np.sqrt(se**2 + mc_se**2)
    assert np.all(np.abs(z) < 4.5), f'block z-scores {z}'


@pytest.mark.slow
def test_pt_hdp_joint_distribution():
    """Tempered HDP-LPCM ladders: cold slots must match the iid joint.
    Exercises likelihood-only tempering against the full mixture sweep —
    FFBS labels, CRF auxiliaries, and conjugate blocks are untempered by
    design (they do not see Y), and a mistakenly tempered prior-side
    block would shift the cold marginal."""
    import tests.test_geweke_joint as g
    from dynetlsm_tpu.mcmc.sweeps import make_hdp_sweep

    rng = np.random.RandomState(17)
    mc = g._hdp_stats_np(g._hdp_prior_draws(rng, 30000))

    cfg = SweepConfig(sample_missing=True, tune=0, n_burn=NEVER_BURN,
                      n_components=g.K, a=g.A_SIGMA,
                      lambda_prior=g.LAMBDA_MEAN,
                      lambda_variance_prior=g.LAMBDA_VAR,
                      a0=None, c0=None, table_cap=N_NODES,
                      sample_concentrations=False,
                      intercept_variance_prior=g.B_VAR, center=False)
    miss = jnp.asarray(np.broadcast_to(_OFFD, (T, N_NODES, N_NODES)))
    sweep = make_hdp_sweep(None, miss, np.array([g.B_MEAN], np.float32),
                           cfg)
    NT, NB, NSW = 4, 10, 2500
    states = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[g._hdp_chain_state(rng) for _ in range(NT * NB)])
    states = states._replace(
        temper=jnp.asarray(temper_ladder(NT, 0.25, NB)))
    pt = make_pt_step(sweep, cfg, None, NT, swap_every=1)

    @jax.jit
    def go(s0):
        return jax.lax.scan(
            lambda s, _: (lambda q: (q, jax.vmap(g._hdp_stats_jax)(q)))(
                pt(s)),
            s0, None, length=NSW)[1]
    sc = np.asarray(go(states), np.float64)              # (N, C, S)

    cold_blocks = sc[:, ::NT, :].mean(0)                 # (NB, S)
    gm = cold_blocks.mean(0)
    se = cold_blocks.std(0, ddof=1) / np.sqrt(NB)
    mc_mean = mc.mean(0)
    mc_se = mc.std(0, ddof=1) / np.sqrt(mc.shape[0])
    z = (gm - mc_mean) / np.sqrt(se**2 + mc_se**2)
    assert np.all(np.abs(z) < 4.5), f'cold-slot block z-scores {z}'


@pytest.mark.slow  # statistical PT check; swap-preserves stays in-tier
def test_pt_samples_metastable_joint():
    """In the hard regime, the cold (beta = 1) slots of real ladders must
    (a) match the iid joint within honest block SEs and (b) estimate the
    edge density with far smaller across-block variance than untempered
    chains — the mixing win replica exchange exists for."""
    rng = np.random.RandomState(31)
    mc = _directed_stats_np(_hard_draws(rng, 30000))

    cfg = SweepConfig(is_directed=True, sample_missing=True, tune=0,
                      n_burn=NEVER_BURN, tau_sq=HARD['tau_sq'],
                      sigma_sq=HARD['sigma_sq'],
                      intercept_variance_prior=HARD['b_var'],
                      tune_radii=False,
                      center=False)
    miss = jnp.asarray(np.broadcast_to(_OFFD, (T, N_NODES, N_NODES)))
    sweep = make_lsm_sweep(None, miss,
                           np.array([HARD['b_in_mean'],
                                     HARD['b_out_mean']], np.float32),
                           cfg)
    NT, NB, NSW = 10, 8, 4000
    betas = temper_ladder(NT, 0.02, NB)
    states = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[_hard_chain_state(rng) for _ in range(NT * NB)])
    states = states._replace(temper=jnp.asarray(betas))
    pt = make_pt_step(sweep, cfg, None, NT, swap_every=1)
    sc = _scan_stats(pt, states, NSW)

    cold_blocks = sc[:, ::NT, :].mean(0)                     # (NB, S)
    gm = cold_blocks.mean(0)
    se = cold_blocks.std(0, ddof=1) / np.sqrt(NB)
    mc_mean = mc.mean(0)
    mc_se = mc.std(0, ddof=1) / np.sqrt(mc.shape[0])
    z = (gm - mc_mean) / np.sqrt(se**2 + mc_se**2)
    assert np.all(np.abs(z) < 4.5), f'cold-slot block z-scores {z}'

    # untempered control: same number of independent chains as blocks
    vstep = jax.vmap(sweep, in_axes=(0, None))
    plain_states = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[_hard_chain_state(rng) for _ in range(NB)])
    plain = _scan_stats(
        lambda s: vstep(s, jnp.reshape(s.it, (-1,))[0]), plain_states, NSW)
    plain_blocks = plain.mean(0)                             # (NB, S)

    dens_std_plain = plain_blocks[:, 3].std(ddof=1)
    dens_std_pt = cold_blocks[:, 3].std(ddof=1)
    assert dens_std_pt * 1.5 < dens_std_plain, (
        'replica exchange did not reduce the metastable density variance: '
        f'plain {dens_std_plain:.4f} vs PT {dens_std_pt:.4f}')
