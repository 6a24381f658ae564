"""Geweke (2004) "getting it right" joint-distribution tests of the sweeps.

Two simulators of the same joint p(theta, Y) are compared:

* marginal-conditional: theta ~ prior, Y | theta ~ model (NumPy, iid draws);
* successive-conditional: the jitted Gibbs sweep run with EVERY off-diagonal
  dyad flagged missing, so the sweep's own missing-dyad Gibbs step
  (``_resample_missing``) plays the data-resampling role
  theta' ~ K(. | Y), Y' ~ p(Y | theta').

Iff every MH/Gibbs block targets its exact full conditional, the successive
chain is stationary for the joint and every moment matches the iid sample.
Moments are compared by z-scores with autocorrelation-aware (Geyer ESS)
standard errors on the chain side.  A sign error in any logp term, a
proposal asymmetry, or a wrong conjugate sufficient statistic shifts some
moment by many standard errors — this is the strongest whole-sampler
correctness check in the suite (SURVEY.md §4 calls for it; the reference
has nothing comparable).

The sweeps run with ``center=False`` and a huge ``n_burn``: the reference's
in-loop centering/procrustes projections (lsm.py:495-501) are standard
practice but not exactly measure-preserving (the X[0] ~ N(0, tau^2 I) prior
is not translation-invariant), so the pure Markov kernel is what is tested.
"""
import numpy as np
import pytest
import scipy.special
import scipy.stats

import jax
import jax.numpy as jnp

from dynetlsm_tpu.diagnostics import effective_n_geyer
from dynetlsm_tpu.mcmc.states import LSMState, MixtureState
from dynetlsm_tpu.mcmc.sweeps import (
    SweepConfig, make_lsm_sweep, make_lpcm_sweep)
from dynetlsm_tpu.ops.distances import pairwise_distances

T, N_NODES, D = 3, 8, 2
TAU_SQ, SIGMA_SQ = 2.0, 0.3
B_MEAN, B_VAR = 0.5, 1.0
NEVER_BURN = 10**8

N_CHAINS, N_SWEEPS = 8, 3000
N_MC = 30000

# mixture extras
K = 3
A_SIGMA, B_SIGMA = 4.0, 1.0          # sigma_k ~ InvGamma(a/2, b/2)
MEAN_VAR = 1.0                       # mu_k ~ N(0, MEAN_VAR I)
LAMBDA_MEAN, LAMBDA_VAR = 0.5, 0.09  # lambda ~ TruncNormal(0,1)

_IU = np.triu(np.ones((N_NODES, N_NODES), bool), 1)
_OFFD = _IU | _IU.T


def _symmetric_bernoulli(rng, P):
    """Undirected adjacency draws, P : (..., n, n)."""
    U = rng.uniform(size=P.shape)
    draw = (U < P) & _IU
    return (draw | np.swapaxes(draw, -1, -2)).astype(np.float64)


def _stats_np(beta, X, Y):
    """Test functions, identical on both simulators.  All inputs batched on
    axis 0; every statistic is permutation/label invariant."""
    D_ = np.linalg.norm(X[..., :, None, :] - X[..., None, :, :], axis=-1)
    n_dyads = X.shape[1] * _OFFD.sum()
    return np.stack([
        beta,
        beta ** 2,
        np.mean(X ** 2, axis=(1, 2, 3)),
        np.sum(Y * _OFFD, axis=(1, 2, 3)) / n_dyads,
        np.mean((X[:, 1:] - X[:, :-1]) ** 2, axis=(1, 2, 3)),
        np.sum(Y * D_ * _OFFD, axis=(1, 2, 3)) / n_dyads,
    ], axis=-1)


def _stats_jax(intercept, X, Y):
    dist = pairwise_distances(X)
    offd = jnp.asarray(_OFFD, X.dtype)
    n_dyads = X.shape[0] * _OFFD.sum()
    return jnp.stack([
        intercept[0],
        intercept[0] ** 2,
        jnp.mean(X ** 2),
        jnp.sum(Y * offd) / n_dyads,
        jnp.mean((X[1:] - X[:-1]) ** 2),
        jnp.sum(Y * dist * offd) / n_dyads,
    ])


def _compare(mc_stats, sc_stats):
    """z-scores between the iid moments and the chain moments.

    mc_stats : (M, S) iid; sc_stats : (C, N, S) chains.
    """
    mc_mean = mc_stats.mean(axis=0)
    mc_se2 = mc_stats.var(axis=0, ddof=1) / mc_stats.shape[0]
    C, N, S = sc_stats.shape
    sc_mean = sc_stats.mean(axis=(0, 1))
    sc_var = sc_stats.reshape(-1, S).var(axis=0, ddof=1)
    ess = np.array([
        sum(effective_n_geyer(sc_stats[c, :, s], maxlags=200)
            for c in range(C))
        for s in range(S)])
    return (mc_mean - sc_mean) / np.sqrt(mc_se2 + sc_var / ess)


# ---------------------------------------------------------------------------
# LSM
# ---------------------------------------------------------------------------

def _lsm_prior_draws(rng, M):
    beta = B_MEAN + np.sqrt(B_VAR) * rng.randn(M)
    X = np.zeros((M, T, N_NODES, D))
    X[:, 0] = np.sqrt(TAU_SQ) * rng.randn(M, N_NODES, D)
    for t in range(1, T):
        X[:, t] = X[:, t - 1] + np.sqrt(SIGMA_SQ) * rng.randn(M, N_NODES, D)
    D_ = np.linalg.norm(X[:, :, :, None, :] - X[:, :, None, :, :], axis=-1)
    P = scipy.special.expit(beta[:, None, None, None] - D_)
    Y = _symmetric_bernoulli(rng, P)
    return beta, X, Y


def _lsm_chain_state(rng):
    beta, X, Y = _lsm_prior_draws(rng, 1)
    f32 = lambda a: jnp.asarray(a[0], jnp.float32)  # noqa: E731
    X0 = f32(X)
    return LSMState(
        key=jax.random.PRNGKey(rng.randint(2**31)),
        it=jnp.zeros((), jnp.int32), X=X0,
        intercept=jnp.asarray([beta[0]], jnp.float32), radii=None,
        Y=f32(Y),
        step_X=jnp.full((T, N_NODES), 0.8, jnp.float32),
        acc_X=jnp.zeros((T, N_NODES), jnp.float32),
        step_int=jnp.full((1,), 0.4, jnp.float32),
        acc_int=jnp.zeros((1,), jnp.float32),
        step_radii=None, acc_radii=None,
        logp=jnp.zeros(()), logp_map=jnp.asarray(-1e30),
        X_map=X0, intercept_map=jnp.asarray([beta[0]], jnp.float32),
        radii_map=None, logp_ref=jnp.asarray(-1e30), X_ref=X0,
        missing_sum=jnp.zeros((T, N_NODES, N_NODES), jnp.float32))


def _run_chains(sweep, states, stats_of):
    def step(state, _):
        s = sweep(state)
        return s, stats_of(s)

    @jax.jit
    @jax.vmap
    def run(s0):
        return jax.lax.scan(step, s0, None, length=N_SWEEPS)[1]

    return np.asarray(run(states), np.float64)   # (C, N_SWEEPS, S)


@pytest.fixture(scope='module')
def lsm_geweke_samples():
    rng = np.random.RandomState(7)
    mc = _stats_np(*_lsm_prior_draws(rng, N_MC))

    cfg = SweepConfig(sample_missing=True, tune=0, n_burn=NEVER_BURN,
                      tau_sq=TAU_SQ, sigma_sq=SIGMA_SQ,
                      intercept_variance_prior=B_VAR, center=False)
    miss = jnp.asarray(np.broadcast_to(_OFFD, (T, N_NODES, N_NODES)))
    sweep = make_lsm_sweep(None, miss, np.array([B_MEAN], np.float32), cfg)
    states = jax.tree.map(lambda *xs: jnp.stack(xs),
                          *[_lsm_chain_state(rng) for _ in range(N_CHAINS)])
    sc = _run_chains(sweep, states,
                     lambda s: _stats_jax(s.intercept, s.X, s.Y))
    return mc, sc


def test_lsm_joint_distribution(lsm_geweke_samples):
    mc, sc = lsm_geweke_samples
    z = _compare(mc, sc)
    assert np.all(np.abs(z) < 5.0), f'Geweke z-scores {z}'


@pytest.mark.slow  # fast tier keeps the LSM joint + power smoke (round-5 budget)
def test_lsm_mala_joint_distribution():
    """The MALA latent-position kernel is MH-exact by construction, so the
    joint-distribution test must pass — this validates the gradient of
    the joint density and the drift-reversal proposal correction end to
    end (a wrong q-ratio or a gradient bug shifts moments by many SEs)."""
    rng = np.random.RandomState(7)
    mc = _stats_np(*_lsm_prior_draws(rng, N_MC))

    cfg = SweepConfig(sample_missing=True, tune=0, n_burn=NEVER_BURN,
                      tau_sq=TAU_SQ, sigma_sq=SIGMA_SQ,
                      intercept_variance_prior=B_VAR, center=False,
                      latent_update='mala')
    miss = jnp.asarray(np.broadcast_to(_OFFD, (T, N_NODES, N_NODES)))
    sweep = make_lsm_sweep(None, miss, np.array([B_MEAN], np.float32), cfg)
    states = jax.tree.map(lambda *xs: jnp.stack(xs),
                          *[_lsm_chain_state(rng) for _ in range(N_CHAINS)])
    # the whole field moves jointly: a smaller per-site scale than the
    # single-site scan keeps acceptance high
    states = states._replace(step_X=jnp.full_like(states.step_X, 0.12))
    sc = _run_chains(sweep, states,
                     lambda s: _stats_jax(s.intercept, s.X, s.Y))
    z = _compare(mc, sc)
    assert np.all(np.abs(z) < 5.0), f'Geweke z-scores {z}'


def _all_others_ctrl(n):
    """(n, n-1) control table enumerating every other node: with the
    per-time validity masks this is the FULL-CONTROL limit, where the
    case-control estimator equals the exact likelihood — the transition
    kernel is then exact for the true joint and the Geweke comparison is
    valid.  (Sampled control sets perturb the kernel — the same trade the
    reference's estimator makes — and since round 5 all chains share one
    control draw, so the perturbation no longer averages out across
    chains and would register as a genuine, expected z-shift.)"""
    base = np.arange(n)[None, :].repeat(n, axis=0)
    keep = base != np.arange(n)[:, None]
    return jnp.asarray(base[keep].reshape(n, n - 1), jnp.int32)


@pytest.mark.slow  # fast tier keeps the LSM joint + power smoke (round-5 budget)
def test_lsm_case_control_joint_distribution():
    """Geweke test with the case-control likelihood active at the
    full-control limit (every other node a control, masked per-t to the
    current non-edges), with the in-device edge-list rebuild running
    every sweep because every dyad is missing.  Exercises the chromatic
    scan, the padded edge lists, the per-time validity masks, and the
    missing-dyad rebuild inside the strongest correctness check."""
    from dynetlsm_tpu.models.base import build_case_control
    rng = np.random.RandomState(7)
    mc = _stats_np(*_lsm_prior_draws(rng, N_MC))

    cfg = SweepConfig(sample_missing=True, tune=0, n_burn=NEVER_BURN,
                      tau_sq=TAU_SQ, sigma_sq=SIGMA_SQ,
                      intercept_variance_prior=B_VAR, center=False,
                      n_control=N_NODES - 1,
                      n_resample_control=100 * N_SWEEPS)
    miss = jnp.asarray(np.broadcast_to(_OFFD, (T, N_NODES, N_NODES)))
    chains = [_lsm_chain_state(rng) for _ in range(N_CHAINS)]
    Y0_host = np.asarray(chains[0].Y)
    cc_static, _ = build_case_control(
        cfg, jnp.asarray(Y0_host), Y0_host, rng,
        miss_mask=np.asarray(miss))
    sweep = make_lsm_sweep(None, miss, np.array([B_MEAN], np.float32),
                           cfg, cc_static=cc_static)
    ctrl_all = _all_others_ctrl(N_NODES)
    # it starts at 1 so the it % cadence == 0 redraw never fires and the
    # enumerated control set persists for the whole run
    chains = [c._replace(ctrl_in=None, ctrl_out=ctrl_all,
                         it=jnp.ones((), jnp.int32))
              for c in chains]
    states = jax.tree.map(lambda *xs: jnp.stack(xs), *chains)
    sc = _run_chains(sweep, states,
                     lambda s: _stats_jax(s.intercept, s.X, s.Y))
    z = _compare(mc, sc)
    assert np.all(np.abs(z) < 5.0), f'Geweke z-scores {z}'


def test_lsm_geweke_has_power(lsm_geweke_samples):
    """The comparison must notice a genuinely different joint: iid draws
    with an inflated innovation variance shift the temporal-smoothness
    moment by many SEs.  Guards against vacuously-large standard errors."""
    _, sc = lsm_geweke_samples
    rng = np.random.RandomState(11)
    beta = B_MEAN + np.sqrt(B_VAR) * rng.randn(N_MC)
    X = np.zeros((N_MC, T, N_NODES, D))
    X[:, 0] = np.sqrt(TAU_SQ) * rng.randn(N_MC, N_NODES, D)
    for t in range(1, T):
        X[:, t] = X[:, t - 1] + np.sqrt(1.8 * SIGMA_SQ) * rng.randn(
            N_MC, N_NODES, D)
    D_ = np.linalg.norm(X[:, :, :, None, :] - X[:, :, None, :, :], axis=-1)
    P = scipy.special.expit(beta[:, None, None, None] - D_)
    Y = _symmetric_bernoulli(rng, P)
    z = _compare(_stats_np(beta, X, Y), sc)
    assert np.abs(z[4]) > 8.0, f'perturbed prior not detected: {z}'


# ---------------------------------------------------------------------------
# Directed LSM (social-radii likelihood + the Dirichlet-proposal radii MH,
# whose proposal-asymmetry correction this test exercises end-to-end)
#
# The directed joint needs its own scales: latent distances must be
# commensurate with the O(1/n) radii so the geometry factors (1 - d/r)
# stay O(1).  With the undirected test's scales (distances ~2, radii
# ~1/8) the factors are ~-15, the joint is violently bimodal between
# empty-graph/large-intercept and dense/small-intercept states, and the
# successive chain's (intercept, Y) pair has an integrated
# autocorrelation time of tens of thousands of sweeps (verified with 4
# independent 200k-sweep chains whose half-means wander on both sides of
# the prior mean) — every moment comparison is then meaningless, not
# because the kernel is wrong but because the regime does not mix.  The
# intercept prior is also kept tight (sd 0.5) so the conditional
# posterior given one resampled Y is wide relative to the prior and the
# pair decorrelates in tens of sweeps.
# ---------------------------------------------------------------------------

B_IN, B_OUT = 0.5, 0.3
D_BVAR = 0.25
D_TAU_SQ, D_SIGMA_SQ = 0.01, 0.0025


def _directed_prior_draws(rng, M, tau_sq=D_TAU_SQ, sigma_sq=D_SIGMA_SQ,
                          b_var=D_BVAR, b_in_mean=B_IN, b_out_mean=B_OUT):
    b_in = b_in_mean + np.sqrt(b_var) * rng.randn(M)
    b_out = b_out_mean + np.sqrt(b_var) * rng.randn(M)
    radii = rng.dirichlet(np.ones(N_NODES), size=M)         # (M, n)
    X = np.zeros((M, T, N_NODES, D))
    X[:, 0] = np.sqrt(tau_sq) * rng.randn(M, N_NODES, D)
    for t in range(1, T):
        X[:, t] = X[:, t - 1] + np.sqrt(sigma_sq) * rng.randn(
            M, N_NODES, D)
    D_ = np.linalg.norm(X[:, :, :, None, :] - X[:, :, None, :, :], axis=-1)
    eta = (b_in[:, None, None, None]
           * (1.0 - D_ / radii[:, None, None, :])
           + b_out[:, None, None, None]
           * (1.0 - D_ / radii[:, None, :, None]))
    P = scipy.special.expit(eta)
    Y = ((rng.uniform(size=P.shape) < P) & _OFFD).astype(np.float64)
    return b_in, b_out, radii, X, Y


def _directed_stats_np(draws):
    b_in, b_out, radii, X, Y = draws
    D_ = np.linalg.norm(X[..., :, None, :] - X[..., None, :, :], axis=-1)
    n_dyads = T * _OFFD.sum()
    return np.stack([
        b_in,
        b_out,
        np.mean(X ** 2, axis=(1, 2, 3)),
        np.sum(Y * _OFFD, axis=(1, 2, 3)) / n_dyads,
        np.mean((X[:, 1:] - X[:, :-1]) ** 2, axis=(1, 2, 3)),
        np.sum(Y * D_ * _OFFD, axis=(1, 2, 3)) / n_dyads,
        np.sum(radii ** 2, axis=-1),
        np.sum(np.sqrt(radii), axis=-1),
    ], axis=-1)


def _directed_stats_jax(s):
    dist = pairwise_distances(s.X)
    offd = jnp.asarray(_OFFD, s.X.dtype)
    n_dyads = T * _OFFD.sum()
    return jnp.stack([
        s.intercept[0],
        s.intercept[1],
        jnp.mean(s.X ** 2),
        jnp.sum(s.Y * offd) / n_dyads,
        jnp.mean((s.X[1:] - s.X[:-1]) ** 2),
        jnp.sum(s.Y * dist * offd) / n_dyads,
        jnp.sum(s.radii ** 2),
        jnp.sum(jnp.sqrt(s.radii)),
    ])


def _directed_chain_state(rng, step_X=0.1, step_int=0.4, **draw_kwargs):
    b_in, b_out, radii, X, Y = _directed_prior_draws(rng, 1, **draw_kwargs)
    f32 = lambda a: jnp.asarray(a[0], jnp.float32)  # noqa: E731
    X0 = f32(X)
    intercept = jnp.asarray([b_in[0], b_out[0]], jnp.float32)
    return LSMState(
        key=jax.random.PRNGKey(rng.randint(2**31)),
        it=jnp.zeros((), jnp.int32), X=X0,
        intercept=intercept, radii=f32(radii), Y=f32(Y),
        step_X=jnp.full((T, N_NODES), step_X, jnp.float32),
        acc_X=jnp.zeros((T, N_NODES), jnp.float32),
        step_int=jnp.full((2,), step_int, jnp.float32),
        acc_int=jnp.zeros((2,), jnp.float32),
        step_radii=jnp.asarray(100.0, jnp.float32),
        acc_radii=jnp.zeros((), jnp.float32),
        logp=jnp.zeros(()), logp_map=jnp.asarray(-1e30),
        X_map=X0, intercept_map=intercept, radii_map=f32(radii),
        logp_ref=jnp.asarray(-1e30), X_ref=X0,
        missing_sum=jnp.zeros((T, N_NODES, N_NODES), jnp.float32))


@pytest.fixture(scope='module')
def directed_geweke_samples():
    rng = np.random.RandomState(23)
    mc = _directed_stats_np(_directed_prior_draws(rng, N_MC))

    cfg = SweepConfig(is_directed=True, sample_missing=True, tune=0,
                      n_burn=NEVER_BURN, tau_sq=D_TAU_SQ,
                      sigma_sq=D_SIGMA_SQ,
                      intercept_variance_prior=D_BVAR, tune_radii=False,
                      center=False)
    miss = jnp.asarray(np.broadcast_to(_OFFD, (T, N_NODES, N_NODES)))
    sweep = make_lsm_sweep(None, miss,
                           np.array([B_IN, B_OUT], np.float32), cfg)
    states = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[_directed_chain_state(rng) for _ in range(N_CHAINS)])
    sc = _run_chains(sweep, states, _directed_stats_jax)
    return mc, sc


@pytest.mark.slow  # fast tier keeps the LSM joint + power smoke (round-5 budget)
def test_directed_lsm_joint_distribution(directed_geweke_samples):
    mc, sc = directed_geweke_samples
    z = _compare(mc, sc)
    assert np.all(np.abs(z) < 5.0), f'Geweke z-scores {z}'


@pytest.mark.slow  # fast tier keeps the LSM joint + power smoke (round-5 budget)
def test_directed_case_control_joint_distribution():
    """Directed case-control machinery through the Geweke harness at the
    full-control limit (every other node a control, masked per-t): the
    estimator is then exact and the joint must match.  (Sampled control
    subsets perturb the kernel — the same trade the reference's
    estimator makes — and with round 5's chain-shared draws the
    perturbation is common across chains, so this test pins the
    machinery at the exact limit; the approximation itself is
    characterised by the full-control-limit and unbiasedness tests.)"""
    from dynetlsm_tpu.models.base import build_case_control
    rng = np.random.RandomState(23)
    mc = _directed_stats_np(_directed_prior_draws(rng, N_MC))

    cfg = SweepConfig(is_directed=True, sample_missing=True, tune=0,
                      n_burn=NEVER_BURN, tau_sq=D_TAU_SQ,
                      sigma_sq=D_SIGMA_SQ,
                      intercept_variance_prior=D_BVAR, tune_radii=False,
                      center=False, n_control=N_NODES - 1,
                      n_resample_control=100 * N_SWEEPS)
    miss = jnp.asarray(np.broadcast_to(_OFFD, (T, N_NODES, N_NODES)))
    chains = [_directed_chain_state(rng) for _ in range(N_CHAINS)]
    Y0_host = np.asarray(chains[0].Y)
    cc_static, _ = build_case_control(
        cfg, jnp.asarray(Y0_host), Y0_host, rng,
        miss_mask=np.asarray(miss))
    sweep = make_lsm_sweep(None, miss,
                           np.array([B_IN, B_OUT], np.float32),
                           cfg, cc_static=cc_static)
    ctrl_all = _all_others_ctrl(N_NODES)
    chains = [c._replace(ctrl_in=ctrl_all, ctrl_out=ctrl_all,
                         it=jnp.ones((), jnp.int32))
              for c in chains]
    states = jax.tree.map(lambda *xs: jnp.stack(xs), *chains)
    sc = _run_chains(sweep, states, _directed_stats_jax)
    z = _compare(mc, sc)
    assert np.all(np.abs(z) < 5.0), f'Geweke z-scores {z}'


# ---------------------------------------------------------------------------
# LPCM (FFBS labels + Dirichlet weights + conjugate mu/sigma/lambda blocks)
# ---------------------------------------------------------------------------

def _lpcm_prior_draws(rng, M):
    init_w = rng.dirichlet(np.ones(K), size=M)              # (M, K)
    trans_w = rng.dirichlet(np.ones(K), size=(M, K))        # (M, K, K)
    mu = np.sqrt(MEAN_VAR) * rng.randn(M, K, D)
    sigma = (0.5 * B_SIGMA) / rng.gamma(0.5 * A_SIGMA, 1.0, size=(M, K))
    a, b = -LAMBDA_MEAN / np.sqrt(LAMBDA_VAR), (1 - LAMBDA_MEAN) / np.sqrt(
        LAMBDA_VAR)
    lmbda = scipy.stats.truncnorm.rvs(a, b, loc=LAMBDA_MEAN,
                                      scale=np.sqrt(LAMBDA_VAR), size=M,
                                      random_state=rng)
    beta = B_MEAN + np.sqrt(B_VAR) * rng.randn(M)

    z = np.zeros((M, T, N_NODES), np.int64)
    u = rng.uniform(size=(M, T, N_NODES, 1))
    z[:, 0] = (u[:, 0] > np.cumsum(init_w, -1)[:, None, :]).sum(-1)
    for t in range(1, T):
        rows = trans_w[np.arange(M)[:, None], z[:, t - 1]]  # (M, n, K)
        z[:, t] = (u[:, t] > np.cumsum(rows, -1)).sum(-1)
    z = np.clip(z, 0, K - 1)

    X = np.zeros((M, T, N_NODES, D))
    midx = np.arange(M)[:, None, None]
    sig_z = sigma[midx, z]                                     # (M, T, n)
    mu_z = mu[midx, z]                                         # (M, T, n, D)
    X[:, 0] = mu_z[:, 0] + np.sqrt(sig_z[:, 0, :, None]) * rng.randn(
        M, N_NODES, D)
    for t in range(1, T):
        mean_t = ((1.0 - lmbda[:, None, None]) * X[:, t - 1]
                  + lmbda[:, None, None] * mu_z[:, t])
        X[:, t] = mean_t + np.sqrt(sig_z[:, t, :, None]) * rng.randn(
            M, N_NODES, D)

    D_ = np.linalg.norm(X[:, :, :, None, :] - X[:, :, None, :, :], axis=-1)
    P = scipy.special.expit(beta[:, None, None, None] - D_)
    Y = _symmetric_bernoulli(rng, P)
    return beta, lmbda, sigma, mu, X, Y, z, init_w, trans_w


def _lpcm_stats_np(draws):
    beta, lmbda, sigma, mu, X, Y, _, _, _ = draws
    base = _stats_np(beta, X, Y)
    extra = np.stack([
        lmbda,
        np.mean(sigma, axis=-1),
        np.mean(np.sum(mu ** 2, axis=-1), axis=-1),
    ], axis=-1)
    return np.concatenate([base, extra], axis=-1)


def _lpcm_stats_jax(s):
    base = _stats_jax(s.intercept, s.X, s.Y)
    extra = jnp.stack([
        s.lmbda,
        jnp.mean(s.sigma),
        jnp.mean(jnp.sum(s.mu ** 2, axis=-1)),
    ])
    return jnp.concatenate([base, extra])


def _lpcm_chain_state(rng):
    beta, lmbda, sigma, mu, X, Y, z, init_w, trans_w = _lpcm_prior_draws(
        rng, 1)
    f32 = lambda a: jnp.asarray(a[0], jnp.float32)  # noqa: E731
    return MixtureState(
        key=jax.random.PRNGKey(rng.randint(2**31)),
        it=jnp.zeros((), jnp.int32), X=f32(X),
        intercept=jnp.asarray([beta[0]], jnp.float32), radii=None,
        Y=f32(Y), z=jnp.asarray(z[0], jnp.int32),
        mu=f32(mu), sigma=f32(sigma),
        lmbda=jnp.asarray(lmbda[0], jnp.float32),
        weights=None, beta=None, gamma=None, alpha_init=None, alpha=None,
        kappa=None, init_weights=f32(init_w), trans_weights=f32(trans_w),
        mean_var=jnp.asarray(MEAN_VAR, jnp.float32),
        b_scale=jnp.asarray(B_SIGMA, jnp.float32),
        step_X=jnp.full((T, N_NODES), 0.8, jnp.float32),
        acc_X=jnp.zeros((T, N_NODES), jnp.float32),
        step_int=jnp.full((1,), 0.4, jnp.float32),
        acc_int=jnp.zeros((1,), jnp.float32),
        step_radii=None, acc_radii=None, logp=jnp.zeros(()),
        missing_sum=jnp.zeros((T, N_NODES, N_NODES), jnp.float32))


@pytest.fixture(scope='module')
def lpcm_geweke_samples():
    rng = np.random.RandomState(13)
    mc = _lpcm_stats_np(_lpcm_prior_draws(rng, N_MC))

    cfg = SweepConfig(sample_missing=True, tune=0, n_burn=NEVER_BURN,
                      n_components=K, a=A_SIGMA,
                      lambda_prior=LAMBDA_MEAN,
                      lambda_variance_prior=LAMBDA_VAR,
                      a0=None, c0=None, dirichlet_prior=1.0,
                      intercept_variance_prior=B_VAR, center=False)
    miss = jnp.asarray(np.broadcast_to(_OFFD, (T, N_NODES, N_NODES)))
    sweep = make_lpcm_sweep(None, miss, np.array([B_MEAN], np.float32), cfg)
    states = jax.tree.map(lambda *xs: jnp.stack(xs),
                          *[_lpcm_chain_state(rng) for _ in range(N_CHAINS)])
    sc = _run_chains(sweep, states, _lpcm_stats_jax)
    return mc, sc


@pytest.mark.slow  # fast tier keeps the LSM joint + power smoke (round-5 budget)
def test_lpcm_joint_distribution(lpcm_geweke_samples):
    mc, sc = lpcm_geweke_samples
    z = _compare(mc, sc)
    assert np.all(np.abs(z) < 5.0), f'Geweke z-scores {z}'


# ---------------------------------------------------------------------------
# HDP-LPCM (adds the partially-collapsed CRF table / beta / sticky-weights
# blocks: z | w  ->  m | z, beta (w marginalised)  ->  beta | m_bar  ->
# w | z, beta, the Fox et al. weak-limit augmentation).  Concentrations are
# held fixed (sample_concentrations=False): their Escobar-West updates are
# approximate under the weak-limit prior, in the reference too.
# ---------------------------------------------------------------------------

GAMMA_C, ALPHA_INIT_C, ALPHA_C, KAPPA_C = 3.0, 1.5, 2.0, 2.0


def _hdp_prior_draws(rng, M):
    beta_w = rng.dirichlet(np.full(K, GAMMA_C / K), size=M)     # (M, K)
    # Dirichlet via normalised Gammas (np.random.dirichlet takes only a
    # single concentration vector; Gamma shapes vectorise)
    g0 = rng.gamma(ALPHA_INIT_C * beta_w + 1e-10)
    w0 = g0 / g0.sum(-1, keepdims=True)
    conc = (ALPHA_C * beta_w[:, None, None, :]
            + KAPPA_C * np.eye(K)[None, None])                  # (M, 1, K, K)
    gt = rng.gamma(np.broadcast_to(conc, (M, T - 1, K, K)) + 1e-10)
    trans = gt / gt.sum(-1, keepdims=True)
    mu = np.sqrt(MEAN_VAR) * rng.randn(M, K, D)
    sigma = (0.5 * B_SIGMA) / rng.gamma(0.5 * A_SIGMA, 1.0, size=(M, K))
    a, b = -LAMBDA_MEAN / np.sqrt(LAMBDA_VAR), (1 - LAMBDA_MEAN) / np.sqrt(
        LAMBDA_VAR)
    lmbda = scipy.stats.truncnorm.rvs(a, b, loc=LAMBDA_MEAN,
                                      scale=np.sqrt(LAMBDA_VAR), size=M,
                                      random_state=rng)
    beta = B_MEAN + np.sqrt(B_VAR) * rng.randn(M)

    z = np.zeros((M, T, N_NODES), np.int64)
    u = rng.uniform(size=(M, T, N_NODES, 1))
    z[:, 0] = (u[:, 0] > np.cumsum(w0, -1)[:, None, :]).sum(-1)
    for t in range(1, T):
        rows = trans[np.arange(M)[:, None], t - 1, z[:, t - 1]]  # (M, n, K)
        z[:, t] = (u[:, t] > np.cumsum(rows, -1)).sum(-1)
    z = np.clip(z, 0, K - 1)

    X = np.zeros((M, T, N_NODES, D))
    midx = np.arange(M)[:, None, None]
    sig_z = sigma[midx, z]
    mu_z = mu[midx, z]
    X[:, 0] = mu_z[:, 0] + np.sqrt(sig_z[:, 0, :, None]) * rng.randn(
        M, N_NODES, D)
    for t in range(1, T):
        mean_t = ((1.0 - lmbda[:, None, None]) * X[:, t - 1]
                  + lmbda[:, None, None] * mu_z[:, t])
        X[:, t] = mean_t + np.sqrt(sig_z[:, t, :, None]) * rng.randn(
            M, N_NODES, D)

    D_ = np.linalg.norm(X[:, :, :, None, :] - X[:, :, None, :, :], axis=-1)
    P = scipy.special.expit(beta[:, None, None, None] - D_)
    Y = _symmetric_bernoulli(rng, P)
    return beta, lmbda, sigma, mu, X, Y, z, beta_w, w0, trans


def _hdp_stats_np(draws):
    beta, lmbda, sigma, mu, X, Y, _, beta_w, _, trans = draws
    base = _stats_np(beta, X, Y)
    diag = np.einsum('mtkk->mt', trans).mean(axis=-1) / K
    extra = np.stack([
        lmbda,
        np.mean(sigma, axis=-1),
        np.mean(np.sum(mu ** 2, axis=-1), axis=-1),
        np.sum(beta_w ** 2, axis=-1),
        diag,
    ], axis=-1)
    return np.concatenate([base, extra], axis=-1)


def _hdp_stats_jax(s):
    base = _stats_jax(s.intercept, s.X, s.Y)
    diag = jnp.mean(jnp.einsum('tkk->t', s.weights[1:])) / K
    extra = jnp.stack([
        s.lmbda,
        jnp.mean(s.sigma),
        jnp.mean(jnp.sum(s.mu ** 2, axis=-1)),
        jnp.sum(s.beta ** 2),
        diag,
    ])
    return jnp.concatenate([base, extra])


def _hdp_chain_state(rng):
    (beta, lmbda, sigma, mu, X, Y, z, beta_w, w0, trans) = _hdp_prior_draws(
        rng, 1)
    f32 = lambda a: jnp.asarray(a[0], jnp.float32)  # noqa: E731
    w_first = np.zeros((1, K, K), np.float32)
    w_first[0, 0] = w0[0]
    weights = jnp.concatenate([jnp.asarray(w_first), f32(trans)], axis=0)
    return MixtureState(
        key=jax.random.PRNGKey(rng.randint(2**31)),
        it=jnp.zeros((), jnp.int32), X=f32(X),
        intercept=jnp.asarray([beta[0]], jnp.float32), radii=None,
        Y=f32(Y), z=jnp.asarray(z[0], jnp.int32),
        mu=f32(mu), sigma=f32(sigma),
        lmbda=jnp.asarray(lmbda[0], jnp.float32),
        weights=weights, beta=f32(beta_w),
        gamma=jnp.asarray(GAMMA_C, jnp.float32),
        alpha_init=jnp.asarray(ALPHA_INIT_C, jnp.float32),
        alpha=jnp.asarray(ALPHA_C, jnp.float32),
        kappa=jnp.asarray(KAPPA_C, jnp.float32),
        init_weights=None, trans_weights=None,
        mean_var=jnp.asarray(MEAN_VAR, jnp.float32),
        b_scale=jnp.asarray(B_SIGMA, jnp.float32),
        step_X=jnp.full((T, N_NODES), 0.8, jnp.float32),
        acc_X=jnp.zeros((T, N_NODES), jnp.float32),
        step_int=jnp.full((1,), 0.4, jnp.float32),
        acc_int=jnp.zeros((1,), jnp.float32),
        step_radii=None, acc_radii=None, logp=jnp.zeros(()),
        missing_sum=jnp.zeros((T, N_NODES, N_NODES), jnp.float32))


@pytest.fixture(scope='module')
def hdp_geweke_samples():
    from dynetlsm_tpu.mcmc.sweeps import make_hdp_sweep
    rng = np.random.RandomState(17)
    mc = _hdp_stats_np(_hdp_prior_draws(rng, N_MC))

    cfg = SweepConfig(sample_missing=True, tune=0, n_burn=NEVER_BURN,
                      n_components=K, a=A_SIGMA,
                      lambda_prior=LAMBDA_MEAN,
                      lambda_variance_prior=LAMBDA_VAR,
                      a0=None, c0=None, table_cap=N_NODES,
                      sample_concentrations=False,
                      intercept_variance_prior=B_VAR, center=False)
    miss = jnp.asarray(np.broadcast_to(_OFFD, (T, N_NODES, N_NODES)))
    sweep = make_hdp_sweep(None, miss, np.array([B_MEAN], np.float32), cfg)
    states = jax.tree.map(lambda *xs: jnp.stack(xs),
                          *[_hdp_chain_state(rng) for _ in range(N_CHAINS)])
    sc = _run_chains(sweep, states, _hdp_stats_jax)
    return mc, sc


@pytest.mark.slow  # fast tier keeps the LSM joint + power smoke (round-5 budget)
def test_hdp_joint_distribution(hdp_geweke_samples):
    mc, sc = hdp_geweke_samples
    z = _compare(mc, sc)
    assert np.all(np.abs(z) < 5.0), f'Geweke z-scores {z}'
