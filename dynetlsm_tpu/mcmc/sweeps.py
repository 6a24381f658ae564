"""Full Gibbs sweeps as pure jittable ``state -> state`` functions.

Each ``make_*_sweep`` factory closes over the observed network and static
hyperparameters and returns a sweep implementing the reference fit-loop body:

* LSM       — reference lsm.py:474-572
* LPCM      — reference lpcm.py:514-701
* HDP-LPCM  — reference hdp_lpcm.py:823-1069

The returned function is scanned over iterations (``lax.scan``), vmapped
over chains, and sharded over the device mesh by the model layer.
"""
import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import SMALL_EPS
from ..math.distributions import (
    sample_dirichlet, dirichlet_logpdf, truncated_normal_logpdf)
from ..math.procrustes import longitudinal_procrustes_rotation
from ..ops.distances import pairwise_distances
from ..ops.likelihoods import (
    undirected_loglik_full, directed_loglik_full,
    directed_network_probas)
from ..ops.case_control import (
    approx_directed_loglik_full, approx_undirected_loglik_full,
    sample_control_nodes, edge_lists_device)
from .metropolis import maybe_tune
from .latent import sample_latent_positions
from .coefficients import (
    sample_intercept_undirected, sample_intercepts_directed, sample_radii)
from .labels import (
    sample_labels_block, sample_labels_block_lpcm, _label_statistics)
from .hdp import (
    sample_tables, sample_mbar, sample_concentration_param,
    sample_alpha_kappa_rho)
from .conjugate import (
    sample_cluster_means, sample_cluster_variances, sample_lambda,
    sample_mean_variance_hyper, sample_sigma_scale_hyper)
from .states import LSMState, MixtureState


@dataclasses.dataclass(frozen=True)
class SweepConfig:
    """Static (trace-time constant) sweep configuration."""
    is_directed: bool = False
    sample_missing: bool = False
    tune: int = 0                 # sweeps of step-size adaptation
    tune_interval: int = 100
    n_burn: int = 0               # tune + burn
    # LSM priors
    tau_sq: float = 2.0
    sigma_sq: float = 0.1
    intercept_variance_prior: float = 2.0
    # mixture priors
    n_components: int = 10
    a: float = 2.0
    lambda_prior: float = 0.9
    lambda_variance_prior: float = 0.01
    # hyper-prior shapes (None disables resampling, mirroring the reference's
    # mean_variance_prior_std / sigma_prior_std=None switches)
    a0: Optional[float] = None
    b0: Optional[float] = None
    c0: Optional[float] = None
    d0: Optional[float] = None
    # HDP concentration hyper-priors
    gamma_prior_shape: float = 1.0
    gamma_prior_rate: float = 0.1
    alpha_init_shape: float = 1.0
    alpha_init_rate: float = 1.0
    alpha_kappa_shape: float = 5.0
    alpha_kappa_rate: float = 0.1
    # LPCM Dirichlet prior concentration
    dirichlet_prior: float = 1.0
    # whether the radii MH step size is tuned (LSM: no, ref lsm.py:470-472;
    # LPCM/HDP: yes, ref hdp_lpcm.py:744-747)
    tune_radii: bool = False
    # case-control likelihood: number of control non-edges per node and the
    # resampling cadence (reference lsm.py:171-179; extended here to
    # undirected networks and to fits with missing dyads)
    n_control: Optional[int] = None
    n_resample_control: int = 100
    # latent-position update kernel: 'exact' sequential node scan (matches
    # the reference's single-site sampler) or 'parallel' stale-field
    # per-site acceptance (SURVEY.md §7.1)
    latent_update: str = 'exact'
    # CRF table sampler: number of exactly-drawn Bernoulli terms per cell
    # before the Poisson tail takes over (mcmc/hdp.py); >= n_nodes is exact
    table_cap: int = 64
    # node-axis (spatial) sharding is active: keep every op on the XLA/GSPMD
    # path (the Pallas kernels assume unsharded operands)
    spatial: bool = False
    # resample the HDP concentration parameters gamma / alpha_init /
    # (alpha, kappa, rho) each sweep (reference hdp_lpcm.py:977-1023).
    # Those Escobar-West-style updates are exact for a DP mixture but only
    # approximate Gibbs under the weak-limit Dir(gamma/K) prior (in the
    # reference too); the Geweke joint-distribution test fixes the
    # concentrations to validate the exactly-conditional blocks.
    sample_concentrations: bool = True
    # center the latent positions each sweep (reference lsm.py:501).  The
    # projection is standard practice but not exactly measure-preserving
    # (the X[0] ~ N(0, tau^2) prior is not translation-invariant); the
    # Geweke joint-distribution test disables it to validate the pure
    # Markov kernel against the untouched generative model.
    center: bool = True


# ---------------------------------------------------------------------------
# shared pieces
# ---------------------------------------------------------------------------


def _fused_pair_ok(cfg, n):
    """Whether the coefficient MH blocks can use the fused Pallas
    evaluators (no materialised distance tensor): fixed Y, on a real TPU,
    and large enough that the dense path's HBM traffic matters.  Directed
    models route to the multi-candidate directed kernel
    (ops/pallas_loglik.py directed_loglik_cands_fused)."""
    if cfg.sample_missing or cfg.spatial or n < 256:
        return False
    return jax.default_backend() == 'tpu'


def _network_loglik(cfg, Y, dist, intercept, radii, X=None, cc=None):
    if cfg.is_directed:
        if cc is not None:
            return approx_directed_loglik_full(
                X, radii, cc['out_edges'], cc['degrees'], cc['ctrl_out'],
                cc['ctrl_out_valid'], intercept[0], intercept[1],
                shared_ctrl='colors' in cc)
        return directed_loglik_full(Y, dist, radii, intercept[0], intercept[1])
    if cc is not None:
        return approx_undirected_loglik_full(
            X, cc['out_edges'], cc['degrees'][..., 1], cc['ctrl_out'],
            cc['ctrl_out_valid'], intercept[0], shared_ctrl='colors' in cc)
    return undirected_loglik_full(Y, dist, intercept[0])


def _refresh_controls(cfg, key, state, Y, lists, cc_static, it_hint=None):
    """Periodically redraw the control-node sets inside the jitted sweep
    (reference CaseControlSampler.resample, case_control_likelihood.py:27-33
    — cadence-only there too).

    With color classes present (``cc_static['colors']``, the default built
    by models/base.build_case_control) the redraw is the O(n * m) sparse
    draw against the *current* edge ``lists`` — no dense adjacency is
    touched, which is what lets the case-control sweep run at n >> 10^4.
    Legacy dicts without colors keep the dense Gumbel top-k draw.

    ``it_hint`` is a chain-invariant scalar iteration index supplied by the
    scan runner: with it, the redraw runs under ``lax.cond`` and the
    redraw work really is skipped on off-cadence sweeps.  (The per-chain
    ``state.it`` makes a worse predicate — vmap over chains batches it and
    lowers the cond to a select that runs both branches every sweep.)
    Without a hint the same cond runs on ``state.it``: a direct un-vmapped
    ``sweep(state)`` caller still gets the real skip, and a vmapped caller
    degrades to the run-both-branches select rather than an error.
    """

    it = state.it if it_hint is None else it_hint

    def redraw(_):
        if 'colors' in cc_static:
            from ..ops.case_control import sample_controls_colored
            # chain-INVARIANT key: all chains share one control set per
            # redraw window, so every chain targets the same surrogate
            # posterior (valid cross-chain R-hat) and the control-index
            # gathers stay shared-index — ~10x faster than per-chain
            # batched-index gathers (see case_control._shared_idx_vmap)
            k = jax.random.fold_in(cc_static['ctrl_key'],
                                   jnp.asarray(it, jnp.int32))
            return sample_controls_colored(
                k, cc_static['colors'], cc_static['colors'].shape[0],
                cfg.n_control, directed=cfg.is_directed)
        return sample_control_nodes(key, Y, cfg.n_control,
                                    directed=cfg.is_directed)

    do = (it % cfg.n_resample_control) == 0
    return jax.lax.cond(do, redraw,
                        lambda _: (state.ctrl_in, state.ctrl_out), None)


def build_cc_dict(cfg, Y, cc_static, ctrl_in, ctrl_out):
    """Assemble the case-control structure dict consumed by the likelihood
    kernels: the (possibly per-sweep rebuilt) edge lists plus the control
    index tensors and the static color classes.  Single source of truth
    for both the in-sweep structures and the initial-sample logp
    (models/base.init_cc_dict), so ``logps_`` is one consistent estimator
    throughout."""
    lists = (edge_lists_device(Y, cc_static['max_deg'])
             if cfg.sample_missing else cc_static)
    from ..ops.case_control import control_masks
    civ, cov = control_masks(ctrl_in, ctrl_out, lists,
                             cfg.is_directed,
                             shared_ctrl='colors' in cc_static)
    cc = dict(lists, ctrl_in=ctrl_in, ctrl_out=ctrl_out,
              ctrl_in_valid=civ, ctrl_out_valid=cov)
    cc.pop('max_deg', None)
    cc.pop('ctrl_key', None)
    for k in ('colors', 'color_groups'):
        if k in cc_static:
            cc[k] = cc_static[k]
    return cc


def _cc_structures(cfg, key, state, Y, cc_static, it_hint=None):
    """Per-sweep case-control structures: refreshed control sets plus —
    when missing dyads are being resampled so the edge structure drifts —
    an in-device rebuild of the padded edge lists from the current Y
    (reference MissingDirectedCaseControlSampler,
    case_control_likelihood.py:115-186)."""
    from ..ops.case_control import control_masks
    lists = (edge_lists_device(Y, cc_static['max_deg'])
             if cfg.sample_missing else cc_static)
    ctrl_in, ctrl_out = _refresh_controls(cfg, key, state, Y, lists,
                                          cc_static, it_hint)
    civ, cov = control_masks(ctrl_in, ctrl_out, lists,
                             cfg.is_directed,
                             shared_ctrl='colors' in cc_static)
    cc = dict(lists, ctrl_in=ctrl_in, ctrl_out=ctrl_out,
              ctrl_in_valid=civ, ctrl_out_valid=cov)
    cc.pop('max_deg', None)
    cc.pop('ctrl_key', None)
    for k in ('colors', 'color_groups'):
        if k in cc_static:
            cc[k] = cc_static[k]
    return cc, ctrl_in, ctrl_out


def _resample_missing(cfg, key, Y, dist, intercept, radii, miss_mask,
                      temper=None):
    """Gibbs-resample missing dyads from their Bernoulli conditionals
    (reference lsm.py:526-545, hdp_lpcm.py:1026-1049).

    Under parallel tempering the conditional of a dyad given the tempered
    likelihood p(Y|theta)^beta is Bernoulli with logit scaled by beta:
    p^beta / (p^beta + (1-p)^beta) = expit(beta * eta)."""
    from ..ops.likelihoods import directed_eta
    n = Y.shape[-1]
    if cfg.is_directed:
        if temper is None:
            probas = directed_network_probas(dist, radii, intercept[0],
                                             intercept[1])
        else:
            eta = directed_eta(dist, radii, intercept[0], intercept[1])
            probas = jax.nn.sigmoid(temper * eta) * (
                1.0 - jnp.eye(n, dtype=dist.dtype))
        draw = (jax.random.uniform(key, Y.shape) < probas).astype(Y.dtype)
        return jnp.where(miss_mask, draw, Y)
    eta = intercept[0] - dist
    if temper is not None:
        eta = temper * eta
    probas = jax.nn.sigmoid(eta)
    u = jax.random.uniform(key, Y.shape)
    draw = (u < probas).astype(Y.dtype)
    triu = jnp.triu(jnp.ones((n, n), Y.dtype), k=1)
    draw = draw * triu
    draw = draw + jnp.swapaxes(draw, -1, -2)
    return jnp.where(miss_mask, draw, Y)


def _lsm_logp(cfg, Y, X, intercept, radii, dist, intercept_prior, cc=None,
              net_ll=None):
    """Reference lsm.py:576-625.  ``net_ll`` reuses an already-computed
    network log-likelihood at the current state (one fewer dense pass)."""
    loglik = (net_ll if net_ll is not None else
              _network_loglik(cfg, Y, dist, intercept, radii, X=X, cc=cc))
    loglik -= 0.5 * jnp.sum(X[0] * X[0]) / cfg.tau_sq
    if X.shape[0] > 1:
        diff = X[1:] - X[:-1]
        loglik -= 0.5 * jnp.sum(diff * diff) / cfg.sigma_sq
    diff = intercept - intercept_prior
    loglik -= jnp.sum(0.5 * diff * diff / cfg.intercept_variance_prior)
    return loglik


def _latent_mixture_loglik(X, z, mu, sigma, lmbda, resp=None):
    """Latent-position log density under the mixture dynamics
    (reference hdp_lpcm.py:1247-1253).

    With ``resp`` (the one-hot responsibilities of ``z``) the per-site
    cluster parameters come from MXU matmuls instead of gathers — exact
    same values (one-hot contraction), ~5x faster at n=500, K=25.
    """
    if resp is not None:
        # highest precision keeps the one-hot contraction bit-identical to
        # the gather (TPU default would truncate mu/sigma to bf16)
        sig_z = jnp.einsum('tnk,k->tn', resp, sigma, precision='highest')
        mu_z = jnp.einsum('tnk,kd->tnd', resp, mu, precision='highest')
    else:
        sig_z = sigma[z]                         # (T, n)
        mu_z = mu[z]                             # (T, n, d)
    diff0 = X[0] - mu_z[0]
    ll = jnp.sum(-0.5 * jnp.log(sig_z[0])
                 - 0.5 * jnp.sum(diff0 * diff0, axis=-1) / sig_z[0])
    if X.shape[0] > 1:
        difft = X[1:] - (1.0 - lmbda) * X[:-1] - lmbda * mu_z[1:]
        ll += jnp.sum(-0.5 * jnp.log(sig_z[1:])
                      - 0.5 * jnp.sum(difft * difft, axis=-1) / sig_z[1:])
    return ll


def _gather_chain_loglik(z, w0, w_trans):
    """sum_i log w0[z_0i] + sum_{t>0,i} log w[t, z_{t-1,i}, z_ti]
    (reference hdp_lpcm.py:1207-1211).  w_trans: (T, K, K)."""
    ll = jnp.sum(jnp.log(jnp.clip(w0[z[0]], SMALL_EPS, None)))
    if z.shape[0] > 1:
        trans = w_trans[1:]                          # (T-1, K, K)
        tidx = jnp.arange(z.shape[0] - 1)[:, None]
        picked = trans[tidx, z[:-1], z[1:]]          # (T-1, n)
        ll += jnp.sum(jnp.log(jnp.clip(picked, SMALL_EPS, None)))
    return ll


def _count_chain_loglik(n_trans, nk, w0, w_trans):
    """Count-weighted form of :func:`_gather_chain_loglik`:
    sum_k nk[0,k] log w0[k] + sum_{t>0} n_trans[t] . log w[t] — the same
    quantity computed from the label sampler's transition counts, with no
    per-site gathers."""
    ll = jnp.sum(nk[0] * jnp.log(jnp.clip(w0, SMALL_EPS, None)))
    if n_trans.shape[0] > 1:
        ll += jnp.sum(n_trans[1:]
                      * jnp.log(jnp.clip(w_trans[1:], SMALL_EPS, None)))
    return ll


# ---------------------------------------------------------------------------
# LSM sweep
# ---------------------------------------------------------------------------

def _int8_adjacency(Y_fixed):
    """Store a fixed 0/1 adjacency as int8 on TPU: every consumer either
    compares (``Y == 0``) or multiplies into float expressions (type
    promotion casts back, bit-identically for 0/1), so the dense likelihood
    passes read a quarter of the HBM bytes.  TPU-only — XLA:CPU's scalar
    int8->f32 converts roughly double the CPU-mesh test tier's runtime,
    and on CPU bandwidth is not the bottleneck.  The sampled-missing path
    keeps float Y in the state (it is rewritten in place each sweep)."""
    if Y_fixed is None or jax.default_backend() != 'tpu':
        return Y_fixed
    return Y_fixed.astype(jnp.int8)


def make_lsm_sweep(Y_fixed, miss_mask, intercept_prior, cfg: SweepConfig,
                   cc_static=None):
    """Build the LSM sweep.  ``Y_fixed`` is the imputed network (used when no
    missing dyads are resampled); ``miss_mask`` the boolean missing-dyad
    tensor or None; ``cc_static`` the fixed case-control edge structure
    (in_edges / out_edges / degrees device arrays) when enabled."""
    intercept_prior = jnp.asarray(intercept_prior)
    Y_fixed = _int8_adjacency(Y_fixed)
    use_cc = cc_static is not None

    def sweep(state: LSMState, it_hint=None) -> LSMState:
        it_next = state.it + 1
        Y = state.Y if cfg.sample_missing else Y_fixed
        keys = jax.random.split(state.key, 7)

        # 0. case-control control-node refresh
        if use_cc:
            cc, ctrl_in, ctrl_out = _cc_structures(cfg, keys[4], state,
                                                    Y, cc_static, it_hint)
        else:
            ctrl_in = ctrl_out = None
            cc = None

        # 1. latent positions
        X, acc_new = sample_latent_positions(
            keys[0], Y, state.X, state.intercept, state.step_X,
            radii=state.radii, tau_sq=cfg.tau_sq, sigma_sq=cfg.sigma_sq,
            cc=cc, is_directed=cfg.is_directed, mixture=False,
            scheme=cfg.latent_update, temper=state.temper)
        acc_X = state.acc_X + acc_new

        # 2. Procrustes toward the burn-phase MAP (reference lsm.py:495-498)
        X_rot, _ = longitudinal_procrustes_rotation(state.X_ref, X)
        X = jnp.where(it_next > cfg.n_burn, X_rot, X)

        # 3. center across time (lsm.py:501)
        if cfg.center:
            X = X - jnp.mean(X, axis=(0, 1))

        # 4. cached distances — skipped under case-control (lsm.py:504-505)
        # and when the fused Pallas pair kernel evaluates the intercept MH
        # directly from X (nothing else in the sweep needs them then)
        fused = _fused_pair_ok(cfg, X.shape[1])
        skip_dist = (use_cc and not cfg.sample_missing) or fused
        dist = None if skip_dist else pairwise_distances(X)

        # 5. intercept
        if cfg.is_directed:
            intercept, acc_i, net_ll = sample_intercepts_directed(
                keys[1], Y, dist, state.intercept, state.radii,
                state.step_int, intercept_prior, cfg.intercept_variance_prior,
                X=X, cc=cc, temper=state.temper)
        else:
            intercept, acc_i, net_ll = sample_intercept_undirected(
                keys[1], Y, dist, state.intercept, state.step_int[0],
                intercept_prior[0], cfg.intercept_variance_prior, X=X,
                cc=cc, temper=state.temper)
        acc_int = state.acc_int + acc_i

        # 6. radii (directed)
        if cfg.is_directed:
            radii, acc_r, net_ll = sample_radii(keys[2], Y, dist, intercept,
                                                state.radii, state.step_radii,
                                                X=X, cc=cc, loglik_cur=net_ll,
                                                temper=state.temper)
            acc_radii = state.acc_radii + acc_r
        else:
            radii, acc_radii = None, None

        # 7. missing dyads
        missing_sum = state.missing_sum
        if cfg.sample_missing:
            net_ll = None  # Y is resampled below; the cached value is stale
            Y = _resample_missing(cfg, keys[3], Y, dist, intercept, radii,
                                  miss_mask, temper=state.temper)
            missing_sum = missing_sum + jnp.where(
                it_next > cfg.n_burn, jnp.where(miss_mask, Y, 0.0), 0.0)

        # 8. log joint + MAP tracking (lsm.py:547-566)
        logp = _lsm_logp(cfg, Y, X, intercept, radii, dist, intercept_prior,
                         cc=cc, net_ll=net_ll)
        reset = jnp.logical_and(cfg.tune > 0, it_next == cfg.n_burn)
        better = jnp.logical_or(reset, logp > state.logp_map)
        logp_map = jnp.where(better, logp, state.logp_map)
        X_map = jnp.where(better, X, state.X_map)
        intercept_map = jnp.where(better, intercept, state.intercept_map)
        radii_map = (jnp.where(better, radii, state.radii_map)
                     if cfg.is_directed else None)

        # Procrustes reference: best sample over iterations <= n_burn
        ref_better = jnp.logical_and(it_next <= cfg.n_burn,
                                     logp > state.logp_ref)
        logp_ref = jnp.where(ref_better, logp, state.logp_ref)
        X_ref = jnp.where(ref_better, X, state.X_ref)

        # step-size adaptation
        step_X, acc_X = maybe_tune(state.it, cfg.tune, cfg.tune_interval,
                                   state.step_X, acc_X,
                                   kind=('mala' if cfg.latent_update == 'mala'
                                         else 'random_walk'))
        step_int, acc_int = maybe_tune(state.it, cfg.tune, cfg.tune_interval,
                                       state.step_int, acc_int)
        if cfg.is_directed and cfg.tune_radii:
            step_radii, acc_radii = maybe_tune(
                state.it, cfg.tune, cfg.tune_interval,
                state.step_radii, acc_radii, kind='dirichlet')
        else:
            step_radii = state.step_radii

        return LSMState(
            key=keys[6], it=it_next, X=X, intercept=intercept, radii=radii,
            Y=Y if cfg.sample_missing else None,
            step_X=step_X, acc_X=acc_X, step_int=step_int, acc_int=acc_int,
            step_radii=step_radii, acc_radii=acc_radii,
            logp=logp, logp_map=logp_map, X_map=X_map,
            intercept_map=intercept_map, radii_map=radii_map,
            logp_ref=logp_ref, X_ref=X_ref, missing_sum=missing_sum,
            ctrl_in=ctrl_in, ctrl_out=ctrl_out, temper=state.temper,
            acc_swap=state.acc_swap)

    return sweep


# ---------------------------------------------------------------------------
# mixture logp terms shared by LPCM / HDP
# ---------------------------------------------------------------------------

def _mixture_common_logp(cfg, Y, X, intercept, radii, dist, z, mu, sigma,
                         lmbda, mean_var, b_scale, intercept_prior, cc=None,
                         net_ll=None, resp=None):
    """Network + latent + cluster-parameter + hyper-prior terms shared by the
    LPCM and HDP-LPCM log joints (reference lpcm.py:789-855 /
    hdp_lpcm.py:1213-1278).  ``net_ll`` reuses an already-computed network
    log-likelihood at the current state (one fewer dense pass)."""
    n = X.shape[1]
    ll = (net_ll if net_ll is not None else
          _network_loglik(cfg, Y, dist, intercept, radii, X=X, cc=cc))

    diff = intercept - intercept_prior
    ll -= jnp.sum(0.5 * diff * diff / cfg.intercept_variance_prior)

    ll += _latent_mixture_loglik(X, z, mu, sigma, lmbda, resp=resp)

    # cluster means prior
    ll -= 0.5 * jnp.sum(mu * mu) / mean_var
    # cluster variances prior terms evaluated at assigned components
    sig_z = (jnp.einsum('tnk,k->tn', resp, sigma, precision='highest')
             if resp is not None else sigma[z])
    ll += jnp.sum(-(0.5 * cfg.a + 1.0) * jnp.log(sig_z)
                  - 0.5 * b_scale / sig_z)
    # lambda truncated-normal prior
    ll += truncated_normal_logpdf(lmbda, cfg.lambda_prior,
                                  cfg.lambda_variance_prior)
    # radii Dirichlet(1) prior normalising constant
    if cfg.is_directed:
        ll += dirichlet_logpdf(radii, jnp.ones(n))
    # hyper-prior log densities
    if cfg.a0 is not None:
        ll += (-(0.5 * cfg.a0 + 1.0) * jnp.log(mean_var)
               - 0.5 * cfg.b0 / mean_var)
    if cfg.c0 is not None:
        ll += (cfg.c0 - 1.0) * jnp.log(b_scale) - cfg.d0 * b_scale
    return ll


def lpcm_logp_at_state(cfg, Y, intercept_prior, X, intercept, radii, z, mu,
                       sigma, lmbda, init_weights, trans_weights, mean_var,
                       b_scale, cc=None):
    """Full LPCM log joint at an arbitrary state — used for the stored
    initial-sample logp, which the reference also records (lpcm.py:489).

    ``cc``: case-control structures; when given the network term uses the
    same approximate estimator as the in-sweep trace logps (the reference's
    ``logp`` switches the same way, lsm.py:581-591)."""
    K = cfg.n_components
    T = X.shape[0]
    n_trans, nk, resp = _label_statistics(z, K)
    dist = pairwise_distances(X)
    logp = dirichlet_logpdf(init_weights,
                            jnp.full((K,), cfg.dirichlet_prior))
    logp += jnp.sum(dirichlet_logpdf(
        trans_weights, jnp.full((K, K), cfg.dirichlet_prior)))
    w_stack = jnp.broadcast_to(trans_weights, (T, K, K))
    logp += _count_chain_loglik(n_trans, nk, init_weights, w_stack)
    logp += _mixture_common_logp(
        cfg, Y, X, intercept, radii, dist, z, mu, sigma, lmbda,
        mean_var, b_scale, intercept_prior, cc=cc, resp=resp)
    return logp


def hdp_logp_at_state(cfg, Y, intercept_prior, X, intercept, radii, z, mu,
                      sigma, lmbda, weights, beta, gamma, alpha_init, alpha,
                      kappa, mean_var, b_scale, cc=None):
    """Full HDP-LPCM log joint at an arbitrary state — used for the stored
    initial-sample logp, which the reference also records
    (hdp_lpcm.py:798-809).

    ``cc``: case-control structures; when given the network term uses the
    same approximate estimator as the in-sweep trace logps."""
    K = cfg.n_components
    T = X.shape[0]
    n_trans, nk, resp = _label_statistics(z, K)
    dist = pairwise_distances(X)
    w0 = weights[0, 0]
    logp = dirichlet_logpdf(beta, jnp.full((K,), gamma / K))
    logp += dirichlet_logpdf(w0, alpha_init * beta)
    conc_w = alpha * beta[None, None, :] + kappa * jnp.eye(K)[None]
    logp += jnp.sum(dirichlet_logpdf(
        weights[1:], jnp.broadcast_to(conc_w, (T - 1, K, K))))
    logp += _count_chain_loglik(n_trans, nk, w0, weights)
    logp += _mixture_common_logp(
        cfg, Y, X, intercept, radii, dist, z, mu, sigma, lmbda,
        mean_var, b_scale, intercept_prior, cc=cc, resp=resp)
    return logp


def _finish_tuning(cfg, state, acc_X, acc_int, acc_radii):
    step_X, acc_X = maybe_tune(state.it, cfg.tune, cfg.tune_interval,
                               state.step_X, acc_X,
                               kind=('mala' if cfg.latent_update == 'mala'
                                     else 'random_walk'))
    step_int, acc_int = maybe_tune(state.it, cfg.tune, cfg.tune_interval,
                                   state.step_int, acc_int)
    if cfg.is_directed and cfg.tune_radii:
        step_radii, acc_radii = maybe_tune(
            state.it, cfg.tune, cfg.tune_interval,
            state.step_radii, acc_radii, kind='dirichlet')
    else:
        step_radii = state.step_radii
    return step_X, acc_X, step_int, acc_int, step_radii, acc_radii


# ---------------------------------------------------------------------------
# LPCM sweep
# ---------------------------------------------------------------------------

def make_lpcm_sweep(Y_fixed, miss_mask, intercept_prior, cfg: SweepConfig,
                    cc_static=None):
    """Finite-K LPCM sweep (reference lpcm.py:514-701)."""
    intercept_prior = jnp.asarray(intercept_prior)
    Y_fixed = _int8_adjacency(Y_fixed)
    K = cfg.n_components
    use_cc = cc_static is not None

    def sweep(state: MixtureState, it_hint=None) -> MixtureState:
        it_next = state.it + 1
        Y = state.Y if cfg.sample_missing else Y_fixed
        keys = jax.random.split(state.key, 14)

        if use_cc:
            cc, ctrl_in, ctrl_out = _cc_structures(cfg, keys[13], state,
                                                    Y, cc_static, it_hint)
        else:
            ctrl_in = ctrl_out = None
            cc = None

        # latent positions (mixture prior)
        X, acc_new = sample_latent_positions(
            keys[0], Y, state.X, state.intercept, state.step_X,
            radii=state.radii, mu=state.mu, sigma=state.sigma,
            lmbda=state.lmbda, z=state.z, cc=cc,
            is_directed=cfg.is_directed, mixture=True,
            scheme=cfg.latent_update, temper=state.temper)
        acc_X = state.acc_X + acc_new
        if cfg.center:
            X = X - jnp.mean(X, axis=(0, 1))
        fused = _fused_pair_ok(cfg, X.shape[1])
        skip_dist = (use_cc and not cfg.sample_missing) or fused
        dist = None if skip_dist else pairwise_distances(X)

        # intercept + radii
        if cfg.is_directed:
            intercept, acc_i, net_ll = sample_intercepts_directed(
                keys[1], Y, dist, state.intercept, state.radii,
                state.step_int, intercept_prior, cfg.intercept_variance_prior,
                X=X, cc=cc, temper=state.temper)
        else:
            intercept, acc_i, net_ll = sample_intercept_undirected(
                keys[1], Y, dist, state.intercept, state.step_int[0],
                intercept_prior[0], cfg.intercept_variance_prior, X=X,
                cc=cc, temper=state.temper)
        acc_int = state.acc_int + acc_i
        if cfg.is_directed:
            radii, acc_r, net_ll = sample_radii(keys[2], Y, dist, intercept,
                                                state.radii, state.step_radii,
                                                X=X, cc=cc, loglik_cur=net_ll,
                                                temper=state.temper)
            acc_radii = state.acc_radii + acc_r
        else:
            radii, acc_radii = None, None

        # labels via blocked FFBS (lpcm.py:567-570)
        z, n_trans, nk, resp = sample_labels_block_lpcm(
            keys[3], X, state.mu, state.sigma, state.lmbda,
            state.init_weights, state.trans_weights)

        # weights (lpcm.py:572-579)
        init_weights = sample_dirichlet(
            keys[4], cfg.dirichlet_prior + nk[0])
        trans_counts = jnp.sum(n_trans[1:], axis=0)      # (K, K)
        trans_weights = sample_dirichlet(
            keys[5], cfg.dirichlet_prior + trans_counts)

        # conjugate blocks
        mu = sample_cluster_means(keys[6], X, resp, nk, state.sigma,
                                  state.lmbda, state.mean_var)
        sigma = sample_cluster_variances(keys[7], X, resp, nk, mu,
                                         state.lmbda, cfg.a, state.b_scale)
        lmbda = sample_lambda(keys[8], X, z, mu, sigma,
                              cfg.lambda_prior, cfg.lambda_variance_prior,
                              resp=resp)

        # hyper-priors
        mean_var = state.mean_var
        if cfg.a0 is not None:
            mean_var = sample_mean_variance_hyper(keys[9], mu, cfg.a0, cfg.b0)
        b_scale = state.b_scale
        if cfg.c0 is not None:
            b_scale = sample_sigma_scale_hyper(keys[10], sigma, cfg.a,
                                               cfg.c0, cfg.d0)

        # missing dyads
        missing_sum = state.missing_sum
        if cfg.sample_missing:
            net_ll = None  # Y is resampled below; the cached value is stale
            Y = _resample_missing(cfg, keys[11], Y, dist, intercept, radii,
                                  miss_mask, temper=state.temper)
            missing_sum = missing_sum + jnp.where(
                it_next > cfg.n_burn, jnp.where(miss_mask, Y, 0.0), 0.0)

        # log joint (lpcm.py:770-856)
        logp = dirichlet_logpdf(init_weights,
                                jnp.full((K,), cfg.dirichlet_prior))
        logp += jnp.sum(dirichlet_logpdf(
            trans_weights, jnp.full((K, K), cfg.dirichlet_prior)))
        w_stack = jnp.broadcast_to(trans_weights, (X.shape[0], K, K))
        logp += _count_chain_loglik(n_trans, nk, init_weights, w_stack)
        logp += _mixture_common_logp(
            cfg, Y, X, intercept, radii, dist, z, mu, sigma, lmbda,
            mean_var, b_scale, intercept_prior, cc=cc, net_ll=net_ll,
            resp=resp)

        step_X, acc_X, step_int, acc_int, step_radii, acc_radii = (
            _finish_tuning(cfg, state, acc_X, acc_int, acc_radii))

        return state._replace(
            key=keys[12], it=it_next, X=X, intercept=intercept, radii=radii,
            Y=Y if cfg.sample_missing else None, z=z, mu=mu, sigma=sigma,
            lmbda=lmbda, init_weights=init_weights,
            trans_weights=trans_weights, mean_var=mean_var, b_scale=b_scale,
            step_X=step_X, acc_X=acc_X, step_int=step_int, acc_int=acc_int,
            step_radii=step_radii, acc_radii=acc_radii, logp=logp,
            missing_sum=missing_sum, ctrl_in=ctrl_in, ctrl_out=ctrl_out)

    return sweep


# ---------------------------------------------------------------------------
# HDP-LPCM sweep
# ---------------------------------------------------------------------------

def make_hdp_sweep(Y_fixed, miss_mask, intercept_prior, cfg: SweepConfig,
                   cc_static=None):
    """Sticky HDP-LPCM sweep (reference hdp_lpcm.py:823-1069)."""
    intercept_prior = jnp.asarray(intercept_prior)
    Y_fixed = _int8_adjacency(Y_fixed)
    K = cfg.n_components
    use_cc = cc_static is not None

    def sweep(state: MixtureState, it_hint=None) -> MixtureState:
        it_next = state.it + 1
        Y = state.Y if cfg.sample_missing else Y_fixed
        T = state.X.shape[0]
        n = state.X.shape[1]
        keys = jax.random.split(state.key, 20)

        if use_cc:
            cc, ctrl_in, ctrl_out = _cc_structures(cfg, keys[18], state,
                                                    Y, cc_static, it_hint)
        else:
            ctrl_in = ctrl_out = None
            cc = None

        # latent positions (mixture prior)
        X, acc_new = sample_latent_positions(
            keys[0], Y, state.X, state.intercept, state.step_X,
            radii=state.radii, mu=state.mu, sigma=state.sigma,
            lmbda=state.lmbda, z=state.z, cc=cc,
            is_directed=cfg.is_directed, mixture=True,
            scheme=cfg.latent_update, temper=state.temper)
        acc_X = state.acc_X + acc_new
        if cfg.center:
            X = X - jnp.mean(X, axis=(0, 1))
        fused = _fused_pair_ok(cfg, X.shape[1])
        skip_dist = (use_cc and not cfg.sample_missing) or fused
        dist = None if skip_dist else pairwise_distances(X)

        # intercept + radii
        if cfg.is_directed:
            intercept, acc_i, net_ll = sample_intercepts_directed(
                keys[1], Y, dist, state.intercept, state.radii,
                state.step_int, intercept_prior, cfg.intercept_variance_prior,
                X=X, cc=cc, temper=state.temper)
        else:
            intercept, acc_i, net_ll = sample_intercept_undirected(
                keys[1], Y, dist, state.intercept, state.step_int[0],
                intercept_prior[0], cfg.intercept_variance_prior, X=X,
                cc=cc, temper=state.temper)
        acc_int = state.acc_int + acc_i
        if cfg.is_directed:
            radii, acc_r, net_ll = sample_radii(keys[2], Y, dist, intercept,
                                                state.radii, state.step_radii,
                                                X=X, cc=cc, loglik_cur=net_ll,
                                                temper=state.temper)
            acc_radii = state.acc_radii + acc_r
        else:
            radii, acc_radii = None, None

        # blocked label sampling (hdp_lpcm.py:877)
        z, n_trans, nk, resp = sample_labels_block(
            keys[3], X, state.mu, state.sigma, state.lmbda, state.weights)

        # CRF auxiliary variables (hdp_lpcm.py:881-884)
        m = sample_tables(keys[4], n_trans, state.beta, state.alpha_init,
                          state.alpha, state.kappa, n_max=n,
                          cap=cfg.table_cap)
        m_bar, w_override = sample_mbar(keys[5], m, state.beta,
                                        state.kappa, state.alpha, n_max=n,
                                        cap=cfg.table_cap)

        # global stick weights beta (hdp_lpcm.py:887)
        beta = sample_dirichlet(keys[6], (state.gamma / K) + m_bar)

        # initial + transition distributions (hdp_lpcm.py:890-898)
        w0 = sample_dirichlet(keys[7], state.alpha_init * beta + nk[0])
        conc_t = (state.alpha * beta[None, None, :]
                  + state.kappa * jnp.eye(K)[None]
                  + n_trans[1:])                          # (T-1, K, K)
        w_rest = sample_dirichlet(keys[8], conc_t)
        w_first = jnp.zeros((K, K), X.dtype).at[0].set(w0)
        weights = jnp.concatenate([w_first[None], w_rest], axis=0)

        # conjugate cluster blocks (hdp_lpcm.py:901-954)
        mu = sample_cluster_means(keys[9], X, resp, nk, state.sigma,
                                  state.lmbda, state.mean_var)
        sigma = sample_cluster_variances(keys[10], X, resp, nk, mu,
                                         state.lmbda, cfg.a, state.b_scale)
        lmbda = sample_lambda(keys[11], X, z, mu, sigma,
                              cfg.lambda_prior, cfg.lambda_variance_prior,
                              resp=resp)

        # hyper-priors (hdp_lpcm.py:957-972)
        mean_var = state.mean_var
        if cfg.a0 is not None:
            mean_var = sample_mean_variance_hyper(keys[12], mu, cfg.a0, cfg.b0)
        b_scale = state.b_scale
        if cfg.c0 is not None:
            b_scale = sample_sigma_scale_hyper(keys[13], sigma, cfg.a,
                                               cfg.c0, cfg.d0)

        # concentration parameters (hdp_lpcm.py:977-1023)
        if cfg.sample_concentrations:
            gamma = sample_concentration_param(
                keys[14], state.gamma,
                n_clusters=jnp.sum(m_bar > 0).astype(X.dtype),
                n_samples=jnp.clip(jnp.sum(m_bar), 1.0, None),
                prior_shape=cfg.gamma_prior_shape,
                prior_rate=cfg.gamma_prior_rate)
            alpha_init = sample_concentration_param(
                keys[15], state.alpha_init,
                n_clusters=jnp.sum(m[0, 0]),
                n_samples=jnp.asarray(float(n)),
                prior_shape=cfg.alpha_init_shape,
                prior_rate=cfg.alpha_init_rate)
            alpha, kappa = sample_alpha_kappa_rho(
                keys[16], n_trans, m, w_override, state.alpha, state.kappa,
                cfg.alpha_kappa_shape, cfg.alpha_kappa_rate)
        else:
            gamma, alpha_init = state.gamma, state.alpha_init
            alpha, kappa = state.alpha, state.kappa

        # missing dyads
        missing_sum = state.missing_sum
        if cfg.sample_missing:
            net_ll = None  # Y is resampled below; the cached value is stale
            Y = _resample_missing(cfg, keys[17], Y, dist, intercept, radii,
                                  miss_mask, temper=state.temper)
            missing_sum = missing_sum + jnp.where(
                it_next > cfg.n_burn, jnp.where(miss_mask, Y, 0.0), 0.0)

        # log joint (hdp_lpcm.py:1188-1280)
        logp = dirichlet_logpdf(beta, jnp.full((K,), gamma / K))
        logp += dirichlet_logpdf(w0, alpha_init * beta)
        conc_w = alpha * beta[None, None, :] + kappa * jnp.eye(K)[None]
        logp += jnp.sum(dirichlet_logpdf(
            weights[1:], jnp.broadcast_to(conc_w, (T - 1, K, K))))
        logp += _count_chain_loglik(n_trans, nk, w0, weights)
        logp += _mixture_common_logp(
            cfg, Y, X, intercept, radii, dist, z, mu, sigma, lmbda,
            mean_var, b_scale, intercept_prior, cc=cc, net_ll=net_ll,
            resp=resp)

        step_X, acc_X, step_int, acc_int, step_radii, acc_radii = (
            _finish_tuning(cfg, state, acc_X, acc_int, acc_radii))

        return state._replace(
            key=keys[19], it=it_next, X=X, intercept=intercept, radii=radii,
            Y=Y if cfg.sample_missing else None, z=z, mu=mu, sigma=sigma,
            lmbda=lmbda, weights=weights, beta=beta, gamma=gamma,
            alpha_init=alpha_init, alpha=alpha, kappa=kappa,
            mean_var=mean_var, b_scale=b_scale,
            step_X=step_X, acc_X=acc_X, step_int=step_int, acc_int=acc_int,
            step_radii=step_radii, acc_radii=acc_radii, logp=logp,
            missing_sum=missing_sum, ctrl_in=ctrl_in, ctrl_out=ctrl_out)

    return sweep
