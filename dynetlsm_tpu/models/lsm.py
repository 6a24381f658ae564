"""Dynamic latent space model (Sewell & Chen 2015), TPU-native sampler.

Public API mirrors the reference ``DynamicNetworkLSM`` (reference
lsm.py:100-625): same constructor keywords, ``.fit(Y)``, and fitted
attributes (``X_``, ``intercept_``, ``radii_``, ``Xs_``, ``logps_``,
``probas_``, ``auc_``, ...).  New TPU-specific arguments:

* ``n_chains`` — number of vmapped parallel MCMC chains,
* ``devices`` — devices for the 1-D ``chains`` mesh (default: all),
* ``trace_chunk`` — scan chunk length between device->host trace offloads.

With ``n_chains == 1`` trace attributes match the reference layout
(``Xs_[i]`` is sample i); with more chains they gain a leading chain axis.
"""
import numpy as np
import jax
import jax.numpy as jnp

from ..config import DTYPE
from ..array_utils import diag_indices_from_3d
from ..math.init import (
    generalized_mds, initialize_radii,
    scale_intercept_mle, directed_intercept_mle)
from ..mcmc.states import LSMState
from ..mcmc.sweeps import SweepConfig, make_lsm_sweep, _lsm_logp
from ..mcmc.driver import (
    shard_state, shard_state_spatial, shard_network_spatial,
    replicate_state, make_scan_runner, collect_traces,
    state_shardings_of)
from ..metrics import network_auc
from ..ops.distances import pairwise_distances
from ..ops.likelihoods import (
    undirected_network_probas, directed_network_probas)
from .base import (
    validate_network, to_device_f32, chain_traces_to_numpy, total_iterations,
    build_case_control, init_cc_dict, resolve_n_control, resolve_fit_mesh,
    setup_tempering, strip_hot_slots, cold_slot_trace_fn)

__all__ = ['DynamicNetworkLSM']


class DynamicNetworkLSM:
    """Dynamic latent space model with a Gaussian random-walk prior on the
    latent positions (reference lsm.py:100-317 API surface).

    Examples
    --------
    Fit the undirected Sampson monastery network (the reference runs the
    same fit as a docstring integration test, reference lsm.py:218-223):

    >>> from dynetlsm_tpu import DynamicNetworkLSM
    >>> from dynetlsm_tpu.datasets import load_monks
    >>> Y, labels, names = load_monks(is_directed=False)
    >>> model = DynamicNetworkLSM(n_iter=100, tune=50, burn=50,
    ...                           random_state=42).fit(Y)
    >>> model.X_.shape
    (3, 18, 2)
    >>> bool(model.auc_ > 0.5)
    True
    """

    def __init__(self,
                 n_features=2,
                 is_directed=False,
                 n_iter=5000,
                 tune=2500,
                 tune_interval=100,
                 burn=2500,
                 intercept_prior='auto',
                 intercept_variance_prior=2.0,
                 tau_sq=2.0,
                 sigma_sq=0.1,
                 step_size_X=0.1,
                 step_size_intercept=0.1,
                 step_size_radii=175000,
                 n_control=None,
                 n_resample_control=100,
                 copy=True,
                 random_state=None,
                 n_chains=1,
                 devices=None,
                 node_devices=1,
                 trace_chunk=512,
                 checkpoint_dir=None,
                 latent_update='exact',
                 n_temps=1,
                 beta_min=0.1,
                 swap_every=1,
                 verbose=False):
        self.n_iter = n_iter
        self.is_directed = is_directed
        self.n_features = n_features
        self.tau_sq = tau_sq
        self.sigma_sq = sigma_sq
        self.step_size_X = step_size_X
        self.intercept_prior = intercept_prior
        self.intercept_variance_prior = intercept_variance_prior
        self.step_size_intercept = step_size_intercept
        self.step_size_radii = step_size_radii
        self.tune = tune
        self.tune_interval = tune_interval
        self.burn = burn
        self.n_control = n_control
        self.n_resample_control = n_resample_control
        self.copy = copy
        self.random_state = random_state
        self.n_chains = n_chains
        self.devices = devices
        self.node_devices = node_devices
        self.trace_chunk = trace_chunk
        self.checkpoint_dir = checkpoint_dir
        self.latent_update = latent_update
        self.n_temps = n_temps
        self.beta_min = beta_min
        self.swap_every = swap_every
        self.verbose = verbose

    # ------------------------------------------------------------------ api

    @property
    def n_burn_(self):
        n_burn = 0
        if self.burn is not None:
            n_burn += self.burn
        if self.tune is not None:
            n_burn += self.tune
        return n_burn

    @property
    def distances_(self):
        if not hasattr(self, 'X_'):
            raise ValueError('Model not fit.')
        return np.asarray(pairwise_distances(to_device_f32(self.X_)))

    @property
    def probas_(self):
        if not hasattr(self, 'X_'):
            raise ValueError('Model not fit.')
        dist = to_device_f32(self.distances_)
        if self.is_directed:
            probas = directed_network_probas(
                dist, to_device_f32(self.radii_),
                float(self.intercept_[0]), float(self.intercept_[1]))
        else:
            probas = undirected_network_probas(dist, float(self.intercept_[0]))
        probas = np.asarray(probas, dtype=np.float64)
        probas[diag_indices_from_3d(probas)] = 0.0
        return probas

    @property
    def auc_(self):
        if not hasattr(self, 'X_'):
            raise ValueError('Model not fit.')
        return network_auc(self.Y_fit_, self.probas_,
                           is_directed=self.is_directed)

    # ------------------------------------------------------------------ fit

    def fit(self, Y):
        """Run the Metropolis-within-Gibbs sampler on a dynamic network Y of
        shape (n_time_steps, n_nodes, n_nodes); missing dyads coded -1."""
        rng = np.random.RandomState(
            self.random_state if isinstance(self.random_state, (int, np.integer))
            else None)

        Y, nan_mask, miss_mask, sample_missing = validate_network(
            Y, self.is_directed, copy=self.copy)
        self.nan_mask_ = nan_mask
        T, n, _ = Y.shape

        # resolve the mesh first: this validates the node_devices
        # configuration before any expensive initialisation work, and
        # under node sharding the network must be placed row-sharded
        # before the sweep factory closes over it
        n_slots = self.n_chains * max(1, int(self.n_temps or 1))
        mesh, spatial = resolve_fit_mesh(n_slots, n,
                                         self.node_devices,
                                         self.devices,
                                         self.latent_update,
                                         n_temps=self.n_temps)

        if sample_missing:
            self.Y_fit_ = SimpleNetworkImputerLocal(Y)
        else:
            self.Y_fit_ = Y

        # ---- host-side initialisation (reference lsm.py:386-417)
        X = generalized_mds(self.Y_fit_, n_features=self.n_features,
                            is_directed=self.is_directed, random_state=rng)
        if self.is_directed:
            radii = initialize_radii(self.Y_fit_)
            b_in, b_out = directed_intercept_mle(self.Y_fit_, X, radii)
            intercept = np.array([b_in, b_out])
        else:
            radii = None
            scale, b = scale_intercept_mle(self.Y_fit_, X)
            intercept = np.array([b])
            X = X * np.exp(scale)
        X = X - X.mean(axis=(0, 1))

        tau_sq = self.tau_sq
        if tau_sq == 'auto':
            tau_sq = float(np.mean(X[0] * X[0]))
        self.tau_sq_ = tau_sq

        intercept_prior = self.intercept_prior
        if isinstance(intercept_prior, str) and intercept_prior == 'auto':
            intercept_prior = intercept.copy()
        intercept_prior = np.broadcast_to(
            np.asarray(intercept_prior, dtype=np.float64), intercept.shape)
        self.intercept_prior_ = np.asarray(intercept_prior)

        cfg = SweepConfig(
            is_directed=self.is_directed,
            sample_missing=sample_missing,
            tune=int(self.tune or 0),
            tune_interval=self.tune_interval,
            n_burn=self.n_burn_,
            tau_sq=float(tau_sq),
            sigma_sq=float(self.sigma_sq),
            intercept_variance_prior=float(self.intercept_variance_prior),
            tune_radii=False,
            n_control=resolve_n_control(self.n_control, n),
            n_resample_control=self.n_resample_control,
            latent_update=self.latent_update,
            spatial=spatial)
        self._cfg = cfg

        Y_dev = to_device_f32(self.Y_fit_)
        if spatial:
            Y_dev = shard_network_spatial(Y_dev, mesh)
        miss_dev = jnp.asarray(miss_mask) if sample_missing else None
        if spatial and miss_dev is not None:
            miss_dev = shard_network_spatial(miss_dev, mesh)
        cc_static, ctrl0 = build_case_control(
            cfg, Y_dev, self.Y_fit_, rng, miss_mask=miss_mask)
        sweep = make_lsm_sweep(None if sample_missing else Y_dev,
                               miss_dev, intercept_prior.astype(DTYPE), cfg,
                               cc_static=cc_static)

        # ---- initial state
        X0 = to_device_f32(X)
        b0 = to_device_f32(intercept)
        r0 = to_device_f32(radii) if self.is_directed else None

        # one jitted program (not ~15 eager dispatches) for the initial logp;
        # under case-control it uses the same approximate network estimator
        # as the in-sweep trace logps (the reference's logp switches the
        # same way, lsm.py:581-591)
        cc0 = init_cc_dict(cfg, Y_dev, cc_static, ctrl0)

        @jax.jit
        def _init_logp(Yd, Xd, bd, rd, prior):
            return _lsm_logp(cfg, Yd, Xd, bd, rd, pairwise_distances(Xd),
                             prior, cc=cc0)

        logp0 = _init_logp(Y_dev, X0, b0, r0,
                           to_device_f32(intercept_prior))
        state0 = LSMState(
            key=jax.random.PRNGKey(rng.randint(0, 2**31 - 1)),
            it=np.zeros((), np.int32),
            X=X0, intercept=b0, radii=r0,
            Y=Y_dev if sample_missing else None,
            step_X=np.full((T, n), float(self.step_size_X), DTYPE),
            acc_X=np.zeros((T, n), DTYPE),
            step_int=np.full(intercept.shape, float(self.step_size_intercept),
                              DTYPE),
            acc_int=np.zeros(intercept.shape, DTYPE),
            step_radii=(np.asarray(float(self.step_size_radii), DTYPE)
                        if self.is_directed else None),
            acc_radii=(np.zeros((), DTYPE) if self.is_directed else None),
            logp=logp0, logp_map=logp0, X_map=X0, intercept_map=b0,
            radii_map=r0, logp_ref=logp0, X_ref=X0,
            missing_sum=(np.zeros((T, n, n), DTYPE) if sample_missing
                         else None),
            ctrl_in=ctrl0[0] if ctrl0 else None,
            ctrl_out=ctrl0[1] if ctrl0 else None)

        # ---- chains + mesh
        state = replicate_state(state0, n_slots,
                                jax.random.PRNGKey(rng.randint(0, 2**31 - 1)))
        step_fn, multi_chain, state = setup_tempering(
            sweep, cfg, None if sample_missing else Y_dev, self.n_chains,
            self.n_temps, self.beta_min, self.swap_every, state)
        if mesh is not None:
            state = (shard_state_spatial(state, mesh) if spatial
                     else shard_state(state, mesh))
        self.mesh_ = mesh

        def trace_fn(s):
            out = {'X': s.X, 'intercept': s.intercept, 'logp': s.logp}
            if self.is_directed:
                out['radii'] = s.radii
            return out

        runner = make_scan_runner(step_fn,
                                  cold_slot_trace_fn(trace_fn,
                                                     self.n_temps),
                                  chunk=self.trace_chunk,
                                  multi_chain=multi_chain,
                                  state_shardings=(
                                      state_shardings_of(state)
                                      if mesh is not None else None))
        n_total = total_iterations(self.n_iter, self.tune, self.burn)
        state, traces = collect_traces(runner, state, n_total - 1,
                                       chunk=self.trace_chunk,
                                       checkpoint_dir=self.checkpoint_dir,
                                       progress=_progress(self.verbose),
                                       mesh=mesh)
        self.state_sharding_ = getattr(state.X, 'sharding', None)
        state, self.temper_ladder_ = strip_hot_slots(state,
                                                     self.n_temps)
        self._final_state = jax.tree.map(np.asarray, state)

        # ---- assemble reference-style traces (sample 0 = the init draw)
        tr = chain_traces_to_numpy(traces, self.n_chains)
        if self.n_chains == 1:
            self.Xs_ = np.concatenate([X[None].astype(np.float64),
                                       tr['X'].astype(np.float64)])
            self.intercepts_ = np.concatenate(
                [intercept[None], tr['intercept'].astype(np.float64)])
            self.logps_ = np.concatenate(
                [[float(logp0)], tr['logp'].astype(np.float64)])
            if self.is_directed:
                self.radiis_ = np.concatenate(
                    [radii[None], tr['radii'].astype(np.float64)])
        else:
            c = self.n_chains
            self.Xs_ = np.concatenate(
                [np.broadcast_to(X, (c, 1) + X.shape).astype(np.float64),
                 tr['X'].astype(np.float64)], axis=1)
            self.intercepts_ = np.concatenate(
                [np.broadcast_to(intercept, (c, 1) + intercept.shape),
                 tr['intercept'].astype(np.float64)], axis=1)
            self.logps_ = np.concatenate(
                [np.full((c, 1), float(logp0)),
                 tr['logp'].astype(np.float64)], axis=1)
            if self.is_directed:
                self.radiis_ = np.concatenate(
                    [np.broadcast_to(radii, (c, 1) + radii.shape),
                     tr['radii'].astype(np.float64)], axis=1)

        # ---- multichain convergence diagnostics on the log joint
        # (mirrors the mixture models' logp_rhat_/logp_effective_n_)
        if self.n_chains > 1:
            from ..diagnostics import (
                potential_scale_reduction, multichain_effective_n)
            post = self.logps_[:, self.n_burn_:]
            if post.shape[1] > 2:
                self.logp_rhat_ = potential_scale_reduction(post)
                self.logp_effective_n_ = multichain_effective_n(post)

        # ---- MAP estimates from the tracked maxima (lsm.py:547-566)
        fs = self._final_state
        best_chain = int(np.argmax(fs.logp_map))
        self.logp_ = float(fs.logp_map[best_chain])
        self.X_ = np.asarray(fs.X_map[best_chain], dtype=np.float64)
        self.intercept_ = np.asarray(fs.intercept_map[best_chain],
                                     dtype=np.float64)
        if self.is_directed:
            self.radii_ = np.asarray(fs.radii_map[best_chain],
                                     dtype=np.float64)
        if sample_missing:
            denom = max(n_total - 1 - self.n_burn_, 1)
            self.missings_ = np.asarray(
                fs.missing_sum[best_chain], dtype=np.float64) / denom
        self.case_control_sampler_ = None
        return self

    def logp(self, Y, X, intercept, radii=None, dist=None):
        """Log joint density at the given parameters (reference lsm.py:576)."""
        if dist is None:
            dist = pairwise_distances(to_device_f32(X))
        return float(_lsm_logp(
            self._cfg, to_device_f32(Y), to_device_f32(X),
            to_device_f32(intercept),
            to_device_f32(radii) if radii is not None else None,
            to_device_f32(dist), to_device_f32(self.intercept_prior_)))


def SimpleNetworkImputerLocal(Y):
    from ..imputer import SimpleNetworkImputer
    return SimpleNetworkImputer(strategy='random',
                                missing_value=-1).fit_transform(Y)


def _progress(verbose):
    """Chunk-level progress reporter (replaces the reference's tqdm bars,
    lsm.py:474 / hdp_lpcm.py:823)."""
    if not verbose:
        return None
    import sys
    import time
    start = time.time()

    def report(done, total):
        rate = done / max(time.time() - start, 1e-9)
        sys.stderr.write('\r[dynetlsm_tpu] %d/%d samples (%.1f/s)'
                         % (done, total, rate))
        sys.stderr.flush()
        if done >= total:
            sys.stderr.write('\n')
    return report
