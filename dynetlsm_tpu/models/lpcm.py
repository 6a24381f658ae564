"""Dynamic latent position cluster model (finite K), TPU-native sampler.

Mirrors the reference ``DynamicNetworkLPCM`` (reference lpcm.py:134-873):
Gaussian-mixture clustering of the latent positions with a time-constant
HMM over labels, conjugate Gibbs blocks for mixture parameters, and MAP/VI
model selection.
"""
import numpy as np
import jax
import jax.numpy as jnp

from ..config import DTYPE
from ..math.init import longitudinal_kmeans
from ..mcmc.states import MixtureState
from ..mcmc.sweeps import SweepConfig, make_lpcm_sweep, lpcm_logp_at_state
from ..mcmc.driver import (
    shard_state, shard_state_spatial, shard_network_spatial,
    replicate_state, make_scan_runner, collect_traces,
    state_shardings_of)
from ..model_selection.posterior_vi import minimize_posterior_expected_vi
from ..ops.distances import pairwise_distances
from ..ops.forecast import marginal_forecast
from .base import (
    validate_network, to_device_f32, chain_traces_to_numpy, total_iterations,
    build_case_control, init_cc_dict, resolve_n_control, resolve_fit_mesh,
    setup_tempering, strip_hot_slots, cold_slot_trace_fn)
from .mixture_base import MixtureModelMixin, init_from_lsm, resolve_hyperpriors

__all__ = ['DynamicNetworkLPCM']


class DynamicNetworkLPCM(MixtureModelMixin):
    """Dynamic latent position clustering model: LSM plus a finite
    Gaussian-mixture HMM over cluster labels (reference lpcm.py:134-327 API
    surface).

    Examples
    --------
    >>> from dynetlsm_tpu import DynamicNetworkLPCM
    >>> from dynetlsm_tpu.datasets import load_monks
    >>> Y, labels, names = load_monks(is_directed=False)
    >>> model = DynamicNetworkLPCM(n_components=4, n_iter=100, tune=50,
    ...                            burn=50, random_state=42).fit(Y)
    >>> model.X_.shape
    (3, 18, 2)
    >>> model.z_.shape
    (3, 18)
    """

    def __init__(self,
                 n_features=2,
                 n_components=5,
                 is_directed=False,
                 selection_type='map',
                 n_iter=5000,
                 tune=2500,
                 tune_interval=100,
                 burn=2500,
                 thin=None,
                 intercept_prior='auto',
                 intercept_variance_prior=2,
                 mean_variance_prior='auto',
                 a=2.0,
                 b='auto',
                 lambda_prior=0.9,
                 lambda_variance_prior=0.01,
                 dirichlet_prior='uniform',
                 sigma_prior_std=4.0,
                 mean_variance_prior_std=4.0,
                 step_size_X='auto',
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
        self.selection_type = selection_type
        self.n_features = n_features
        self.n_components = n_components
        self.dirichlet_prior = dirichlet_prior
        self.step_size_X = step_size_X
        self.intercept_prior = intercept_prior
        self.intercept_variance_prior = intercept_variance_prior
        self.step_size_intercept = step_size_intercept
        self.mean_variance_prior = mean_variance_prior
        self.a = a
        self.b = b
        self.lambda_prior = lambda_prior
        self.lambda_variance_prior = lambda_variance_prior
        self.mean_variance_prior_std = mean_variance_prior_std
        self.sigma_prior_std = sigma_prior_std
        self.step_size_radii = step_size_radii
        self.tune = tune
        self.tune_interval = tune_interval
        self.burn = burn
        self.thin = thin
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

    # ------------------------------------------------------------------ fit

    def fit(self, Y):
        rng = np.random.RandomState(
            self.random_state if isinstance(self.random_state, (int, np.integer))
            else None)
        K = self.n_components

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

        # ---- nested LSM init + kmeans (reference lpcm.py:45-131)
        emb, Y_fit = init_from_lsm(
            Y, self.is_directed, self.n_features, sample_missing,
            self.n_control, self.n_resample_control,
            rng.randint(0, 2**31 - 1), node_devices=self.node_devices,
            devices=self.devices)
        self.Y_fit_ = Y_fit
        X0 = emb.X_
        intercept0 = emb.intercept_
        radii0 = emb.radii_ if self.is_directed else None

        mu0, sigma0, z0 = longitudinal_kmeans(
            X0, n_clusters=K, random_state=rng.randint(0, 2**31 - 1))
        resp0 = np.eye(K)[z0[0]]
        init_weights0 = resp0.sum(axis=0) / n
        trans_weights0 = np.full((K, K), 1.0 / K)
        lmbda0 = float(self.lambda_prior)

        self.dirichlet_prior_ = (1.0 if self.dirichlet_prior == 'uniform'
                                 else 1.0 / K)
        if self.step_size_X == 'auto':
            self.step_size_X_ = 0.01 if self.is_directed else 0.1
        else:
            self.step_size_X_ = float(self.step_size_X)

        intercept_prior = self.intercept_prior
        if isinstance(intercept_prior, str) and intercept_prior == 'auto':
            intercept_prior = intercept0.copy()
        intercept_prior = np.broadcast_to(
            np.asarray(intercept_prior, np.float64), intercept0.shape)
        self.intercept_prior_ = np.asarray(intercept_prior)

        resolve_hyperpriors(self, n)

        cfg = SweepConfig(
            is_directed=self.is_directed,
            sample_missing=sample_missing,
            tune=int(self.tune or 0),
            tune_interval=self.tune_interval,
            n_burn=(self.tune or 0) + (self.burn or 0),
            intercept_variance_prior=float(self.intercept_variance_prior),
            n_components=K,
            a=float(self.a),
            lambda_prior=float(self.lambda_prior),
            lambda_variance_prior=float(self.lambda_variance_prior),
            a0=self.a0_, b0=self.b0_, c0=self.c0_, d0=self.d0_,
            dirichlet_prior=float(self.dirichlet_prior_),
            tune_radii=True,
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
        cc_static, ctrl0 = build_case_control(cfg, Y_dev, self.Y_fit_, rng,
                                              miss_mask=miss_mask)
        sweep = make_lpcm_sweep(None if sample_missing else Y_dev, miss_dev,
                                intercept_prior.astype(DTYPE), cfg,
                                cc_static=cc_static)

        X0d = to_device_f32(X0)
        b0d = to_device_f32(intercept0)
        r0d = to_device_f32(radii0) if self.is_directed else None
        z0d = jnp.asarray(z0, jnp.int32)
        mu0d, sigma0d = to_device_f32(mu0), to_device_f32(sigma0)
        iw0d = to_device_f32(init_weights0)
        tw0d = to_device_f32(trans_weights0)

        # true log joint of the initial sample (reference lpcm.py:489),
        # one jitted program; under case-control the network term uses the
        # same approximate estimator as the in-sweep trace logps so the
        # stored logps_ series is one consistent quantity
        cc0 = init_cc_dict(cfg, Y_dev, cc_static, ctrl0)

        @jax.jit
        def _init_logp(Yd, Xd, bd, rd, zd, mud, sigd, iwd, twd, prior):
            return lpcm_logp_at_state(
                cfg, Yd, prior, Xd, bd, rd, zd, mud, sigd,
                jnp.asarray(lmbda0, DTYPE), iwd, twd,
                jnp.asarray(self.mean_variance_prior_, DTYPE),
                jnp.asarray(self.b_, DTYPE), cc=cc0)

        logp0 = _init_logp(Y_dev, X0d, b0d, r0d, z0d, mu0d, sigma0d,
                           iw0d, tw0d, to_device_f32(intercept_prior))

        state0 = MixtureState(
            key=jax.random.PRNGKey(rng.randint(0, 2**31 - 1)),
            it=np.zeros((), np.int32),
            X=X0d,
            intercept=b0d,
            radii=r0d,
            Y=Y_dev if sample_missing else None,
            z=z0d,
            mu=mu0d, sigma=sigma0d,
            lmbda=np.asarray(lmbda0, DTYPE),
            weights=None, beta=None, gamma=None, alpha_init=None,
            alpha=None, kappa=None,
            init_weights=iw0d,
            trans_weights=tw0d,
            mean_var=np.asarray(self.mean_variance_prior_, DTYPE),
            b_scale=np.asarray(self.b_, DTYPE),
            step_X=np.full((T, n), self.step_size_X_, DTYPE),
            acc_X=np.zeros((T, n), DTYPE),
            step_int=np.full(intercept0.shape,
                              float(self.step_size_intercept), DTYPE),
            acc_int=np.zeros(intercept0.shape, DTYPE),
            step_radii=(np.asarray(float(self.step_size_radii), DTYPE)
                        if self.is_directed else None),
            acc_radii=(np.zeros((), DTYPE) if self.is_directed else None),
            logp=logp0,
            missing_sum=(np.zeros((T, n, n), DTYPE) if sample_missing
                         else None),
            ctrl_in=ctrl0[0] if ctrl0 else None,
            ctrl_out=ctrl0[1] if ctrl0 else None)

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
            out = {'X': s.X, 'intercept': s.intercept, 'z': s.z, 'mu': s.mu,
                   'sigma': s.sigma, 'lmbda': s.lmbda,
                   'init_weights': s.init_weights,
                   'trans_weights': s.trans_weights, 'logp': s.logp}
            if self.is_directed:
                out['radii'] = s.radii
            return out

        thin = self.thin or 1
        runner = make_scan_runner(step_fn,
                                  cold_slot_trace_fn(trace_fn,
                                                     self.n_temps),
                                  thin=thin,
                                  chunk=self.trace_chunk,
                                  multi_chain=multi_chain,
                                  state_shardings=(
                                      state_shardings_of(state)
                                      if mesh is not None else None))
        n_total = total_iterations(self.n_iter, self.tune, self.burn)
        n_samples = (n_total - 1) // thin
        state, traces = collect_traces(runner, state, n_samples,
                                       chunk=self.trace_chunk,
                                       checkpoint_dir=self.checkpoint_dir,
                                       progress=_progress(self.verbose),
                                       mesh=mesh)
        self.state_sharding_ = getattr(state.X, 'sharding', None)
        state, self.temper_ladder_ = strip_hot_slots(state,
                                                     self.n_temps)
        self._final_state = jax.tree.map(np.asarray, state)

        tr = chain_traces_to_numpy(traces, self.n_chains)

        def with_init(name, init_val, dtype=np.float64):
            arr = tr[name].astype(dtype, copy=False)
            init_val = np.asarray(init_val, dtype)
            if self.n_chains == 1:
                return np.concatenate([init_val[None], arr])
            c = self.n_chains
            return np.concatenate(
                [np.broadcast_to(init_val, (c, 1) + init_val.shape), arr],
                axis=1)

        self.Xs_ = with_init('X', X0)
        self.intercepts_ = with_init('intercept', intercept0)
        self.mus_ = with_init('mu', mu0)
        self.sigmas_ = with_init('sigma', sigma0)
        self.zs_ = with_init('z', z0, np.int32)
        self.init_weights_ = with_init('init_weights', init_weights0)
        self.trans_weights_ = with_init('trans_weights', trans_weights0)
        self.lambdas_ = with_init('lmbda', np.asarray(lmbda0))
        self.logps_ = with_init('logp', np.asarray(float(logp0)))
        if self.is_directed:
            self.radiis_ = with_init('radii', radii0)

        # ---- model selection (reference lpcm.py:717-740; the reference's
        # MAP branch indexes logps_[n_burn:] without re-offsetting — fixed
        # here to select among post-burn samples)
        self._calculate_posterior_cooccurrences()
        nb = self.n_burn_
        logps_flat = self._flat_posterior('logps_')
        if self.selection_type == 'map':
            best = int(np.argmax(logps_flat))
        else:
            best = minimize_posterior_expected_vi(
                self._flat_posterior('zs_'), self.cooccurrence_probas_,
                tie_break=logps_flat, n_groups=self.n_components)

        self.logp_ = float(logps_flat[best])
        self.X_ = self._flat_posterior('Xs_')[best]
        self.intercept_ = self._flat_posterior('intercepts_')[best]
        self.lambda_ = np.atleast_1d(self._flat_posterior('lambdas_')[best])
        if self.is_directed:
            self.radii_ = self._flat_posterior('radiis_')[best]
        self.z_ = self._flat_posterior('zs_')[best]
        self.init_weight_ = self._flat_posterior('init_weights_')[best]
        self.trans_weight_ = self._flat_posterior('trans_weights_')[best]
        self.mu_ = self._flat_posterior('mus_')[best]
        self.sigma_ = self._flat_posterior('sigmas_')[best]
        self.selected_id_ = best + nb if self.n_chains == 1 else best

        self._align_traces()
        self._store_posterior_means()
        if sample_missing:
            fs = self._final_state
            denom = max(n_total - 1 - cfg.n_burn, 1)
            self.missings_ = np.asarray(fs.missing_sum[0],
                                        np.float64) / denom
        self.case_control_sampler_ = None
        return self

    def logp(self, X, intercept, mu, sigma, z, init_weights, trans_weights,
             lmbda, radii=None):
        """Log joint density of a posterior sample under the fitted
        hyperparameters (reference lpcm.py:770-856).  Uses the exact dense
        network likelihood and, when resampled during the fit, the final
        tau^2 / b values (the reference mutates its attributes in-loop
        the same way)."""
        s = getattr(self, '_final_state', None)
        mean_var = (s.mean_var[0] if s is not None
                    else self.mean_variance_prior_)
        b_scale = s.b_scale[0] if s is not None else self.b_
        return float(lpcm_logp_at_state(
            self._cfg, jnp.asarray(self.Y_fit_, jnp.float32),
            jnp.asarray(self.intercept_prior_, DTYPE),
            jnp.asarray(X, DTYPE), jnp.atleast_1d(jnp.asarray(intercept, DTYPE)),
            None if radii is None else jnp.asarray(radii, DTYPE),
            jnp.asarray(z, jnp.int32), jnp.asarray(mu, DTYPE),
            jnp.asarray(sigma, DTYPE), jnp.asarray(lmbda, DTYPE),
            jnp.asarray(init_weights, DTYPE),
            jnp.asarray(trans_weights, DTYPE),
            jnp.asarray(mean_var, DTYPE), jnp.asarray(b_scale, DTYPE)))

    # ------------------------------------------------------------ forecasts

    @property
    def forecast_probas_map_(self):
        """Plug-in forecast from the selected model (reference lpcm.py:230-240)."""
        from scipy.special import expit
        ws = self.trans_weight_[self.z_[-1]]
        X_ahead = np.zeros((self.Y_fit_.shape[1], self.n_features))
        for g in range(self.n_components):
            X_ahead += ws[:, [g]] * (
                float(self.lambda_[0]) * self.mu_[g]
                + (1 - float(self.lambda_[0])) * self.X_[-1])
        dist = np.asarray(pairwise_distances(to_device_f32(X_ahead)))
        return expit(float(self.intercept_[0]) - dist)

    @property
    def forecast_probas_plugin_(self):
        """Posterior-averaged plug-in forecast (reference lpcm.py:243-258,
        using each sample's own transition weights)."""
        from scipy.special import expit

        def renorm(i):
            z = self._flat_posterior('zs_')[i]
            return (z[-1], self._flat_posterior('trans_weights_')[i],
                    self._flat_posterior('mus_')[i],
                    self._flat_posterior('sigmas_')[i])

        X_hat = self._forecast_xhat(renorm)
        dist = np.asarray(pairwise_distances(
            jnp.asarray(X_hat, jnp.float32)))
        return expit(float(np.ravel(self.intercepts_mean_)[0]) - dist)

    @property
    def forecast_probas_marginalized_(self):
        """Posterior-marginalised forecast (reference lpcm.py:261-283)."""
        def renorm(i):
            z = self._flat_posterior('zs_')[i]
            return (z[-1], self._flat_posterior('trans_weights_')[i],
                    self._flat_posterior('mus_')[i],
                    self._flat_posterior('sigmas_')[i])

        X_hat = self._forecast_xhat(renorm)
        return np.asarray(marginal_forecast(
            X_hat,
            self._flat_posterior('Xs_')[:, -1],
            self._flat_posterior('zs_')[:, -1],
            self._flat_posterior('trans_weights_'),
            self._flat_posterior('mus_'),
            self._flat_posterior('sigmas_'),
            self._flat_posterior('intercepts_')[:, 0],
            np.ravel(self._flat_posterior('lambdas_')),
            renormalize=False))

    @property
    def trans_weights_last_(self):
        return self.trans_weight_

    def delete_traces(self):
        """Free trace storage (reference lpcm.py:858-873)."""
        for name in ('Xs_', 'intercepts_', 'zs_', 'mus_', 'sigmas_',
                     'init_weights_', 'trans_weights_', 'lambdas_', 'logps_'):
            if hasattr(self, name):
                delattr(self, name)
        if self.is_directed and hasattr(self, 'radiis_'):
            del self.radiis_


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
