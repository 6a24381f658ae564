"""Sticky HDP latent position cluster model (Loyal & Chen 2020), TPU-native.

Mirrors the reference ``DynamicNetworkHDPLPCM`` (reference
hdp_lpcm.py:144-1330): weak-limit sticky HDP-HMM over community labels with
time-inhomogeneous transitions, CRF auxiliary-variable sampling, resampled
concentration parameters, and VI/BIC/MAP model selection.
"""
import numpy as np
import jax
import jax.numpy as jnp

from ..config import DTYPE
from ..math.init import longitudinal_kmeans
from ..mcmc.states import MixtureState
from ..mcmc.sweeps import SweepConfig, make_hdp_sweep, hdp_logp_at_state
from ..mcmc.driver import (
    shard_state, shard_state_spatial, shard_network_spatial,
    replicate_state, make_scan_runner, collect_traces,
    state_shardings_of)
from ..model_selection.approx_bic import select_bic
from ..model_selection.posterior_vi import minimize_posterior_expected_vi
from ..ops.forecast import marginal_forecast
from ..ops.distances import pairwise_distances
from .base import (
    validate_network, to_device_f32, chain_traces_to_numpy, total_iterations,
    build_case_control, init_cc_dict, resolve_n_control, resolve_fit_mesh,
    setup_tempering, strip_hot_slots, cold_slot_trace_fn)
from .mixture_base import MixtureModelMixin, init_from_lsm, resolve_hyperpriors

__all__ = ['DynamicNetworkHDPLPCM']


class DynamicNetworkHDPLPCM(MixtureModelMixin):
    """Hierarchical Dirichlet process latent position clustering model: a
    sticky HDP-HMM (weak-limit approximation) infers the number of
    communities and their time-varying memberships (reference
    hdp_lpcm.py:144-496 API surface; the reference runs the same monks fit
    as a docstring integration test, reference hdp_lpcm.py:366-374).

    Examples
    --------
    >>> from dynetlsm_tpu import DynamicNetworkHDPLPCM
    >>> from dynetlsm_tpu.datasets import load_monks
    >>> Y, labels, names = load_monks(is_directed=False)
    >>> model = DynamicNetworkHDPLPCM(n_components=10, n_iter=100, tune=50,
    ...                               burn=50, random_state=42).fit(Y)
    >>> model.X_.shape
    (3, 18, 2)
    >>> model.z_.shape
    (3, 18)
    >>> bool(model.zs_.max() < 10)
    True
    """

    def __init__(self,
                 n_features=2,
                 n_components=10,
                 is_directed=False,
                 selection_type='vi',
                 n_iter=5000,
                 tune=2500,
                 tune_interval=100,
                 burn=2500,
                 thin=None,
                 gamma=1.0,
                 gamma_prior_shape=1.0,
                 gamma_prior_rate=0.1,
                 alpha_init=1.0,
                 alpha_init_shape=1.0,
                 alpha_init_rate=1.0,
                 alpha=1.0,
                 kappa=4.0,
                 alpha_kappa_shape=5,
                 alpha_kappa_rate=0.1,
                 intercept_prior='auto',
                 intercept_variance_prior=2,
                 mean_variance_prior='auto',
                 a=2.0,
                 b='auto',
                 lambda_prior=0.9,
                 lambda_variance_prior=0.01,
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
        self.n_features = n_features
        self.n_components = n_components
        self.step_size_X = step_size_X
        self.intercept_prior = intercept_prior
        self.intercept_variance_prior = intercept_variance_prior
        self.step_size_intercept = step_size_intercept
        self.mean_variance_prior = mean_variance_prior
        self.a = a
        self.b = b
        self.alpha_init = alpha_init
        self.alpha = alpha
        self.alpha_init_shape = alpha_init_shape
        self.alpha_init_rate = alpha_init_rate
        self.gamma = gamma
        self.gamma_prior_shape = gamma_prior_shape
        self.gamma_prior_rate = gamma_prior_rate
        self.kappa = kappa
        self.alpha_kappa_shape = alpha_kappa_shape
        self.alpha_kappa_rate = alpha_kappa_rate
        self.lambda_prior = lambda_prior
        self.lambda_variance_prior = lambda_variance_prior
        self.mean_variance_prior_std = mean_variance_prior_std
        self.sigma_prior_std = sigma_prior_std
        self.step_size_radii = step_size_radii
        self.tune = tune
        self.tune_interval = tune_interval
        self.burn = burn
        self.thin = thin
        self.selection_type = selection_type
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

        # ---- nested LSM init + kmeans (reference hdp_lpcm.py:48-141)
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
        lmbda0 = float(self.lambda_prior)

        # initial weights: empirical w0; transitions from the sticky prior
        # (reference hdp_lpcm.py:117-139)
        weights0 = np.zeros((T, K, K))
        resp0 = np.eye(K)[z0[0]]
        weights0[0, 0] = resp0.sum(axis=0) / n
        beta0 = rng.dirichlet(np.repeat(self.gamma / K, K))
        for t in range(1, T):
            for k in range(K):
                weights0[t, k] = rng.dirichlet(
                    self.alpha * beta0 + self.kappa * np.eye(K)[k])

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
            gamma_prior_shape=float(self.gamma_prior_shape),
            gamma_prior_rate=float(self.gamma_prior_rate),
            alpha_init_shape=float(self.alpha_init_shape),
            alpha_init_rate=float(self.alpha_init_rate),
            alpha_kappa_shape=float(self.alpha_kappa_shape),
            alpha_kappa_rate=float(self.alpha_kappa_rate),
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
        sweep = make_hdp_sweep(None if sample_missing else Y_dev, miss_dev,
                               intercept_prior.astype(DTYPE), cfg,
                               cc_static=cc_static)

        X0d = to_device_f32(X0)
        b0d = to_device_f32(intercept0)
        r0d = to_device_f32(radii0) if self.is_directed else None
        z0d = jnp.asarray(z0, jnp.int32)
        mu0d, sigma0d = to_device_f32(mu0), to_device_f32(sigma0)
        w0d, beta0d = to_device_f32(weights0), to_device_f32(beta0)

        # true log joint of the initial sample (reference hdp_lpcm.py:798-809),
        # one jitted program; under case-control the network term uses the
        # same approximate estimator as the in-sweep trace logps so the
        # stored logps_ series is one consistent quantity
        cc0 = init_cc_dict(cfg, Y_dev, cc_static, ctrl0)

        @jax.jit
        def _init_logp(Yd, Xd, bd, rd, zd, mud, sigd, wd, betad, prior):
            return hdp_logp_at_state(
                cfg, Yd, prior, Xd, bd, rd, zd, mud, sigd,
                jnp.asarray(lmbda0, DTYPE), wd, betad,
                jnp.asarray(float(self.gamma), DTYPE),
                jnp.asarray(float(self.alpha_init), DTYPE),
                jnp.asarray(float(self.alpha), DTYPE),
                jnp.asarray(float(self.kappa), DTYPE),
                jnp.asarray(self.mean_variance_prior_, DTYPE),
                jnp.asarray(self.b_, DTYPE), cc=cc0)

        logp0 = _init_logp(Y_dev, X0d, b0d, r0d, z0d, mu0d, sigma0d,
                           w0d, beta0d,
                           to_device_f32(intercept_prior))

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
            weights=w0d,
            beta=beta0d,
            gamma=np.asarray(float(self.gamma), DTYPE),
            alpha_init=np.asarray(float(self.alpha_init), DTYPE),
            alpha=np.asarray(float(self.alpha), DTYPE),
            kappa=np.asarray(float(self.kappa), DTYPE),
            init_weights=None, trans_weights=None,
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
                   'sigma': s.sigma, 'lmbda': s.lmbda, 'weights': s.weights,
                   'beta': s.beta, 'logp': s.logp, 'gamma': s.gamma,
                   'alpha': s.alpha, 'kappa': s.kappa,
                   'alpha_init': s.alpha_init}
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
        self.weights_ = with_init('weights', weights0)
        self.betas_ = with_init('beta', beta0)
        self.lambdas_ = with_init('lmbda', np.asarray(lmbda0))
        self.logps_ = with_init('logp', np.asarray(float(logp0)))
        self.gammas_ = with_init('gamma', np.asarray(float(self.gamma)))
        self.alphas_ = with_init('alpha', np.asarray(float(self.alpha)))
        self.kappas_ = with_init('kappa', np.asarray(float(self.kappa)))
        self.alpha_inits_ = with_init(
            'alpha_init', np.asarray(float(self.alpha_init)))
        if self.is_directed:
            self.radiis_ = with_init('radii', radii0)

        # ---- model selection (reference hdp_lpcm.py:1085-1138)
        flat = {
            'Xs': self._flat_posterior('Xs_'),
            'intercepts': self._flat_posterior('intercepts_'),
            'mus': self._flat_posterior('mus_'),
            'sigmas': self._flat_posterior('sigmas_'),
            'betas': self._flat_posterior('betas_'),
            'weights': self._flat_posterior('weights_'),
            'lambdas': self._flat_posterior('lambdas_'),
            'zs': self._flat_posterior('zs_'),
            'logps': self._flat_posterior('logps_'),
        }
        if self.is_directed:
            flat['radiis'] = self._flat_posterior('radiis_')
        self.bic_, self.models_, self.counts_ = select_bic(
            self.Y_fit_, flat, n_burn=0, is_directed=self.is_directed,
            n_features=self.n_features)

        self._calculate_posterior_cooccurrences()

        if self.selection_type == 'vi':
            best = minimize_posterior_expected_vi(
                flat['zs'], self.cooccurrence_probas_,
                tie_break=flat['logps'], n_groups=K)
            self.logp_ = float(flat['logps'][best])
            self.X_ = flat['Xs'][best]
            self.intercept_ = flat['intercepts'][best]
            self.lambda_ = np.atleast_1d(flat['lambdas'][best])
            if self.is_directed:
                self.radii_ = flat['radiis'][best]
            z, beta, init_w, trans_w, mu, sigma = self._renormalize_flat(
                flat, best)
            self.z_ = z
            self.beta_ = beta
            self.init_weights_ = init_w
            self.trans_weights_ = trans_w
            self.mu_ = mu
            self.sigma_ = sigma
            self.selected_id_ = best
        else:
            if self.selection_type == 'bic':
                model_id = int(np.argmin(self.bic_[:, 1]))
                self.best_k_ = int(self.bic_[model_id, 0])
            elif self.selection_type == 'map':
                self.best_k_ = int(np.argmax(np.bincount(self.counts_)))
                model_id = int(
                    np.argwhere(self.bic_[:, 0] == self.best_k_)[0, 0])
            else:
                raise ValueError('Selection type not recognized')
            self._set_from_model(model_id, flat)

        self._align_traces()
        self._store_posterior_means()
        self._store_group_counts()
        self._store_geweke()

        if sample_missing:
            fs = self._final_state
            denom = max(n_total - 1 - cfg.n_burn, 1)
            self.missings_ = np.asarray(fs.missing_sum[0],
                                        np.float64) / denom
        self.case_control_sampler_ = None
        return self

    # ------------------------------------------------------------- helpers

    @staticmethod
    def _renormalize_flat(flat, sample_id):
        """Active-cluster renormalisation of one flattened posterior sample
        (reference label_utils.py:10-37)."""
        zs = flat['zs'][sample_id]
        T, n = zs.shape
        active = np.unique(zs.ravel())

        beta = flat['betas'][sample_id, active].copy()
        beta /= beta.sum()

        weights = flat['weights'][sample_id]
        init_w = weights[0, 0, active].copy()
        init_w /= init_w.sum()

        k = active.shape[0]
        trans_w = np.zeros((T, k, k))
        for t in range(1, T):
            trans_w[t] = weights[t][np.ix_(active, active)]
            trans_w[t] /= trans_w[t].sum(axis=1, keepdims=True)

        _, z = np.unique(zs.ravel(), return_inverse=True)
        return (z.reshape(T, n), beta, init_w, trans_w,
                flat['mus'][sample_id, active],
                flat['sigmas'][sample_id, active])

    def _set_from_model(self, model_id, flat):
        """Populate fitted attributes from a per-K MAP model
        (reference hdp_lpcm.py:1113-1138, set_best_model)."""
        T, n, _ = self.Y_fit_.shape
        m = self.models_[model_id]
        self.logp_ = float(flat['logps'][int(self.bic_[model_id, 3])])
        self.X_ = m.X
        self.intercept_ = m.intercept
        self.mu_ = m.mu
        self.sigma_ = m.sigma
        if self.is_directed:
            self.radii_ = m.radii
        _, z = np.unique(np.asarray(m.z).ravel(), return_inverse=True)
        self.z_ = z.reshape(T, n)
        self.beta_ = m.beta
        self.init_weights_ = m.init_weights
        self.trans_weights_ = m.trans_weights
        self.lambda_ = np.atleast_1d(m.lmbda)
        self.selected_id_ = int(self.bic_[model_id, 3])

    def set_best_model(self, selection_type='bic'):
        """Re-select the reported model from the stored BIC table
        (reference hdp_lpcm.py:1282-1313)."""
        self.selection_type = selection_type
        flat = {'logps': self._flat_posterior('logps_')}
        if selection_type == 'bic':
            model_id = int(np.argmin(self.bic_[:, 1]))
            self.best_k_ = int(self.bic_[model_id, 0])
        elif selection_type == 'map':
            self.best_k_ = int(np.argmax(np.bincount(self.counts_)))
            model_id = int(np.argwhere(self.bic_[:, 0] == self.best_k_)[0, 0])
        else:
            raise ValueError('Selection type not recognized')
        self._set_from_model(model_id, flat)
        return self

    def logp(self, X, intercept, mu, sigma, z, weights, beta, lmbda,
             radii=None):
        """Log joint density of a posterior sample under the fitted
        hyperparameters (reference hdp_lpcm.py:1188-1280).  Uses the exact
        dense network likelihood and, when resampled during the fit, the
        final gamma / alpha / kappa / alpha_init / tau^2 / b values (the
        reference mutates its attributes in-loop the same way)."""
        s = getattr(self, '_final_state', None)

        def cur(field, fallback):
            v = getattr(s, field, None) if s is not None else None
            return fallback if v is None else v[0]

        return float(hdp_logp_at_state(
            self._cfg, jnp.asarray(self.Y_fit_, jnp.float32),
            jnp.asarray(self.intercept_prior_, DTYPE),
            jnp.asarray(X, DTYPE), jnp.atleast_1d(jnp.asarray(intercept, DTYPE)),
            None if radii is None else jnp.asarray(radii, DTYPE),
            jnp.asarray(z, jnp.int32), jnp.asarray(mu, DTYPE),
            jnp.asarray(sigma, DTYPE), jnp.asarray(lmbda, DTYPE),
            jnp.asarray(weights, DTYPE), jnp.asarray(beta, DTYPE),
            jnp.asarray(cur('gamma', self.gamma), DTYPE),
            jnp.asarray(cur('alpha_init', self.alpha_init), DTYPE),
            jnp.asarray(cur('alpha', self.alpha), DTYPE),
            jnp.asarray(cur('kappa', self.kappa), DTYPE),
            jnp.asarray(cur('mean_var', self.mean_variance_prior_), DTYPE),
            jnp.asarray(cur('b_scale', self.b_), DTYPE)))

    # ------------------------------------------------------------ forecasts

    @property
    def forecast_probas_map_(self):
        """Plug-in forecast from the selected model
        (reference hdp_lpcm.py:498-508)."""
        from scipy.special import expit
        ws = self.trans_weights_[-1][self.z_[-1]]
        X_ahead = np.zeros((self.Y_fit_.shape[1], self.n_features))
        lam = float(np.ravel(self.lambda_)[0])
        for g in np.unique(self.z_[-1]):
            X_ahead += ws[:, [g]] * (lam * self.mu_[g]
                                     + (1 - lam) * self.X_[-1])
        dist = np.asarray(pairwise_distances(
            jnp.asarray(X_ahead, jnp.float32)))
        return expit(float(self.intercept_[0]) - dist)

    @property
    def forecast_probas_plugin_(self):
        """Posterior-averaged plug-in forecast with active-cluster
        renormalisation (reference hdp_lpcm.py:511-527)."""
        from scipy.special import expit
        flat = {
            'zs': self._flat_posterior('zs_'),
            'betas': self._flat_posterior('betas_'),
            'weights': self._flat_posterior('weights_'),
            'mus': self._flat_posterior('mus_'),
            'sigmas': self._flat_posterior('sigmas_'),
        }

        def renorm(i):
            z, _, _, trans_w, mu, sigma = self._renormalize_flat(flat, i)
            return z[-1], trans_w[-1], mu, sigma

        X_hat = self._forecast_xhat(renorm)
        dist = np.asarray(pairwise_distances(
            jnp.asarray(X_hat, jnp.float32)))
        return expit(float(np.ravel(self.intercepts_mean_)[0]) - dist)

    @property
    def forecast_probas_marginalized_(self):
        """Posterior-marginalised forecast with active-cluster
        renormalisation (reference hdp_lpcm.py:530-553)."""
        flat = {
            'zs': self._flat_posterior('zs_'),
            'betas': self._flat_posterior('betas_'),
            'weights': self._flat_posterior('weights_'),
            'mus': self._flat_posterior('mus_'),
            'sigmas': self._flat_posterior('sigmas_'),
        }

        def renorm(i):
            z, _, _, trans_w, mu, sigma = self._renormalize_flat(flat, i)
            return z[-1], trans_w[-1], mu, sigma

        X_hat = self._forecast_xhat(renorm)
        return np.asarray(marginal_forecast(
            X_hat,
            self._flat_posterior('Xs_')[:, -1],
            flat['zs'][:, -1],
            flat['weights'][:, -1],
            flat['mus'],
            flat['sigmas'],
            self._flat_posterior('intercepts_')[:, 0],
            np.ravel(self._flat_posterior('lambdas_')),
            renormalize=True))

    @property
    def forecast_probas_pp_(self):
        """Posterior-predictive one-step forecast: per posterior sample,
        resample labels from the active-renormalised transition row and
        positions from the mixture dynamics, then average the edge
        probabilities (reference hdp_lpcm.py:590-630).

        Undirected-only, like the reference (whose implementation broadcasts
        a scalar intercept; the directed pair would not broadcast against
        the distance matrix there either).
        """
        if self.is_directed:
            raise ValueError(
                'forecast_probas_pp_ supports undirected models only (the '
                'reference implementation, hdp_lpcm.py:590-630, has no '
                'directed path either); use forecast_probas_marginalized_ '
                'or forecast_probas(n_samples) instead.')
        from ..ops.forecast import posterior_predictive_forecast
        seed = (self.random_state
                if isinstance(self.random_state, (int, np.integer)) else 0)
        key = jax.random.PRNGKey(seed)
        return np.asarray(posterior_predictive_forecast(
            key,
            self._flat_posterior('Xs_')[:, -1],
            self._flat_posterior('zs_'),
            self._flat_posterior('weights_')[:, -1],
            self._flat_posterior('mus_'),
            self._flat_posterior('sigmas_'),
            self._flat_posterior('intercepts_')[:, 0],
            np.ravel(self._flat_posterior('lambdas_'))), dtype=np.float64)

    def delete_traces(self):
        """Free trace storage (reference hdp_lpcm.py:1315-1330)."""
        for name in ('Xs_', 'intercepts_', 'zs_', 'mus_', 'sigmas_',
                     'weights_', 'betas_', 'lambdas_', 'logps_',
                     'gammas_', 'alphas_', 'kappas_', 'alpha_inits_'):
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
