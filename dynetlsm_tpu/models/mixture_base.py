"""Shared fitting machinery for the LPCM / HDP-LPCM estimators.

Covers the pieces both models take from the reference:
* nested LSM + longitudinal-kmeans initialisation (hdp_lpcm.py:48-141)
* hyper-prior auto-scaling (hdp_lpcm.py:753-793)
* trace post-processing: co-occurrence, Procrustes alignment, posterior
  means, Geweke diagnostics, forecasting (hdp_lpcm.py:1140-1176, 498-629)
"""
import numpy as np
import jax
import jax.numpy as jnp

from math import ceil

from scipy.spatial.distance import pdist, squareform

from ..array_utils import diag_indices_from_3d
from ..math.procrustes import longitudinal_procrustes_rotation
from ..metrics import network_auc
from ..ops.distances import pairwise_distances
from ..ops.likelihoods import (
    undirected_network_probas, directed_network_probas)
from ..diagnostics import (
    geweke_diag, potential_scale_reduction, multichain_effective_n)
from ..label_utils import (
    calculate_posterior_cooccurrence, calculate_posterior_group_counts)
from .base import to_device_f32
from .lsm import DynamicNetworkLSM


def init_from_lsm(Y, is_directed, n_features, sample_missing,
                  n_control, n_resample_control, random_state,
                  lsm_kwargs=None, node_devices=1, devices=None):
    """Nested short LSM run used to initialise X / intercept / radii
    (reference hdp_lpcm.py:58-86).

    ``node_devices`` / ``devices`` propagate the caller's sharding: a
    network that needs a sharded main fit would OOM the single-chip init,
    and the init must not spill onto devices the caller excluded.
    """
    common = dict(n_iter=500, tune=250, burn=250, n_features=n_features,
                  is_directed=is_directed, random_state=random_state,
                  devices=devices)
    if node_devices and node_devices > 1:
        common.update(node_devices=node_devices, latent_update='parallel')
    if is_directed:
        common.update(sigma_sq=0.001, tau_sq='auto', step_size_X=0.0075,
                      n_control=n_control,
                      n_resample_control=n_resample_control)
    else:
        common.update(sigma_sq=0.1, tau_sq=2.0, step_size_X=0.1)
    if lsm_kwargs:
        common.update(lsm_kwargs)
    emb = DynamicNetworkLSM(**common).fit(Y)

    Y_fit = np.array(Y, copy=True)
    if sample_missing:
        nan_mask = Y == -1
        Y_fit[nan_mask] = (emb.probas_[nan_mask] > 0.5).astype(np.float64)
    return emb, Y_fit


def resolve_hyperpriors(self, n_nodes):
    """Auto-scale tau^2 / b hyper-priors (reference hdp_lpcm.py:753-793).
    Sets mean_variance_prior_, a0_, b0_, b_, c0_, d0_ on the estimator."""
    if self.mean_variance_prior == 'auto':
        if self.is_directed:
            self.mean_variance_prior_ = (
                2.0 * (1.0 / n_nodes) ** (2.0 / self.n_features))
        else:
            self.mean_variance_prior_ = (
                n_nodes ** (2.0 / self.n_features)) / 50.0
    else:
        self.mean_variance_prior_ = float(self.mean_variance_prior)

    self.a0_ = self.b0_ = None
    if self.mean_variance_prior_std is not None:
        self.a0_ = (self.mean_variance_prior_std ** 2 + 2) * 2
        self.b0_ = (self.a0_ - 2) * self.mean_variance_prior_ * 2

    if self.b == 'auto':
        self.b_ = (self.a + 2) * self.mean_variance_prior_
    else:
        self.b_ = float(self.b)

    self.c0_ = self.d0_ = None
    if self.sigma_prior_std is not None:
        self.d0_ = (self.sigma_prior_std ** 2 / self.b_) * 2
        self.c0_ = self.b_ * self.d0_


class MixtureModelMixin:
    """Post-fit machinery shared by DynamicNetworkLPCM / HDPLPCM."""

    @property
    def n_burn_(self):
        n_burn = 0
        if self.burn is not None:
            n_burn += self.burn
        if self.tune is not None:
            n_burn += self.tune
        return ceil(n_burn / self.thin) if self.thin else n_burn

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
                           is_directed=self.is_directed,
                           nan_mask=self.nan_mask_)

    # -------------------------------------------------------- post-fit glue

    def _flat_posterior(self, name):
        """Post-burn samples of a trace, flattened across chains."""
        arr = getattr(self, name)
        nb = self.n_burn_
        if self.n_chains == 1:
            return arr[nb:]
        return arr[:, nb:].reshape((-1,) + arr.shape[2:])

    def _calculate_posterior_cooccurrences(self):
        T, n, _ = self.Y_fit_.shape
        zs = self._flat_posterior('zs_')
        self.cooccurrence_probas_ = np.stack([
            calculate_posterior_cooccurrence(zs, n_burn=0, t=t,
                                             n_groups=self.n_components)
            for t in range(T)])

    def _align_traces(self):
        """Procrustes-rotate every stored sample (and cluster means) onto the
        selected model (reference hdp_lpcm.py:1140-1146).

        Processed in fixed-size sample chunks: one vmapped batch over the
        full trace puts the whole (S, T, n, d) stack through a batched SVD,
        which overflows VMEM for S in the 10^5 range."""
        X_ref = jnp.asarray(self.X_, jnp.float32)
        chunk = 4096

        @jax.jit
        def align_chunk(X, mu):
            def align(X1, mu1):
                Xr, R = longitudinal_procrustes_rotation(X_ref, X1)
                return Xr, mu1 @ R
            return jax.vmap(align)(X, mu)

        Xs_np = np.asarray(self.Xs_, np.float32)
        mus_np = np.asarray(self.mus_, np.float32)
        lead = Xs_np.shape[:2] if self.n_chains > 1 else Xs_np.shape[:1]
        Xs_flat = Xs_np.reshape((-1,) + Xs_np.shape[len(lead):])
        mus_flat = mus_np.reshape((-1,) + mus_np.shape[len(lead):])

        S = Xs_flat.shape[0]
        out_X = np.empty(Xs_flat.shape, np.float64)
        out_mu = np.empty(mus_flat.shape, np.float64)
        for s0 in range(0, S, chunk):
            s1 = min(s0 + chunk, S)
            pad = chunk - (s1 - s0)
            # zero-pad the final partial batch to the fixed chunk size (one
            # compiled program; padded rows' results are discarded)
            Xc = np.pad(Xs_flat[s0:s1], ((0, pad),) + ((0, 0),) * 3) \
                if pad else Xs_flat[s0:s1]
            mc = np.pad(mus_flat[s0:s1], ((0, pad),) + ((0, 0),) * 2) \
                if pad else mus_flat[s0:s1]
            Xr, mr = align_chunk(jnp.asarray(Xc), jnp.asarray(mc))
            out_X[s0:s1] = np.asarray(Xr)[:s1 - s0]
            out_mu[s0:s1] = np.asarray(mr)[:s1 - s0]

        self.Xs_ = out_X.reshape(Xs_np.shape)
        self.mus_ = out_mu.reshape(mus_np.shape)

    def _store_posterior_means(self):
        self.X_mean_ = self._flat_posterior('Xs_').mean(axis=0)
        self.lambda_mean_ = self._flat_posterior('lambdas_').mean(axis=0)
        self.intercepts_mean_ = self._flat_posterior('intercepts_').mean(axis=0)
        if self.is_directed:
            self.radii_mean_ = self._flat_posterior('radiis_').mean(axis=0)

    def _store_group_counts(self):
        T = self.Y_fit_.shape[0]
        zs = self._flat_posterior('zs_')
        self.posterior_group_ids_, self.posterior_group_counts_ = [], []
        for t in range(T):
            idx, counts = calculate_posterior_group_counts(zs, n_burn=0, t=t)
            self.posterior_group_ids_.append(idx)
            self.posterior_group_counts_.append(counts)

    def _store_geweke(self):
        """Geweke z-scores per chain, reporting the worst |z| — pooling
        chains into one series would break the spectral variance estimate
        (each chain is a separate Markov chain).  Multichain fits also get
        split-R-hat and total ESS of logp as fitted attributes."""
        nb = self.n_burn_

        def worst(series_2d):
            # series_2d : (n_chains, n_samples)
            diags = [geweke_diag(c, n_burn=nb) for c in series_2d]
            return diags[int(np.argmax([abs(z) for z, _ in diags]))]

        def chains_of(arr):
            return arr[None] if self.n_chains == 1 else arr

        logps = chains_of(self.logps_)
        lambdas = chains_of(self.lambdas_)
        ints = chains_of(self.intercepts_)
        self.logp_geweke_ = worst(logps)
        self.lambda_geweke_ = worst(lambdas.reshape(lambdas.shape[:2]))
        if self.is_directed:
            self.intercept_in_geweke_ = worst(ints[..., 0])
            self.intercept_out_geweke_ = worst(ints[..., 1])
        else:
            self.intercept_geweke_ = worst(ints[..., 0])

        if self.n_chains > 1:
            post = logps[:, nb:]
            self.logp_rhat_ = potential_scale_reduction(post)
            self.logp_effective_n_ = multichain_effective_n(post)

    # -------------------------------------------------------- forecasting

    def _forecast_xhat(self, renormalized_fn):
        """Posterior-averaged plug-in forecast position X_hat
        (reference hdp_lpcm.py:530-544)."""
        n = self.Y_fit_.shape[1]
        Xs = self._flat_posterior('Xs_')
        lams = np.ravel(self._flat_posterior('lambdas_'))
        S = Xs.shape[0]
        X_hat = np.zeros((n, self.n_features))
        for i in range(S):
            z_last, trans_last, mu, _ = renormalized_fn(i)
            ws = trans_last[z_last]                      # (n, k)
            contrib = ws[..., None] * (
                lams[i] * mu[None, :, :]
                + (1 - lams[i]) * Xs[i, -1][:, None, :])
            X_hat += contrib.sum(axis=1) / S
        return X_hat

    def _selected_trans_matrix(self):
        """Last-time transition matrix of the selected model: LPCM stores it
        as ``trans_weight_`` (K, K); HDP-LPCM as ``trans_weights_``
        (T, k, k) after renormalisation."""
        if hasattr(self, 'trans_weight_'):
            return np.asarray(self.trans_weight_)
        tw = np.asarray(self.trans_weights_)
        return tw[-1] if tw.ndim == 3 else tw

    def forecast_probas(self, n_samples=5000):
        """Monte-Carlo one-step-ahead probabilities from the selected model
        (reference hdp_lpcm.py:555-587)."""
        from sklearn.utils import check_random_state
        from scipy.special import expit
        rng = check_random_state(self.random_state)
        n = self.X_.shape[1]
        mu, sigma = np.asarray(self.mu_), np.asarray(self.sigma_)
        n_groups = mu.shape[0]
        wt = self._selected_trans_matrix()
        lam = float(np.ravel(self.lambda_)[0])
        z_last = self.z_[-1]
        X_last = self.X_[-1]

        probas = np.zeros((n, n))
        for _ in range(n_samples):
            zt = np.zeros(n, dtype=int)
            for g in range(n_groups):
                mask = z_last == g
                if mask.any():
                    zt[mask] = rng.choice(n_groups, p=wt[g], size=mask.sum())
            Xt = np.zeros_like(X_last)
            for g in range(n_groups):
                mask = zt == g
                if mask.any():
                    Xt[mask] = (sigma[g] * rng.randn(mask.sum(), self.n_features)
                                + lam * mu[g] + (1 - lam) * X_last[mask])
            # host-side distances: a device round-trip per draw would make
            # this dispatch-bound (n is small; matches reference
            # hdp_lpcm.py:571-585)
            dist = squareform(pdist(Xt))
            probas += expit(float(self.intercept_[0]) - dist) / n_samples
        np.fill_diagonal(probas, 0.0)
        return probas
