"""Run the *reference* sampler (joshloyal/dynetlsm) with NumPy shims in
place of its Cython kernels, to (re)generate the posterior statistics used
by tests/test_equivalence_sampson.py and tests/test_equivalence_lpcm.py.

The reference image has no Cython toolchain for the reference's .pyx
modules, so this script injects pure-NumPy modules implementing the same
formulas (each shim cites the .pyx lines it reproduces) into
``sys.modules`` before importing the reference package from
``/root/reference``.  Nothing here is part of the dynetlsm_tpu package —
it exists so the reference numbers in the equivalence tests are
reproducible, not hearsay.

Usage::

    python scripts/reference_shim.py            # LSM + HDP Sampson stats
    python scripts/reference_shim.py lsm        # just the LSM run
"""
import ctypes
import json
import os
import subprocess
import sys
import time
import types

import numpy as np

REFERENCE_PATH = '/root/reference'
_HERE = os.path.dirname(os.path.abspath(__file__))

# Optional native (C) implementations of the reference's hot Cython kernels
# (scripts/ref_kernels.c).  The reference runs these loops as compiled
# Cython; timing it against the pure-NumPy shims would charge it per-call
# NumPy overhead it does not really pay, so the timing entry points compile
# and route through C.  Off by default so the statistics-regeneration runs
# keep their historical bitwise behaviour.
_NATIVE = {'lib': None}


def enable_native_kernels():
    """Compile scripts/ref_kernels.c (g++ -O3) and route the hot per-node
    kernels through it.  Returns True on success, False on any failure
    (the NumPy shims keep working either way)."""
    if _NATIVE['lib'] is not None:
        return True
    src = os.path.join(_HERE, 'ref_kernels.c')
    so = os.path.join(_HERE, '_ref_kernels.so')
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(['g++', '-O3', '-shared', '-fPIC', '-o', so, src],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        dbl, lng = ctypes.c_double, ctypes.c_long
        pd = np.ctypeslib.ndpointer(np.float64, flags='C_CONTIGUOUS')
        pl = np.ctypeslib.ndpointer(np.int64, flags='C_CONTIGUOUS')
        lib.partial_loglik.restype = dbl
        lib.partial_loglik.argtypes = [pd, pd, dbl, lng, lng, lng,
                                       ctypes.c_int]
        lib.directed_partial_loglik.restype = dbl
        lib.directed_partial_loglik.argtypes = [pd, pd, pd, dbl, dbl, lng,
                                                lng, lng, ctypes.c_int]
        lib.gaussian_likelihood.restype = None
        lib.gaussian_likelihood.argtypes = [pd, pd, pd, dbl, lng, lng, lng,
                                            ctypes.c_int, pd]
        lib.approx_directed_partial_loglik.restype = dbl
        lib.approx_directed_partial_loglik.argtypes = [
            pd, pd, dbl, dbl, pl, pl, pl, pl, pl, lng, lng, lng, lng, lng,
            ctypes.c_int]
        _NATIVE['lib'] = lib
        return True
    except Exception as exc:  # noqa: BLE001 — fall back to NumPy shims
        print('native kernels unavailable (%s); using NumPy shims' % exc,
              file=sys.stderr)
        return False


def _c64(a):
    return np.ascontiguousarray(a, dtype=np.float64)


# ---------------------------------------------------------------------------
# compatibility: the reference targets numpy<1.24 / statsmodels
# ---------------------------------------------------------------------------

def _install_numpy_aliases():
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        for name, alias in [('bool', bool), ('int', int), ('float', float),
                            ('object', object)]:
            if not hasattr(np, name):
                setattr(np, name, alias)


def _install_sklearn_compat():
    """sklearn >= 1.6 renamed check_array's force_all_finite kwarg; the
    reference (sklearn ~0.22 era) still passes the old name.  Patched in
    BOTH public locations — the reference's estimators import it from
    sklearn.utils, its imputer from sklearn.utils.validation."""
    import sklearn.utils as sku
    import sklearn.utils.validation as skv
    orig = skv.check_array

    def check_array(*args, **kwargs):
        if 'force_all_finite' in kwargs:
            kwargs['ensure_all_finite'] = kwargs.pop('force_all_finite')
        return orig(*args, **kwargs)

    sku.check_array = check_array
    skv.check_array = check_array


def _yule_walker(x, order=1, method='adjusted', demean=True):
    """Minimal statsmodels.regression.linear_model.yule_walker equivalent
    (AR(p) fit from the Yule-Walker equations); returns (rho, sigma)."""
    x = np.asarray(x, dtype=float)
    if demean:
        x = x - x.mean()
    n = len(x)
    r = np.zeros(order + 1)
    r[0] = x.dot(x) / n
    for k in range(1, order + 1):
        denom = n - k if method == 'adjusted' else n
        r[k] = x[:-k].dot(x[k:]) / denom
    from scipy.linalg import toeplitz
    rho = np.linalg.solve(toeplitz(r[:-1]), r[1:])
    sigmasq = r[0] - r[1:].dot(rho)
    return rho, np.sqrt(max(sigmasq, 0.0))


def _install_statsmodels_shim():
    if 'statsmodels.regression.linear_model' in sys.modules:
        return
    sm = types.ModuleType('statsmodels')
    reg = types.ModuleType('statsmodels.regression')
    lin = types.ModuleType('statsmodels.regression.linear_model')
    lin.yule_walker = _yule_walker
    sm.regression = reg
    reg.linear_model = lin
    sys.modules.setdefault('statsmodels', sm)
    sys.modules.setdefault('statsmodels.regression', reg)
    sys.modules['statsmodels.regression.linear_model'] = lin


# ---------------------------------------------------------------------------
# NumPy shims of the reference Cython kernels
# ---------------------------------------------------------------------------

def _log1pexp(eta):
    # log(1 + exp(eta)), stable (the .pyx kernels rely on float64 headroom)
    return np.logaddexp(0.0, eta)


def spherical_normal_log_pdf(x, mean, var):
    """gaussian_likelihood_fast.pyx:17-27."""
    x = np.asarray(x)
    diff = x - np.asarray(mean)
    return (-0.5 * x.shape[-1] * np.log(2 * np.pi * var)
            - 0.5 * np.sum(diff * diff, axis=-1) / var)


def compute_gaussian_likelihood(X, mu, sigma, lmbda, normalize=True):
    """gaussian_likelihood_fast.pyx:30-54: (T, K) emission matrix of
    N(X_t ; mean_tk, sigma_k I) with mean_0k = mu_k and
    mean_tk = lmbda mu_k + (1 - lmbda) X_{t-1}."""
    if _NATIVE['lib'] is not None:
        X, mu, sigma = _c64(X), _c64(mu), _c64(sigma)
        T, d = X.shape
        K = sigma.shape[0]
        out = np.empty((T, K))
        _NATIVE['lib'].gaussian_likelihood(X, mu, sigma, float(lmbda), T, K,
                                           d, int(bool(normalize)), out)
        return out
    X = np.asarray(X, float)
    mu = np.asarray(mu, float)
    sigma = np.asarray(sigma, float)
    T, d = X.shape
    K = sigma.shape[0]
    means = np.empty((T, K, d))
    means[0] = mu
    if T > 1:
        means[1:] = lmbda * mu[None, None] + (1 - lmbda) * X[:-1, None]
    diff = X[:, None, :] - means
    ll = (-0.5 * d * np.log(2 * np.pi * sigma)[None, :]
          - 0.5 * np.sum(diff * diff, axis=-1) / sigma[None, :])
    if normalize:
        ll -= ll.max(axis=1, keepdims=True)
    return np.exp(ll)


def partial_loglikelihood(Y, X, intercept, node_id, squared=False):
    """static_network_fast.pyx:17-44: one node's row of Bernoulli terms."""
    if _NATIVE['lib'] is not None:
        Y, X = _c64(Y), _c64(X)
        return _NATIVE['lib'].partial_loglik(
            Y, X, float(np.ndarray.item(np.asarray(intercept))),
            int(node_id), X.shape[0], X.shape[1], int(bool(squared)))
    Y = np.asarray(Y, float)
    X = np.asarray(X, float)
    d2 = np.sum((X - X[node_id]) ** 2, axis=-1)
    dist = d2 if squared else np.sqrt(d2)
    eta = intercept - dist
    ll = Y[node_id] * eta - _log1pexp(eta)
    ll[node_id] = 0.0
    return ll.sum()


def approx_partial_loglikelihood(X, intercept, edges, degrees, control_nodes,
                                 node_id, squared=False):
    """static_network_fast.pyx:47-94: case-control variant (exact edge terms
    plus a scaled control estimate of the non-edge mass)."""
    X = np.asarray(X, float)
    n = X.shape[0]
    deg = int(degrees[node_id])
    e = np.asarray(edges[node_id][:deg], dtype=int)
    d2 = np.sum((X[e] - X[node_id]) ** 2, axis=-1)
    dist = d2 if squared else np.sqrt(d2)
    eta = intercept - dist
    loglik = np.sum(eta - _log1pexp(eta))

    ctrl = np.asarray(control_nodes[node_id], dtype=int)
    ctrl = ctrl[ctrl != -1]
    d2 = np.sum((X[ctrl] - X[node_id]) ** 2, axis=-1)
    dist = d2 if squared else np.sqrt(d2)
    eta = intercept - dist
    control = np.sum(_log1pexp(eta))
    loglik -= (n - deg - 1) / max(len(ctrl), 1) * control
    return loglik


def _directed_eta(dist, radii, b_in, b_out):
    # eta_tij = b_in (1 - d/r_j) + b_out (1 - d/r_i)
    # (directed_likelihoods_fast.pyx:199-202)
    return (b_in * (1.0 - dist / radii[..., None, :])
            + b_out * (1.0 - dist / radii[..., :, None]))


def directed_network_loglikelihood_fast(Y, dist, radii, b_in, b_out):
    """directed_likelihoods_fast.pyx:185-205."""
    Y = np.asarray(Y, float)
    dist = np.asarray(dist, float)
    radii = np.asarray(radii, float)
    eta = _directed_eta(dist, radii, b_in, b_out)
    ll = Y * eta - _log1pexp(eta)
    n = Y.shape[-1]
    off = ~np.eye(n, dtype=bool)
    return float(np.sum(ll * off))


def directed_partial_loglikelihood(Y, X, radii, intercept_in, intercept_out,
                                   node_id, squared=False):
    """directed_likelihoods_fast.pyx:46-80: outgoing + incoming terms for
    one node."""
    if _NATIVE['lib'] is not None:
        Y, X, radii = _c64(Y), _c64(X), _c64(radii)
        return _NATIVE['lib'].directed_partial_loglik(
            Y, X, radii, float(np.ndarray.item(np.asarray(intercept_in))),
            float(np.ndarray.item(np.asarray(intercept_out))),
            int(node_id), X.shape[0], X.shape[1], int(bool(squared)))
    Y = np.asarray(Y, float)
    X = np.asarray(X, float)
    radii = np.asarray(radii, float)
    d2 = np.sum((X - X[node_id]) ** 2, axis=-1)
    dist = d2 if squared else np.sqrt(d2)
    r_node = radii[node_id]
    eta_out = (intercept_in * (1.0 - dist / radii)
               + intercept_out * (1.0 - dist / r_node))
    eta_in = (intercept_in * (1.0 - dist / r_node)
              + intercept_out * (1.0 - dist / radii))
    ll = Y[node_id] * eta_out - _log1pexp(eta_out)
    ll += Y[:, node_id] * eta_in - _log1pexp(eta_in)
    ll[node_id] = 0.0
    return ll.sum()


def approx_directed_partial_loglikelihood(X, radii, in_edges, out_edges,
                                          degree, control_nodes_in,
                                          control_nodes_out, intercept_in,
                                          intercept_out, node_id,
                                          squared=False):
    """directed_likelihoods_fast.pyx:83-182."""
    X = np.asarray(X, float)
    radii = np.asarray(radii, float)
    n = X.shape[0]
    in_deg = int(degree[node_id, 0])
    out_deg = int(degree[node_id, 1])

    def dists(idx):
        d2 = np.sum((X[idx] - X[node_id]) ** 2, axis=-1)
        return d2 if squared else np.sqrt(d2)

    loglik = 0.0
    e_in = np.asarray(in_edges[node_id][:in_deg], dtype=int)
    dist = dists(e_in)
    eta = (intercept_in * (1.0 - dist / radii[node_id])
           + intercept_out * (1.0 - dist / radii[e_in]))
    loglik += np.sum(eta - _log1pexp(eta))

    e_out = np.asarray(out_edges[node_id][:out_deg], dtype=int)
    dist = dists(e_out)
    eta = (intercept_in * (1.0 - dist / radii[e_out])
           + intercept_out * (1.0 - dist / radii[node_id]))
    loglik += np.sum(eta - _log1pexp(eta))

    # control terms: both loops stop at the first -1 in control_nodes_in
    # (reproducing the reference's shared break condition, pyx:137,160)
    ctrl_mask = np.asarray(control_nodes_in[node_id], dtype=int) != -1
    stop = int(np.argmin(ctrl_mask)) if not ctrl_mask.all() \
        else len(ctrl_mask)
    c_in = np.asarray(control_nodes_in[node_id][:stop], dtype=int)
    dist = dists(c_in)
    eta = (intercept_in * (1.0 - dist / radii[node_id])
           + intercept_out * (1.0 - dist / radii[c_in]))
    loglik -= (n - in_deg - 1) / max(stop, 1) * np.sum(_log1pexp(eta))

    c_out = np.asarray(control_nodes_out[node_id][:stop], dtype=int)
    dist = dists(c_out)
    eta = (intercept_in * (1.0 - dist / radii[c_out])
           + intercept_out * (1.0 - dist / radii[node_id]))
    loglik -= (n - out_deg - 1) / max(stop, 1) * np.sum(_log1pexp(eta))
    return loglik


def approx_directed_network_loglikelihood(X, radii, out_edges, degree,
                                          control_nodes, intercept_in,
                                          intercept_out, squared=False):
    """directed_likelihoods_fast.pyx:208-270."""
    X = np.asarray(X, float)
    radii = np.asarray(radii, float)
    T, n, _ = X.shape
    loglik = 0.0
    for t in range(T):
        for i in range(n):
            out_deg = int(degree[t, i, 1])
            e = np.asarray(out_edges[t, i][:out_deg], dtype=int)
            d2 = np.sum((X[t, e] - X[t, i]) ** 2, axis=-1)
            dist = d2 if squared else np.sqrt(d2)
            eta = (intercept_in * (1.0 - dist / radii[e])
                   + intercept_out * (1.0 - dist / radii[i]))
            loglik += np.sum(eta - _log1pexp(eta))

            ctrl = np.asarray(control_nodes[t, i], dtype=int)
            mask = ctrl != -1
            stop = int(np.argmin(mask)) if not mask.all() else len(mask)
            c = ctrl[:stop]
            d2 = np.sum((X[t, c] - X[t, i]) ** 2, axis=-1)
            dist = d2 if squared else np.sqrt(d2)
            eta = (intercept_in * (1.0 - dist / radii[c])
                   + intercept_out * (1.0 - dist / radii[i]))
            loglik -= ((n - out_deg - 1) / max(stop, 1)
                       * np.sum(_log1pexp(eta)))
    return loglik


def directed_network_probas(dist, radii, intercept_in, intercept_out):
    """directed_likelihoods_fast.pyx:273-294."""
    dist = np.asarray(dist, float)
    radii = np.asarray(radii, float)
    eta = _directed_eta(dist, radii, intercept_in, intercept_out)
    probas = 1.0 / (1.0 + np.exp(-eta))
    n = dist.shape[-1]
    probas = probas * ~np.eye(n, dtype=bool)
    return probas


def directed_intercept_grad(Y, dist, radii, intercept_in, intercept_out):
    """directed_likelihoods_fast.pyx:20-43."""
    Y = np.asarray(Y, float)
    dist = np.asarray(dist, float)
    radii = np.asarray(radii, float)
    d_in = 1.0 - dist / radii[None, None, :]
    d_out = 1.0 - dist / radii[None, :, None]
    eta = intercept_in * d_in + intercept_out * d_out
    n = Y.shape[-1]
    step = (Y - 1.0 / (1.0 + np.exp(-eta))) * ~np.eye(n, dtype=bool)
    return np.array([np.sum(d_in * step), np.sum(d_out * step)])


# --- forecast.pyx ----------------------------------------------------------

def _mixture_normal_pdf(x, x_prev, weights, lmbda, mean, sigma):
    """forecast.pyx:37-54: sum_k w_k N(x ; lmbda mu_k + (1-lmbda) x_prev,
    sigma_k I)."""
    mu = lmbda * mean + (1.0 - lmbda) * x_prev[None, :]
    diff = x[None, :] - mu
    d = x.shape[0]
    dens = (np.exp(-0.5 * np.sum(diff * diff, axis=-1) / sigma)
            / (2 * np.pi * sigma) ** (0.5 * d))
    return float(np.dot(weights, dens))


def marginal_forecast(x, x_prev, z, trans_weights, mus, sigmas, intercepts,
                      lmbdas, renormalize=True):
    """forecast.pyx:79-128: posterior-marginalised one-step-ahead edge
    probabilities (importance-weighted over posterior samples)."""
    x = np.asarray(x, float)
    x_prev = np.asarray(x_prev, float)
    S, n, _ = x_prev.shape
    sum_w = np.zeros((n, n))
    probas = np.zeros((n, n))
    for s in range(S):
        if renormalize:
            zs, weights, mean, sigma = renormalize_weights(
                z[s], trans_weights[s], mus[s], sigmas[s])
        else:
            zs, weights, mean, sigma = (z[s], trans_weights[s], mus[s],
                                        sigmas[s])
        w_node = np.array([
            _mixture_normal_pdf(x[i], x_prev[s, i], weights[zs[i]],
                                lmbdas[s], mean, sigma)
            for i in range(n)])
        dij = np.sqrt(np.sum((x[:, None] - x[None]) ** 2, axis=-1))
        wij = w_node[:, None] * w_node[None, :]
        tri = np.tril(np.ones((n, n), bool), k=-1)
        probas += np.where(tri, wij / (1 + np.exp(dij - intercepts[s])),
                           0.0) / S
        sum_w += np.where(tri, wij, 0.0) / S
    sum_w += sum_w.T
    np.fill_diagonal(sum_w, 1.0)
    probas += probas.T
    return probas / sum_w


def renormalize_weights(z, weights, means, sigmas):
    """forecast.pyx:57-67: restrict parameters to the occupied clusters."""
    active = np.unique(z)
    w = weights[active][:, active]
    w /= w.sum(axis=1, keepdims=True)
    relabel = {old: new for new, old in enumerate(active)}
    zs = np.array([relabel[v] for v in z], dtype=np.int64)
    return zs, w, means[active], sigmas[active]


# ---------------------------------------------------------------------------
# loader
# ---------------------------------------------------------------------------

def load_reference(path=REFERENCE_PATH):
    """Import the reference ``dynetlsm`` package with the shims installed."""
    _install_numpy_aliases()
    _install_sklearn_compat()
    _install_statsmodels_shim()
    if path not in sys.path:
        sys.path.insert(0, path)

    shims = {
        'gaussian_likelihood_fast': {
            'compute_gaussian_likelihood': compute_gaussian_likelihood,
            'spherical_normal_log_pdf': spherical_normal_log_pdf},
        'static_network_fast': {
            'partial_loglikelihood': partial_loglikelihood,
            'approx_partial_loglikelihood': approx_partial_loglikelihood},
        'directed_likelihoods_fast': {
            'directed_network_loglikelihood_fast':
                directed_network_loglikelihood_fast,
            'directed_partial_loglikelihood':
                directed_partial_loglikelihood,
            'approx_directed_partial_loglikelihood':
                approx_directed_partial_loglikelihood,
            'approx_directed_network_loglikelihood':
                approx_directed_network_loglikelihood,
            'directed_network_probas': directed_network_probas,
            'directed_intercept_grad': directed_intercept_grad},
        'forecast': {
            'marginal_forecast': marginal_forecast,
            'renormalize_weights': renormalize_weights},
    }
    for mod_name, symbols in shims.items():
        full = 'dynetlsm.' + mod_name
        if full not in sys.modules:
            mod = types.ModuleType(full)
            for sym, fn in symbols.items():
                setattr(mod, sym, fn)
            sys.modules[full] = mod

    import dynetlsm
    return dynetlsm


# ---------------------------------------------------------------------------
# statistic generation (the numbers cited in the equivalence tests)
# ---------------------------------------------------------------------------

def sampson_lsm_stats():
    ref = load_reference()
    from dynetlsm.datasets import load_monks
    Y, _, _ = load_monks(is_directed=False)
    model = ref.DynamicNetworkLSM(n_iter=2000, tune=1000, burn=1000,
                                  random_state=42).fit(Y)
    nb = model.n_burn_
    return {
        'auc': round(float(model.auc_), 4),
        'intercept_mean': round(float(model.intercepts_[nb:].mean()), 4),
        'intercept_sd': round(float(model.intercepts_[nb:].std()), 4),
        'logp_mean': round(float(model.logps_[nb:].mean()), 3),
        'logp_sd': round(float(model.logps_[nb:].std()), 3),
        'x_norm_mean': round(
            float(np.linalg.norm(model.Xs_[nb:], axis=-1).mean()), 4),
    }


def sampson_hdp_stats(n_iter=3000, tune=1000, burn=1000):
    # native C kernels (parity <= 1e-12): the full 200k-sweep budget drops
    # from ~2.4 h (NumPy shims) to ~40 min without changing the statistics
    enable_native_kernels()
    ref = load_reference()
    from dynetlsm.datasets import load_monks
    Y, _, _ = load_monks(is_directed=False)
    model = ref.DynamicNetworkHDPLPCM(n_iter=n_iter, tune=tune, burn=burn,
                                      n_components=10, random_state=42).fit(Y)
    nb = model.n_burn_
    vals, freqs = np.unique(
        np.array([len(np.unique(zt)) for zt in
                  model.zs_[nb:].reshape(len(model.zs_[nb:]), -1)]),
        return_counts=True)
    return {
        'auc': round(float(model.auc_), 4),
        # posterior-mean-probas AUC: the estimator without the single-
        # VI-sample variance that makes the selected-sample AUC row soft
        'posterior_mean_auc': round(_posterior_mean_auc_ref(model, Y), 4),
        'lambda_mean': round(float(model.lambdas_[nb:].mean()), 4),
        'lambda_sd': round(float(model.lambdas_[nb:].std()), 4),
        'intercept_mean': round(float(model.intercepts_[nb:].mean()), 4),
        'intercept_sd': round(float(model.intercepts_[nb:].std()), 4),
        'mode_clusters': int(vals[np.argmax(freqs)]),
    }


def sampson_directed_lsm_stats():
    """Directed Sampson LSM (social-radii model, lsm.py:392-397 init path)
    — reference numbers for tests/test_equivalence_directed.py."""
    ref = load_reference()
    from dynetlsm.datasets import load_monks
    Y, _, _ = load_monks(is_directed=True)
    model = ref.DynamicNetworkLSM(n_iter=2000, tune=1000, burn=1000,
                                  is_directed=True, random_state=42).fit(Y)
    nb = model.n_burn_
    b = model.intercepts_[nb:]
    return {
        'auc': round(float(model.auc_), 4),
        'intercept_in_mean': round(float(b[:, 0].mean()), 4),
        'intercept_in_sd': round(float(b[:, 0].std()), 4),
        'intercept_out_mean': round(float(b[:, 1].mean()), 4),
        'intercept_out_sd': round(float(b[:, 1].std()), 4),
        'logp_mean': round(float(model.logps_[nb:].mean()), 3),
        'logp_sd': round(float(model.logps_[nb:].std()), 3),
        'radii_max_mean': round(
            float(model.radiis_[nb:].max(axis=-1).mean()), 4),
        'radii_max_sd': round(
            float(model.radiis_[nb:].max(axis=-1).std()), 4),
    }


def _posterior_mean_auc_ref(model, Y, max_samples=2000):
    """Posterior-mean-probas AUC from the reference model's traces —
    the same estimator as dynetlsm_tpu.metrics.posterior_mean_auc
    (undirected: p_ij^(s) = expit(b_s - ||X_si - X_sj||), averaged over
    post-burn draws)."""
    from scipy.special import expit
    from sklearn.metrics import roc_auc_score
    nb = model.n_burn_
    Xs = model.Xs_[nb:]
    bs = np.ravel(model.intercepts_)[nb:]
    step = max(1, Xs.shape[0] // max_samples)
    Xs, bs = Xs[::step], bs[::step]
    T_, n_ = Xs.shape[1], Xs.shape[2]
    total = np.zeros((T_, n_, n_))
    for s in range(Xs.shape[0]):
        diff = Xs[s][:, :, None, :] - Xs[s][:, None, :, :]
        dist = np.sqrt(np.sum(diff * diff, axis=-1))
        total += expit(bs[s] - dist)
    probas = total / Xs.shape[0]
    iu = np.triu_indices(n_, k=1)
    y = np.concatenate([np.asarray(Y)[t][iu] for t in range(T_)])
    p = np.concatenate([probas[t][iu] for t in range(T_)])
    return roc_auc_score(y, p)


def realdata_stats(n_iter=2000, tune=500, burn=500, K=25, only=None):
    """GoT + alliances quality rows at the budget matched by
    scripts/reproduce_notebooks.py real_data_quality(): in-sample
    (selected + posterior-mean) AUC, held-out dyad AUC, one-step forecast
    AUC — the reference package computing each with its own machinery
    (imputer + missings_ Gibbs trace, forecast.pyx marginal forecast).

    ``only='<dataset>:<fit>'`` (e.g. ``got:full``, ``alliances:forecast``)
    restricts the run to one of the six independent fits so they can run
    as parallel single-core processes — the reference needs ~30-60 min
    per GoT fit, so the serial sweep does not finish in a working
    session."""
    from sklearn.metrics import roc_auc_score
    ref = load_reference()
    enable_native_kernels()
    try:
        from dynetlsm.datasets import load_got, load_alliances
        load_got()          # probe: fails on pandas >= 2.1 string dtype
    except TypeError:
        # the reference's load_got assigns integer codes into a string
        # column (load_got.py:56), which modern pandas rejects; the repo
        # loaders ship the same raw_data with the same preprocessing
        # (datasets/loaders.py), so feed those arrays to the reference
        # *model* instead
        os.environ.setdefault('JAX_PLATFORMS', 'cpu')
        repo_root = os.path.dirname(_HERE)
        if repo_root not in sys.path:
            sys.path.insert(0, repo_root)
        from dynetlsm_tpu.datasets import load_got, load_alliances
    from dynetlsm.model_selection import train_test_split
    from dynetlsm.metrics import out_of_sample_auc

    want_ds, want_fit = (only.split(':') if only else (None, None))
    out = {}
    for name, loader in (('got', load_got), ('alliances', load_alliances)):
        if want_ds and name != want_ds:
            continue
        Y = loader()[0]

        def make():
            return ref.DynamicNetworkHDPLPCM(
                n_components=K, n_iter=n_iter, tune=tune, burn=burn,
                selection_type='vi', random_state=42)

        t0 = time.time()
        stats = {}
        if want_fit in (None, 'full'):
            full = make().fit(Y)
            stats['insample_auc'] = round(float(full.auc_), 4)
            stats['posterior_mean_auc'] = round(
                _posterior_mean_auc_ref(full, Y), 4)
        if want_fit in (None, 'heldout'):
            Y_obs, test_idx = train_test_split(Y, test_size=0.1,
                                               random_state=3)
            held = make().fit(Y_obs)
            stats['heldout_auc'] = round(
                float(out_of_sample_auc(Y, held.missings_, test_idx)), 4)
        if want_fit in (None, 'forecast'):
            fore = make().fit(Y[:-1])
            idx = np.tril_indices(Y.shape[1], k=-1)
            stats['onestep_auc'] = round(float(roc_auc_score(
                Y[-1][idx], fore.forecast_probas_marginalized_[idx])), 4)
        stats['wall_clock_s'] = round(time.time() - t0, 1)
        out[name] = stats
        print(json.dumps({name: stats}, indent=2), flush=True)
    return out


def northstar_timing(n_sweeps=20, T=10, n=500, K=25, directed=False,
                     n_control=None):
    """Time the reference HDP-LPCM Gibbs loop at the BASELINE.json
    north-star scale (T=10, n=500, K=25) on the same synthetic network
    bench.py uses — the measured denominator for bench.py's north-star
    ``vs_baseline`` fields.

    The hot kernels run as compiled C (enable_native_kernels) so the rate
    reflects the reference's Cython-level speed, not NumPy shim overhead.
    Each tqdm tick of the main ``_fit`` loop (hdp_lpcm.py:823) is
    timestamped; the per-sweep rate is the median interval, which excludes
    ``init_sampler``'s nested LSM run, GMDS, and post-loop selection.
    """
    enable_native_kernels()
    ref = load_reference()
    repo_root = os.path.dirname(_HERE)
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    from bench import northstar_network
    Y = northstar_network(T=T, n=n, directed=directed)

    import dynetlsm.hdp_lpcm as mod
    ticks = []

    def timing_tqdm(iterable, **kw):
        for item in iterable:
            ticks.append(time.perf_counter())
            yield item
        ticks.append(time.perf_counter())

    orig = mod.tqdm
    mod.tqdm = timing_tqdm
    try:
        kwargs = {}
        if n_control:
            kwargs['n_control'] = int(n_control)     # directed-only in ref
            kwargs['n_resample_control'] = 100
        model = ref.DynamicNetworkHDPLPCM(
            n_iter=n_sweeps, tune=None, burn=None, n_components=K,
            is_directed=directed, random_state=42, **kwargs)
        try:
            model.fit(Y)
        except Exception as exc:  # noqa: BLE001
            # post-loop diagnostics can fail on a deliberately tiny run
            # (e.g. Geweke's Yule-Walker is singular on ~20 logp samples);
            # the loop ticks are already recorded, which is all we need
            if len(ticks) < 3:
                raise
            print('post-loop failure ignored for timing: %r' % exc,
                  file=sys.stderr)
    finally:
        mod.tqdm = orig
    dts = np.diff(np.asarray(ticks))
    rate = 1.0 / float(np.median(dts))
    return {
        'workload': 'T=%d, n=%d, K=%d, %s%s' % (
            T, n, K, 'directed' if directed else 'undirected',
            ', case-control m=%d' % n_control if n_control else ''),
        'n_sweeps_timed': int(len(dts)),
        'sweeps_per_sec': round(rate, 4),
        'median_sweep_seconds': round(float(np.median(dts)), 4),
        'native_kernels': _NATIVE['lib'] is not None,
    }


if __name__ == '__main__':
    # usage: reference_shim.py [all|lsm|hdp|directed] [n_iter tune burn]
    # (the budget override applies to the HDP run — e.g. ``hdp 20000 5000
    # 5000`` regenerates the docs/reproductions.md quality row at a budget
    # matched to the TPU column instead of the 3k test-oracle default)
    which = sys.argv[1] if len(sys.argv) > 1 else 'all'
    budget = ([int(v) for v in sys.argv[2:5]]
              if which == 'hdp' and len(sys.argv) > 2 else [])
    out = {}
    if which in ('all', 'lsm'):
        out['sampson_lsm'] = sampson_lsm_stats()
        print(json.dumps(out, indent=2))
    if which in ('all', 'hdp'):
        out['sampson_hdp'] = sampson_hdp_stats(*budget)
        print(json.dumps(out, indent=2))
    if which in ('all', 'directed'):
        out['sampson_directed_lsm'] = sampson_directed_lsm_stats()
        print(json.dumps(out, indent=2))
    if which == 'realdata':
        # reference_shim.py realdata [n_iter tune burn] [ds:fit] — budgets
        # must match scripts/reproduce_notebooks.py real_data_quality();
        # the optional ds:fit selector (got:full ... alliances:forecast)
        # runs one of the six independent fits (parallel single-core jobs)
        rd_budget = [int(v) for v in sys.argv[2:5]]
        only = next((a for a in sys.argv[2:] if ':' in a), None)
        out['realdata'] = realdata_stats(*rd_budget, only=only)
        print(json.dumps(out, indent=2))
    if which == 'northstar':
        # reference_shim.py northstar [n_sweeps] [directed] [cc<M>]
        n_sweeps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
        cc = [a for a in sys.argv[3:] if a.startswith('cc')]
        out['northstar_timing'] = northstar_timing(
            n_sweeps=n_sweeps, directed='directed' in sys.argv[3:],
            n_control=int(cc[0][2:]) if cc else None)
        print(json.dumps(out, indent=2))
