"""Reference public-API compatibility surface.

Every symbol a reference (joshloyal/dynetlsm) user could import has a
same-named equivalent here; these tests pin the behavioural contracts of
the thin compatibility layer added for parity (loaders, distribution pdfs,
dispatchers, gradient helpers, trace utilities, functional MH steps).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scipy import stats


def test_load_dynamic_and_static_monks():
    # reference load_monks.py:22-71 — the split loaders are public API
    from dynetlsm_tpu.datasets import load_dynamic_monks, load_static_monks
    Y, groups, names = load_dynamic_monks(is_directed=False)
    assert Y.shape == (3, 18, 18)
    assert groups.shape == (3, 18)
    assert names.shape == (18,)
    assert np.allclose(Y, Y.transpose(0, 2, 1))

    Ys, gs = load_static_monks(is_directed=True)
    assert Ys.shape == (18, 18)
    assert gs.shape == (18,)


def test_spherical_normal_pdfs():
    # reference distributions.py:22-39
    from dynetlsm_tpu.math.distributions import (
        spherical_normal_log_pdf, spherical_normal_pdf)
    rng = np.random.RandomState(0)
    x = rng.randn(2)
    mean = rng.randn(2)
    var = 0.7
    want = stats.multivariate_normal.logpdf(x, mean, var * np.eye(2))
    got = float(spherical_normal_log_pdf(jnp.asarray(x), jnp.asarray(mean),
                                         var))
    assert np.isclose(got, want, rtol=1e-5)
    assert np.isclose(float(spherical_normal_pdf(jnp.asarray(x),
                                                 jnp.asarray(mean), var)),
                      np.exp(want), rtol=1e-5)
    # batched over leading axes
    xb = rng.randn(5, 3, 2)
    out = spherical_normal_log_pdf(jnp.asarray(xb), jnp.asarray(mean), var)
    assert out.shape == (5, 3)


def test_sample_categorical_frequencies():
    # reference distributions.py:13-19 (host cdf walk) -> batched Gumbel-max
    from dynetlsm_tpu.math.distributions import sample_categorical
    probas = jnp.asarray(np.tile([0.1, 0.7, 0.2], (8000, 1)))
    z = np.asarray(sample_categorical(jax.random.PRNGKey(0), probas))
    freqs = np.bincount(z, minlength=3) / 8000
    assert np.allclose(freqs, [0.1, 0.7, 0.2], atol=0.03)


def test_dynamic_network_loglikelihood_dispatch():
    # reference network_likelihoods.py:16-23
    from dynetlsm_tpu.ops.likelihoods import (
        dynamic_network_loglikelihood,
        dynamic_network_loglikelihood_undirected,
        dynamic_network_loglikelihood_directed)
    rng = np.random.RandomState(2)
    X = jnp.asarray(rng.randn(2, 8, 2), jnp.float32)
    Y = jnp.asarray((rng.uniform(size=(2, 8, 8)) < 0.4), jnp.float32)
    radii = jnp.asarray(rng.uniform(0.5, 1.0, size=8), jnp.float32)

    und = dynamic_network_loglikelihood(Y, X, 0.3)
    assert np.isclose(float(und), float(
        dynamic_network_loglikelihood_undirected(Y, X, 0.3)))

    dire = dynamic_network_loglikelihood(Y, X, jnp.asarray([0.3, -0.2]),
                                         radii=radii)
    assert np.isclose(float(dire), float(
        dynamic_network_loglikelihood_directed(Y, X, 0.3, -0.2, radii)))


def test_intercept_and_scale_grads_match_reference_formulas():
    # reference lsm.py:32-44 — autodiff on the jitted likelihood must equal
    # the hand-written gradient formulas
    from scipy.special import expit
    from dynetlsm_tpu.math.init import (
        calculate_distances, undirected_intercept_grad, scale_grad)
    rng = np.random.RandomState(3)
    X = rng.randn(3, 10, 2)
    Y = np.zeros((3, 10, 10))
    for t in range(3):
        upper = np.triu(rng.uniform(size=(10, 10)) < 0.3, k=1)
        Y[t] = upper + upper.T

    dist = calculate_distances(X)
    assert dist.shape == (3, 10, 10)
    assert calculate_distances(X[0]).shape == (10, 10)

    eta = 0.4 - dist
    g_ref = Y - expit(eta)
    want_b = 0.5 * (np.sum(g_ref) - np.einsum('ikk', g_ref).sum())
    assert np.isclose(undirected_intercept_grad(Y, X, 0.4), want_b,
                      rtol=1e-4)

    sd = np.exp(0.2) * dist
    eta = 0.4 - sd
    g_ref = -sd * (Y - expit(eta))
    want_s = np.sum(g_ref) - np.einsum('ikk', g_ref).sum()
    assert np.isclose(scale_grad(Y, X, 0.4, 0.2), want_s, rtol=1e-4)


def test_xcorr_and_spectrum_helpers():
    # reference trace_utils.py:9-56
    from dynetlsm_tpu.diagnostics import (
        mean_detrend, xcorr, aic_ar, spec0_ar, spectrum0_ar, _yule_walker)
    rng = np.random.RandomState(4)
    x = rng.randn(500)
    assert np.isclose(mean_detrend(x).mean(), 0.0, atol=1e-12)

    lags, correls = xcorr(x, x, maxlags=10)
    assert lags.shape == (21,) and correls.shape == (21,)
    assert np.isclose(correls[10], 1.0)          # lag 0 of the normed acf
    assert np.allclose(correls, correls[::-1], atol=1e-10)  # symmetric

    with pytest.raises(ValueError):
        xcorr(x, x[:-1])
    with pytest.raises(ValueError):
        xcorr(x, x, maxlags=0)

    # spectrum0_ar's best model is the (aic_ar, spec0_ar) minimiser
    coefs, sigma = _yule_walker(x, 1)
    assert np.isclose(aic_ar(sigma, 500, 1),
                      2 * 500 * np.log(sigma) + 4)
    assert np.isclose(spec0_ar(sigma, coefs),
                      sigma ** 2 / (1 - coefs.sum()) ** 2)
    var0, order = spectrum0_ar(x)
    assert var0 > 0 and order >= 1


def test_log_normalize():
    # reference sample_labels.py:8-13
    from dynetlsm_tpu.mcmc.labels import log_normalize
    logits = jnp.asarray([[0.0, 1.0, 2.0], [-1.0, -1.0, -1.0]])
    p = np.asarray(log_normalize(logits))
    assert np.allclose(p.sum(axis=-1), 1.0, atol=1e-6)
    assert np.allclose(p[1], 1.0 / 3.0, atol=1e-6)
    want = np.exp([0.0, 1.0, 2.0]) / np.exp([0.0, 1.0, 2.0]).sum()
    assert np.allclose(p[0], want, atol=1e-6)


def test_random_walk_metropolis_standard_normal():
    # reference metropolis.py:40-55 — the functional step targets the
    # correct distribution
    from dynetlsm_tpu.mcmc.metropolis import random_walk_metropolis
    logp = lambda x: -0.5 * jnp.sum(x * x)

    @jax.jit
    def run(key, x0):
        def step(x, k):
            x_new, acc, _ = random_walk_metropolis(k, x, logp, 1.2)
            return x_new, x_new
        keys = jax.random.split(key, 3000)
        _, xs = jax.lax.scan(step, x0, keys)
        return xs

    xs = np.asarray(run(jax.random.PRNGKey(0), jnp.zeros(2)))[500:]
    assert np.abs(xs.mean(axis=0)).max() < 0.3
    assert np.abs(xs.std(axis=0) - 1.0).max() < 0.3


def test_metropolis_class_tunes_and_samples():
    # reference metropolis.py:85-136
    from dynetlsm_tpu.mcmc.metropolis import Metropolis
    logp = lambda x: -0.5 * jnp.sum(x * x)
    mh = Metropolis(step_size=40.0, tune=400, tune_interval=50, seed=3)
    x = jnp.zeros(2)
    xs = []
    for _ in range(1500):
        x = mh.step(x, logp)
        xs.append(np.asarray(x))
    # the absurd initial step size must have been tuned down
    assert mh.step_size < 40.0
    xs = np.asarray(xs[600:])
    assert np.abs(xs.mean(axis=0)).max() < 0.4
    assert np.abs(xs.std(axis=0) - 1.0).max() < 0.4

    with pytest.raises(ValueError):
        Metropolis(proposal_type='hamiltonian')


def test_procrustes_reference_names():
    # reference procrustes.py:6-27
    from dynetlsm_tpu.math.procrustes import (
        flatten_array, compute_procrustes_rotation, procrustes_rotation)
    assert compute_procrustes_rotation is procrustes_rotation
    X = jnp.asarray(np.random.RandomState(0).randn(3, 5, 2))
    flat = flatten_array(X)
    assert flat.shape == (15, 2)


def test_plot_palette_helpers():
    # reference plots.py:44-60
    from dynetlsm_tpu.plots import flatten, cmap_to_hex, get_color20
    assert flatten([[1, 2], [3]]) == [1, 2, 3]
    colors = get_color20()
    assert len(colors) == 20
    assert all(c.startswith('#') for c in colors)
    import matplotlib.pyplot as plt
    assert len(cmap_to_hex(plt.get_cmap('tab20'))) == 20
    # the low-contrast first pair is swapped
    raw = cmap_to_hex(plt.get_cmap('tab20'))
    assert colors[1] == raw[2] and colors[2] == raw[1]


def test_posterior_vi_oracle_parity():
    # reference posterior_vi.py:10-20 keeps the per-node loop as the test
    # oracle; all three vectorised variants must agree with it
    from dynetlsm_tpu.model_selection import (
        nonvectorized_posterior_expected_vi, posterior_expected_vi,
        time_averaged_posterior_expected_vi, batched_posterior_expected_vi)
    rng = np.random.RandomState(5)
    S, T, n, K = 4, 3, 30, 5
    zs = rng.randint(0, K, size=(S, T, n))
    # a valid co-occurrence probability field in (0, 1]
    C = np.clip(rng.uniform(size=(T, n, n)), 0.05, None)
    C = 0.5 * (C + C.transpose(0, 2, 1))
    for t in range(T):
        np.fill_diagonal(C[t], 1.0)

    for s in range(S):
        for t in range(T):
            want = nonvectorized_posterior_expected_vi(zs[s, t], C[t])
            got = posterior_expected_vi(zs[s, t], C[t])
            assert np.isclose(got, want, rtol=1e-6), (s, t)
        want_t = time_averaged_posterior_expected_vi(zs[s], C)
        assert np.isclose(want_t,
                          np.mean([nonvectorized_posterior_expected_vi(
                              zs[s, t], C[t]) for t in range(T)]), rtol=1e-6)

    batched = batched_posterior_expected_vi(zs, C)
    want_all = [time_averaged_posterior_expected_vi(zs[s], C)
                for s in range(S)]
    assert np.allclose(batched, want_all, rtol=1e-4)
