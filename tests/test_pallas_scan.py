"""Fused Pallas node-scan kernel vs the XLA fori_loop implementation.

With an injected proposal stream both must realise the *identical* Markov
chain (same acceptances, same positions) — the kernel is a scheduling
change, not an algorithmic one.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynetlsm_tpu.ops.pallas_scan import _node_scan_with_noise
from dynetlsm_tpu.mcmc.latent import xla_exact_scan


def _xla_ref(Y, X, intercept, step, eps, log_u, radii=None, **kw):
    """The XLA fori_loop scan, called directly so the reference side never
    routes through the Pallas dispatch (on a TPU backend the model-layer
    entry point would select the kernel under test)."""
    b = jnp.atleast_1d(jnp.asarray(intercept, jnp.float32))
    return xla_exact_scan(
        jnp.asarray(Y), jnp.asarray(X), b, jnp.asarray(step),
        jnp.asarray(eps), jnp.asarray(log_u),
        radii=None if radii is None else jnp.asarray(radii),
        is_directed=radii is not None, **kw)


def _setup(rng, T=4, n=30, d=2):
    X = rng.randn(T, n, d).astype(np.float32)
    Y = rng.binomial(1, 0.2, (T, n, n)).astype(np.float32)
    for t in range(T):
        np.fill_diagonal(Y[t], 0)
    Y = np.triu(Y, 1) + np.transpose(np.triu(Y, 1), (0, 2, 1))
    step = np.full((T, n), 0.3, np.float32)
    eps = rng.randn(2, n, T, d).astype(np.float32)
    log_u = np.log(rng.rand(2, n, T)).astype(np.float32)
    return X, Y, step, eps, log_u


def test_pallas_scan_bitexact_lsm(rng):
    X, Y, step, eps, log_u = _setup(rng)
    X_xla, acc_xla = _xla_ref(Y, X, 1.0, step, eps, log_u,
                              tau_sq=2.0, sigma_sq=0.1, mixture=False)
    X_pal, acc_pal = _node_scan_with_noise(
        jnp.asarray(Y), jnp.asarray(X), 1.0, jnp.asarray(step),
        jnp.asarray(eps), jnp.asarray(log_u), tau_sq=2.0, sigma_sq=0.1,
        mixture=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(acc_xla), np.asarray(acc_pal))
    np.testing.assert_allclose(np.asarray(X_xla), np.asarray(X_pal),
                               atol=1e-6)


def test_pallas_scan_bitexact_mixture(rng):
    X, Y, step, eps, log_u = _setup(rng)
    T, n, d = X.shape
    K = 3
    mu = rng.randn(K, d).astype(np.float32)
    sig = (rng.rand(K) + 0.3).astype(np.float32)
    z = rng.randint(0, K, (T, n)).astype(np.int32)
    kwargs = dict(mu=jnp.asarray(mu), sigma=jnp.asarray(sig),
                  lmbda=jnp.float32(0.8), z=jnp.asarray(z), mixture=True)
    X_xla, acc_xla = _xla_ref(Y, X, 1.0, step, eps, log_u, **kwargs)
    X_pal, acc_pal = _node_scan_with_noise(
        jnp.asarray(Y), jnp.asarray(X), 1.0, jnp.asarray(step),
        jnp.asarray(eps), jnp.asarray(log_u), interpret=True, **kwargs)
    np.testing.assert_array_equal(np.asarray(acc_xla), np.asarray(acc_pal))
    np.testing.assert_allclose(np.asarray(X_xla), np.asarray(X_pal),
                               atol=1e-6)


def _setup_directed(rng, T=4, n=30, d=2):
    X = rng.randn(T, n, d).astype(np.float32)
    Y = rng.binomial(1, 0.2, (T, n, n)).astype(np.float32)
    for t in range(T):
        np.fill_diagonal(Y[t], 0)
    radii = rng.dirichlet(np.ones(n)).astype(np.float32)
    step = np.full((T, n), 0.05, np.float32)
    eps = rng.randn(2, n, T, d).astype(np.float32)
    log_u = np.log(rng.rand(2, n, T)).astype(np.float32)
    return X, Y, radii, step, eps, log_u


def test_pallas_scan_directed_lsm(rng):
    """Directed social-radii kernel realises the same chain as the XLA scan
    (reference directed_likelihoods_fast.pyx:46-80 likelihood)."""
    X, Y, radii, step, eps, log_u = _setup_directed(rng)
    b = np.array([0.4, 0.8], np.float32)
    X_xla, acc_xla = _xla_ref(Y, X, b, step, eps, log_u, radii=radii,
                              tau_sq=2.0, sigma_sq=0.1, mixture=False)
    X_pal, acc_pal = _node_scan_with_noise(
        jnp.asarray(Y), jnp.asarray(X), jnp.asarray(b), jnp.asarray(step),
        jnp.asarray(eps), jnp.asarray(log_u), radii=jnp.asarray(radii),
        tau_sq=2.0, sigma_sq=0.1, mixture=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(acc_xla), np.asarray(acc_pal))
    np.testing.assert_allclose(np.asarray(X_xla), np.asarray(X_pal),
                               atol=1e-6)


def test_pallas_scan_directed_mixture(rng):
    X, Y, radii, step, eps, log_u = _setup_directed(rng)
    T, n, d = X.shape
    K = 3
    mu = rng.randn(K, d).astype(np.float32)
    sig = (rng.rand(K) + 0.3).astype(np.float32)
    z = rng.randint(0, K, (T, n)).astype(np.int32)
    b = np.array([0.4, 0.8], np.float32)
    kwargs = dict(mu=jnp.asarray(mu), sigma=jnp.asarray(sig),
                  lmbda=jnp.float32(0.8), z=jnp.asarray(z), mixture=True)
    X_xla, acc_xla = _xla_ref(Y, X, b, step, eps, log_u, radii=radii,
                              **kwargs)
    X_pal, acc_pal = _node_scan_with_noise(
        jnp.asarray(Y), jnp.asarray(X), jnp.asarray(b), jnp.asarray(step),
        jnp.asarray(eps), jnp.asarray(log_u), radii=jnp.asarray(radii),
        interpret=True, **kwargs)
    np.testing.assert_array_equal(np.asarray(acc_xla), np.asarray(acc_pal))
    np.testing.assert_allclose(np.asarray(X_xla), np.asarray(X_pal),
                               atol=1e-6)


def test_pallas_scan_directed_negative_intercept(rng):
    """Padded lanes must not leak into the likelihood even when an eta sign
    flip makes softplus large at the +PAD distance (valid-lane mask)."""
    X, Y, radii, step, eps, log_u = _setup_directed(rng, n=21)
    b = np.array([-0.5, 0.3], np.float32)
    X_xla, acc_xla = _xla_ref(Y, X, b, step, eps, log_u, radii=radii,
                              tau_sq=2.0, sigma_sq=0.1, mixture=False)
    X_pal, acc_pal = _node_scan_with_noise(
        jnp.asarray(Y), jnp.asarray(X), jnp.asarray(b), jnp.asarray(step),
        jnp.asarray(eps), jnp.asarray(log_u), radii=jnp.asarray(radii),
        tau_sq=2.0, sigma_sq=0.1, mixture=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(acc_xla), np.asarray(acc_pal))
    np.testing.assert_allclose(np.asarray(X_xla), np.asarray(X_pal),
                               atol=1e-6)

def test_pallas_scan_bitexact_odd_T(rng):
    """Odd T at T <= 8 exercises the full-T kernel's t==T-1 masks (the
    phase-split odd-half padding is covered by the T > 8 tests below)."""
    for T in (3, 5):
        X, Y, step, eps, log_u = _setup(rng, T=T)
        X_xla, acc_xla = _xla_ref(Y, X, 1.0, step, eps, log_u,
                                  tau_sq=2.0, sigma_sq=0.1, mixture=False)
        X_pal, acc_pal = _node_scan_with_noise(
            jnp.asarray(Y), jnp.asarray(X), 1.0, jnp.asarray(step),
            jnp.asarray(eps), jnp.asarray(log_u), tau_sq=2.0, sigma_sq=0.1,
            mixture=False, interpret=True)
        np.testing.assert_array_equal(np.asarray(acc_xla),
                                      np.asarray(acc_pal))
        np.testing.assert_allclose(np.asarray(X_xla), np.asarray(X_pal),
                                   atol=1e-6)


def test_pallas_scan_mixture_odd_T(rng):
    """Odd-T mixture at T <= 8 (full-T kernel)."""
    X, Y, step, eps, log_u = _setup(rng, T=5)
    T, n, d = X.shape
    K = 3
    mu = rng.randn(K, d).astype(np.float32)
    sig = (rng.rand(K) + 0.3).astype(np.float32)
    z = rng.randint(0, K, (T, n)).astype(np.int32)
    kwargs = dict(mu=jnp.asarray(mu), sigma=jnp.asarray(sig),
                  lmbda=jnp.float32(0.8), z=jnp.asarray(z), mixture=True)
    X_xla, acc_xla = _xla_ref(Y, X, 1.0, step, eps, log_u, **kwargs)
    X_pal, acc_pal = _node_scan_with_noise(
        jnp.asarray(Y), jnp.asarray(X), 1.0, jnp.asarray(step),
        jnp.asarray(eps), jnp.asarray(log_u), interpret=True, **kwargs)
    np.testing.assert_array_equal(np.asarray(acc_xla), np.asarray(acc_pal))
    np.testing.assert_allclose(np.asarray(X_xla), np.asarray(X_pal),
                               atol=1e-6)


def test_pallas_scan_phase_split_large_T(rng):
    """T > 8 routes to the phase-split streamed kernel (T <= 8 uses the
    full-T variant, ops/pallas_scan._use_fullT); both parities of T must
    stay bit-exact with the XLA scan."""
    from dynetlsm_tpu.ops.pallas_scan import _use_fullT
    assert _use_fullT(4, 128) and not _use_fullT(10, 128)
    for T in (10, 11):
        X, Y, step, eps, log_u = _setup(rng, T=T, n=20)
        X_xla, acc_xla = _xla_ref(Y, X, 1.0, step, eps, log_u,
                                  tau_sq=2.0, sigma_sq=0.1, mixture=False)
        X_pal, acc_pal = _node_scan_with_noise(
            jnp.asarray(Y), jnp.asarray(X), 1.0, jnp.asarray(step),
            jnp.asarray(eps), jnp.asarray(log_u), tau_sq=2.0, sigma_sq=0.1,
            mixture=False, interpret=True)
        np.testing.assert_array_equal(np.asarray(acc_xla),
                                      np.asarray(acc_pal))
        np.testing.assert_allclose(np.asarray(X_xla), np.asarray(X_pal),
                                   atol=1e-6)


def test_pallas_scan_phase_split_mixture_directed_large_T(rng):
    """Directed mixture through the phase-split kernel (T=9)."""
    X, Y, radii, step, eps, log_u = _setup_directed(rng, T=9, n=20)
    T, n, d = X.shape
    K = 3
    mu = rng.randn(K, d).astype(np.float32)
    sig = (rng.rand(K) + 0.3).astype(np.float32)
    z = rng.randint(0, K, (T, n)).astype(np.int32)
    b = np.array([0.4, 0.8], np.float32)
    kwargs = dict(mu=jnp.asarray(mu), sigma=jnp.asarray(sig),
                  lmbda=jnp.float32(0.8), z=jnp.asarray(z), mixture=True)
    X_xla, acc_xla = _xla_ref(Y, X, b, step, eps, log_u, radii=radii,
                              **kwargs)
    X_pal, acc_pal = _node_scan_with_noise(
        jnp.asarray(Y), jnp.asarray(X), jnp.asarray(b), jnp.asarray(step),
        jnp.asarray(eps), jnp.asarray(log_u), radii=jnp.asarray(radii),
        interpret=True, **kwargs)
    np.testing.assert_array_equal(np.asarray(acc_xla), np.asarray(acc_pal))
    np.testing.assert_allclose(np.asarray(X_xla), np.asarray(X_pal),
                               atol=1e-6)


def test_pallas_scan_phase_split_mixture_odd_T(rng):
    """Undirected mixture through the phase-split kernel at odd T=11: the
    padded odd half, its sig divisor guard, and the cross-parity mu/sigma
    neighbour plumbing."""
    X, Y, step, eps, log_u = _setup(rng, T=11, n=20)
    T, n, d = X.shape
    K = 3
    mu = rng.randn(K, d).astype(np.float32)
    sig = (rng.rand(K) + 0.3).astype(np.float32)
    z = rng.randint(0, K, (T, n)).astype(np.int32)
    kwargs = dict(mu=jnp.asarray(mu), sigma=jnp.asarray(sig),
                  lmbda=jnp.float32(0.8), z=jnp.asarray(z), mixture=True)
    X_xla, acc_xla = _xla_ref(Y, X, 1.0, step, eps, log_u, **kwargs)
    X_pal, acc_pal = _node_scan_with_noise(
        jnp.asarray(Y), jnp.asarray(X), 1.0, jnp.asarray(step),
        jnp.asarray(eps), jnp.asarray(log_u), interpret=True, **kwargs)
    np.testing.assert_array_equal(np.asarray(acc_xla), np.asarray(acc_pal))
    np.testing.assert_allclose(np.asarray(X_xla), np.asarray(X_pal),
                               atol=1e-6)


def test_vmem_capacity_gate():
    """clamp=False exposes zero capacity at VMEM-exceeding shapes so the
    dispatch gate can fall back to the XLA scan (review round-2 finding)."""
    from dynetlsm_tpu.ops.pallas_scan import _vmem_max_chains
    assert _vmem_max_chains(10, 512) >= 32            # north-star: one call
    assert _vmem_max_chains(10, 512, clamp=False) >= 32
    # with the packed adjacency + hoisted-reciprocal eta rows (round 4) a
    # 48-chain directed invocation fits VMEM (probed at T=10/n=512); the
    # estimate must not exceed the undirected one
    assert 40 <= _vmem_max_chains(10, 512, directed=True) \
        <= _vmem_max_chains(10, 512)
    # single undirected chains fit to n = 8192 through the int8 layout and
    # to n = 16384 through the stream16 layout (both probed on a v5e chip);
    # directed tops out at n = 8192 via stream16 — past each variant's cap
    # the raw capacity must go <= 0 so the gate falls back to the XLA scan
    assert _vmem_max_chains(10, 8192, clamp=False) >= 1
    assert _vmem_max_chains(10, 8192, directed=True, clamp=False,
                            stream16=True) >= 1
    assert _vmem_max_chains(10, 16384, clamp=False) <= 0
    assert _vmem_max_chains(10, 16384, clamp=False, stream16=True) >= 1
    assert _vmem_max_chains(10, 16384, directed=True, clamp=False,
                            stream16=True) <= 0
    assert _vmem_max_chains(10, 16384) == 1           # clamped floor


def test_parallel_scheme_rejects_injected_noise(rng):
    """scheme='parallel' draws its own proposal field; silently ignoring an
    exact-scan noise stream would break reproducibility contracts."""
    import pytest
    from dynetlsm_tpu.mcmc.latent import sample_latent_positions
    X, Y, step, eps, log_u = _setup(rng, T=2, n=8)
    with pytest.raises(ValueError, match='parallel'):
        sample_latent_positions(
            jax.random.PRNGKey(0), jnp.asarray(Y), jnp.asarray(X),
            jnp.ones(1), jnp.asarray(step), tau_sq=2.0, sigma_sq=0.1,
            mixture=False, scheme='parallel',
            noise=(jnp.asarray(eps), jnp.asarray(log_u)))


def test_pallas_scan_chain_major_batched(rng):
    """C >= 8 routes the phase-split kernel to the chain-major layout
    (chains on sublanes, ops/pallas_scan._call_kernel round-3 rework);
    every chain must stay bit-exact with the per-chain XLA scan."""
    from dynetlsm_tpu.ops.pallas_scan import node_scan_batch
    C, K = 8, 3
    for T in (10, 11):
        X, Y, step, eps, log_u = _setup(rng, T=T, n=20)
        n, d = X.shape[1:]
        Xc = rng.randn(C, T, n, d).astype(np.float32)
        stepc = np.full((C, T, n), 0.3, np.float32)
        epsc = rng.randn(C, 2, n, T, d).astype(np.float32)
        log_uc = np.log(rng.rand(C, 2, n, T)).astype(np.float32)
        mu = rng.randn(C, K, d).astype(np.float32)
        sig = (rng.rand(C, K) + 0.3).astype(np.float32)
        z = rng.randint(0, K, (C, T, n)).astype(np.int32)
        b = (rng.rand(C) + 0.5).astype(np.float32)
        lam = np.full((C,), 0.8, np.float32)

        X_pal, acc_pal = node_scan_batch(
            jnp.asarray(Y), jnp.asarray(Xc), jnp.asarray(b),
            jnp.asarray(stepc), jnp.asarray(epsc), jnp.asarray(log_uc),
            tau_sq=0.0, sigma_sq=1.0, mu=jnp.asarray(mu),
            sigma=jnp.asarray(sig), lmbda=jnp.asarray(lam),
            z=jnp.asarray(z), mixture=True, interpret=True)
        for c in range(C):
            X_xla, acc_xla = _xla_ref(
                Y, Xc[c], b[c], stepc[c], epsc[c], log_uc[c],
                mu=jnp.asarray(mu[c]), sigma=jnp.asarray(sig[c]),
                lmbda=jnp.float32(lam[c]), z=jnp.asarray(z[c]),
                mixture=True)
            np.testing.assert_array_equal(np.asarray(acc_xla),
                                          np.asarray(acc_pal)[c])
            np.testing.assert_allclose(np.asarray(X_xla),
                                       np.asarray(X_pal)[c], atol=1e-6)


def test_pallas_scan_chain_major_directed(rng):
    """Directed social-radii likelihood through the chain-major layout."""
    from dynetlsm_tpu.ops.pallas_scan import node_scan_batch
    C = 8
    X, Y, radii, step, eps, log_u = _setup_directed(rng, T=9, n=20)
    T, n, d = X.shape
    Xc = rng.randn(C, T, n, d).astype(np.float32)
    stepc = np.full((C, T, n), 0.05, np.float32)
    epsc = rng.randn(C, 2, n, T, d).astype(np.float32)
    log_uc = np.log(rng.rand(C, 2, n, T)).astype(np.float32)
    radc = np.tile(radii, (C, 1)).astype(np.float32)
    b = np.tile(np.array([[0.4, 0.8]], np.float32), (C, 1))

    X_pal, acc_pal = node_scan_batch(
        jnp.asarray(Y), jnp.asarray(Xc), jnp.asarray(b),
        jnp.asarray(stepc), jnp.asarray(epsc), jnp.asarray(log_uc),
        tau_sq=2.0, sigma_sq=0.1, radii=jnp.asarray(radc),
        mixture=False, interpret=True)
    for c in (0, 3, 7):
        X_xla, acc_xla = _xla_ref(
            Y, Xc[c], b[c], stepc[c], epsc[c], log_uc[c], radii=radii,
            tau_sq=2.0, sigma_sq=0.1, mixture=False)
        np.testing.assert_array_equal(np.asarray(acc_xla),
                                      np.asarray(acc_pal)[c])
        np.testing.assert_allclose(np.asarray(X_xla),
                                   np.asarray(X_pal)[c], atol=1e-6)


def test_pallas_scan_chain_major_fullT(rng):
    """Chain-major layout through the full-T kernel variant (T <= 8)."""
    from dynetlsm_tpu.ops.pallas_scan import node_scan_batch, _use_fullT
    assert _use_fullT(4, 128)
    C, K = 8, 3
    X, Y, step, eps, log_u = _setup(rng, T=4, n=20)
    T, n, d = X.shape
    Xc = rng.randn(C, T, n, d).astype(np.float32)
    stepc = np.full((C, T, n), 0.3, np.float32)
    epsc = rng.randn(C, 2, n, T, d).astype(np.float32)
    log_uc = np.log(rng.rand(C, 2, n, T)).astype(np.float32)
    mu = rng.randn(C, K, d).astype(np.float32)
    sig = (rng.rand(C, K) + 0.3).astype(np.float32)
    z = rng.randint(0, K, (C, T, n)).astype(np.int32)
    b = (rng.rand(C) + 0.5).astype(np.float32)
    lam = np.full((C,), 0.8, np.float32)

    X_pal, acc_pal = node_scan_batch(
        jnp.asarray(Y), jnp.asarray(Xc), jnp.asarray(b),
        jnp.asarray(stepc), jnp.asarray(epsc), jnp.asarray(log_uc),
        tau_sq=0.0, sigma_sq=1.0, mu=jnp.asarray(mu),
        sigma=jnp.asarray(sig), lmbda=jnp.asarray(lam),
        z=jnp.asarray(z), mixture=True, interpret=True)
    for c in (0, 4, 7):
        X_xla, acc_xla = _xla_ref(
            Y, Xc[c], b[c], stepc[c], epsc[c], log_uc[c],
            mu=jnp.asarray(mu[c]), sigma=jnp.asarray(sig[c]),
            lmbda=jnp.float32(lam[c]), z=jnp.asarray(z[c]), mixture=True)
        np.testing.assert_array_equal(np.asarray(acc_xla),
                                      np.asarray(acc_pal)[c])
        np.testing.assert_allclose(np.asarray(X_xla),
                                   np.asarray(X_pal)[c], atol=1e-6)


def test_pallas_scan_stream16_time_major(rng, monkeypatch):
    """The stream16 large-n adjacency layout (bf16 16-row single-buffered
    blocks, no stage, in-place position field) realises the identical
    Markov chain — forced on at a CPU-interpretable size.  n = 140 pads to
    two 128-node stream tiles, exercising the g-advance every 8 blocks."""
    import dynetlsm_tpu.ops.pallas_scan as ps
    from dynetlsm_tpu.ops.pallas_scan import node_scan_batch
    monkeypatch.setattr(ps, '_FORCE_STREAM16', True)
    K = 3
    X, Y, step, eps, log_u = _setup(rng, T=10, n=140)
    T, n, d = X.shape
    mu = rng.randn(K, d).astype(np.float32)
    sig = (rng.rand(K) + 0.3).astype(np.float32)
    z = rng.randint(0, K, (T, n)).astype(np.int32)

    X_pal, acc_pal = node_scan_batch(
        jnp.asarray(Y), jnp.asarray(X)[None], jnp.ones((1,), jnp.float32),
        jnp.asarray(step)[None], jnp.asarray(eps)[None],
        jnp.asarray(log_u)[None], tau_sq=0.0, sigma_sq=1.0,
        mu=jnp.asarray(mu)[None], sigma=jnp.asarray(sig)[None],
        lmbda=jnp.full((1,), 0.8, jnp.float32), z=jnp.asarray(z)[None],
        mixture=True, interpret=True)
    X_xla, acc_xla = _xla_ref(
        Y, X, 1.0, step, eps, log_u, mu=jnp.asarray(mu),
        sigma=jnp.asarray(sig), lmbda=jnp.float32(0.8),
        z=jnp.asarray(z), mixture=True)
    np.testing.assert_array_equal(np.asarray(acc_xla), np.asarray(acc_pal)[0])
    np.testing.assert_allclose(np.asarray(X_xla), np.asarray(X_pal)[0],
                               atol=1e-6)


def test_pallas_scan_stream16_directed_chain_major(rng, monkeypatch):
    """stream16 with the directed packed-adjacency decode and the
    chain-major (C >= 8) layout."""
    import dynetlsm_tpu.ops.pallas_scan as ps
    from dynetlsm_tpu.ops.pallas_scan import node_scan_batch
    monkeypatch.setattr(ps, '_FORCE_STREAM16', True)
    C = 8
    X, Y, radii, step, eps, log_u = _setup_directed(rng, T=9, n=20)
    T, n, d = X.shape
    Xc = rng.randn(C, T, n, d).astype(np.float32)
    stepc = np.full((C, T, n), 0.05, np.float32)
    epsc = rng.randn(C, 2, n, T, d).astype(np.float32)
    log_uc = np.log(rng.rand(C, 2, n, T)).astype(np.float32)
    radc = np.tile(radii, (C, 1)).astype(np.float32)
    b = np.tile(np.array([[0.4, 0.8]], np.float32), (C, 1))

    X_pal, acc_pal = node_scan_batch(
        jnp.asarray(Y), jnp.asarray(Xc), jnp.asarray(b),
        jnp.asarray(stepc), jnp.asarray(epsc), jnp.asarray(log_uc),
        tau_sq=2.0, sigma_sq=0.1, radii=jnp.asarray(radc),
        mixture=False, interpret=True)
    for c in (0, 5):
        X_xla, acc_xla = _xla_ref(
            Y, Xc[c], b[c], stepc[c], epsc[c], log_uc[c], radii=radii,
            tau_sq=2.0, sigma_sq=0.1, mixture=False)
        np.testing.assert_array_equal(np.asarray(acc_xla),
                                      np.asarray(acc_pal)[c])
        np.testing.assert_allclose(np.asarray(X_xla),
                                   np.asarray(X_pal)[c], atol=1e-6)


def test_pallas_scan_chain_major_fullT_directed_lsm(rng):
    """Directed LSM prior through the chain-major full-T variant."""
    from dynetlsm_tpu.ops.pallas_scan import node_scan_batch
    C = 8
    X, Y, radii, step, eps, log_u = _setup_directed(rng, T=3, n=20)
    T, n, d = X.shape
    Xc = rng.randn(C, T, n, d).astype(np.float32)
    stepc = np.full((C, T, n), 0.05, np.float32)
    epsc = rng.randn(C, 2, n, T, d).astype(np.float32)
    log_uc = np.log(rng.rand(C, 2, n, T)).astype(np.float32)
    radc = np.tile(radii, (C, 1)).astype(np.float32)
    b = np.tile(np.array([[0.4, 0.8]], np.float32), (C, 1))

    X_pal, acc_pal = node_scan_batch(
        jnp.asarray(Y), jnp.asarray(Xc), jnp.asarray(b),
        jnp.asarray(stepc), jnp.asarray(epsc), jnp.asarray(log_uc),
        tau_sq=2.0, sigma_sq=0.1, radii=jnp.asarray(radc),
        mixture=False, interpret=True)
    for c in (0, 7):
        X_xla, acc_xla = _xla_ref(
            Y, Xc[c], b[c], stepc[c], epsc[c], log_uc[c], radii=radii,
            tau_sq=2.0, sigma_sq=0.1, mixture=False)
        np.testing.assert_array_equal(np.asarray(acc_xla),
                                      np.asarray(acc_pal)[c])
        np.testing.assert_allclose(np.asarray(X_xla),
                                   np.asarray(X_pal)[c], atol=1e-6)


def test_pallas_scan_tempered_parity(rng):
    """The tempering params lane scales exactly the network log-lik delta:
    the tempered kernel matches the tempered XLA scan bit for bit, for
    both the full-T (T <= 8) and phase-split (T > 8) variants and both
    prior families (the lane reuses the prior family's unused params
    row)."""
    for T, mixture in ((4, False), (10, False), (4, True), (10, True)):
        X, Y, radii, step, eps, log_u = _setup_directed(rng, T=T)
        b = np.array([0.4, 0.8], np.float32)
        temper = np.float32(0.35)
        kwargs = dict(tau_sq=2.0, sigma_sq=0.1, mixture=False)
        if mixture:
            n, d, K = X.shape[1], X.shape[2], 3
            kwargs = dict(
                mu=jnp.asarray(rng.randn(K, d).astype(np.float32)),
                sigma=jnp.asarray((rng.rand(K) + 0.3).astype(np.float32)),
                lmbda=jnp.float32(0.8),
                z=jnp.asarray(rng.randint(0, K, (T, n)).astype(np.int32)),
                mixture=True)
        X_xla, acc_xla = _xla_ref(Y, X, b, step, eps, log_u, radii=radii,
                                  temper=jnp.float32(temper), **kwargs)
        X_pal, acc_pal = _node_scan_with_noise(
            jnp.asarray(Y), jnp.asarray(X), jnp.asarray(b),
            jnp.asarray(step), jnp.asarray(eps), jnp.asarray(log_u),
            radii=jnp.asarray(radii), temper=jnp.float32(temper),
            interpret=True, **kwargs)
        np.testing.assert_array_equal(np.asarray(acc_xla),
                                      np.asarray(acc_pal))
        np.testing.assert_allclose(np.asarray(X_xla), np.asarray(X_pal),
                                   atol=1e-6)
        # the tempered chain must actually differ from the untempered one
        X_un, _ = _xla_ref(Y, X, b, step, eps, log_u, radii=radii, **kwargs)
        assert np.abs(np.asarray(X_un) - np.asarray(X_xla)).max() > 0


def test_vmem_probe_search_graceful():
    """The probe search recovers from a mis-modeled analytic guess in both
    directions: an overestimate descends to the true capacity, an
    underestimate grows most of the way back (VERDICT round-4 item 4)."""
    from dynetlsm_tpu.ops.vmem_probe import search_capacity

    calls = []

    def oracle(true_cap):
        def fits(c):
            calls.append(c)
            return c <= true_cap
        return fits

    # overestimated guess: halve down to a fitting count
    calls.clear()
    assert search_capacity(oracle(10), 64) == 8
    assert len(calls) <= 6
    # underestimated guess: grow by ~4/3 steps
    calls.clear()
    assert search_capacity(oracle(100), 30) >= 70
    # exact guess: one confirm + bounded grow attempts
    calls.clear()
    assert search_capacity(oracle(42), 42) == 42
    # nothing fits at all
    assert search_capacity(oracle(0), 16) == 0
    # guess of zero still probes one chain
    assert search_capacity(oracle(5), 0) >= 1


@pytest.mark.slow
def test_large_n_exact_scan_executes_on_tpu():
    """The n=8,192 undirected exact scan EXECUTES on a real chip (round-4
    verdict item 5: the large-n evidence must be measured, not
    'compiles').  Skipped off-TPU — run with DYNETLSM_TEST_PLATFORM=axon
    (the conftest otherwise pins the suite to the virtual CPU mesh)."""
    if jax.default_backend() != 'tpu':
        pytest.skip('needs a real TPU chip')
    from dynetlsm_tpu.ops.pallas_scan import node_scan_batch

    rng = np.random.RandomState(0)
    T, n, d = 10, 8192, 2
    slices = []
    for _ in range(T):
        A = (rng.rand(n, n) < 0.01).astype(np.float32)
        A = np.triu(A, 1)
        slices.append(A + A.T)
    Y = np.stack(slices)
    X = rng.randn(T, n, d).astype(np.float32)
    step = np.full((1, T, n), 0.1, np.float32)
    eps = rng.randn(1, 2, n, T, d).astype(np.float32)
    log_u = np.log(rng.rand(1, 2, n, T)).astype(np.float32)

    @jax.jit
    def one_sweep(Y, X, step, eps, log_u):
        return node_scan_batch(Y, X[None], jnp.ones((1,)), step, eps,
                               log_u, tau_sq=2.0, sigma_sq=0.1,
                               mixture=False)

    Xn, acc = one_sweep(jnp.asarray(Y), jnp.asarray(X), jnp.asarray(step),
                        jnp.asarray(eps), jnp.asarray(log_u))
    Xn, acc = np.asarray(Xn), np.asarray(acc)
    assert np.isfinite(Xn).all()
    rate = acc.mean()
    assert 0.01 < rate < 0.99, rate   # real accept/reject decisions ran
