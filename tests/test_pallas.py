"""Pallas dyad log-likelihood kernel vs the XLA reference (interpreter mode
so the test runs on the CPU mesh)."""
import numpy as np
import jax.numpy as jnp

from dynetlsm_tpu.ops.pallas_kernels import undirected_loglik_pallas
from dynetlsm_tpu.ops.likelihoods import undirected_loglik_full
from dynetlsm_tpu.ops.distances import pairwise_distances


def test_pallas_loglik_matches_xla(rng):
    T, n, d = 3, 200, 2
    X = rng.randn(T, n, d).astype(np.float32)
    Y = rng.binomial(1, 0.1, (T, n, n)).astype(np.float32)
    for t in range(T):
        np.fill_diagonal(Y[t], 0)
    Y = np.triu(Y, 1) + np.transpose(np.triu(Y, 1), (0, 2, 1))

    got = float(undirected_loglik_pallas(Y, X, 1.2, interpret=True))
    want = float(undirected_loglik_full(
        jnp.asarray(Y), pairwise_distances(jnp.asarray(X)), 1.2))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_pallas_loglik_padding(rng):
    """n not a multiple of the tile edge exercises the padding path."""
    T, n, d = 2, 130, 2
    X = rng.randn(T, n, d).astype(np.float32)
    Y = rng.binomial(1, 0.2, (T, n, n)).astype(np.float32)
    for t in range(T):
        np.fill_diagonal(Y[t], 0)
    Y = np.triu(Y, 1) + np.transpose(np.triu(Y, 1), (0, 2, 1))

    got = float(undirected_loglik_pallas(Y, X, 0.5, block=128,
                                         interpret=True))
    want = float(undirected_loglik_full(
        jnp.asarray(Y), pairwise_distances(jnp.asarray(X)), 0.5))
    np.testing.assert_allclose(got, want, rtol=1e-4)
