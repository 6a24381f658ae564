"""Native posterior post-processing kernels vs NumPy oracles."""
import numpy as np
import pytest

from dynetlsm_tpu.native import (
    get_lib, cluster_counts, cluster_counts_t, cooccurrence)


def test_native_library_builds():
    assert get_lib() is not None, 'g++ build of fastpost.cpp failed'


def test_cluster_counts_matches_numpy(rng):
    S, T, n, K = 50, 3, 20, 8
    z = rng.randint(0, K, size=(S, T, n))
    got = cluster_counts(z, K)
    want = np.array([np.unique(z[s].ravel()).shape[0] for s in range(S)])
    np.testing.assert_array_equal(got, want)


def test_cluster_counts_t_matches_numpy(rng):
    S, T, n, K = 40, 4, 15, 6
    z = rng.randint(0, K, size=(S, T, n))
    got = cluster_counts_t(z, K)
    want = np.array([[np.unique(z[s, t]).shape[0] for s in range(S)]
                     for t in range(T)])
    np.testing.assert_array_equal(got, want)


def test_cooccurrence_matches_einsum(rng):
    S, n, K = 60, 25, 5
    z = rng.randint(0, K, size=(S, n))
    got = cooccurrence(z, K)
    onehot = np.eye(K)[z]
    want = np.einsum('sik,sjk->ij', onehot, onehot) / S
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_native_speedup(rng):
    """The native co-occurrence should comfortably beat the dense einsum on
    a large sample set."""
    import time
    if get_lib() is None:
        pytest.skip('no native library')
    S, n, K = 4000, 120, 10
    z = rng.randint(0, K, size=(S, n))

    t0 = time.time()
    got = cooccurrence(z, K)
    native_t = time.time() - t0

    t0 = time.time()
    onehot = np.eye(K, dtype=np.float32)[z]
    want = np.einsum('sik,sjk->ij', onehot, onehot).astype(np.float64) / S
    einsum_t = time.time() - t0

    np.testing.assert_allclose(got, want, rtol=1e-5)
    assert native_t < einsum_t * 2.0  # at least competitive; usually faster
