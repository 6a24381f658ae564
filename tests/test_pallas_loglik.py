"""Fused pair log-likelihood Pallas kernel vs the dense XLA reduction."""
import numpy as np
import jax
import jax.numpy as jnp

from dynetlsm_tpu.ops.distances import pairwise_distances
from dynetlsm_tpu.ops.likelihoods import undirected_loglik_pair
from dynetlsm_tpu.ops.pallas_loglik import undirected_loglik_pair_batch


def test_pair_loglik_matches_xla(rng):
    C, T, n, d = 3, 4, 150, 2
    X = rng.randn(C, T, n, d).astype(np.float32)
    Y = rng.binomial(1, 0.15, (T, n, n)).astype(np.float32)
    Y = np.triu(Y, 1)
    Y = Y + Y.transpose(0, 2, 1)
    b_cur = rng.randn(C).astype(np.float32)
    b_prop = b_cur + 0.3

    ll_cur, ll_prop = undirected_loglik_pair_batch(
        jnp.asarray(Y), jnp.asarray(X), jnp.asarray(b_cur),
        jnp.asarray(b_prop), interpret=True)

    dist = pairwise_distances(jnp.asarray(X))
    want_cur, want_prop = jax.vmap(
        lambda dd, bc, bp: undirected_loglik_pair(jnp.asarray(Y), dd, bc, bp)
    )(dist, jnp.asarray(b_cur), jnp.asarray(b_prop))

    np.testing.assert_allclose(np.asarray(ll_cur), np.asarray(want_cur),
                               rtol=2e-5)
    np.testing.assert_allclose(np.asarray(ll_prop), np.asarray(want_prop),
                               rtol=2e-5)


def test_pair_loglik_chunked_chains(rng):
    """C > _MAX_C exercises the lax.map chain-chunking path."""
    from dynetlsm_tpu.ops import pallas_loglik
    C, T, n, d = pallas_loglik._MAX_C + 3, 2, 140, 2
    X = rng.randn(C, T, n, d).astype(np.float32)
    Y = rng.binomial(1, 0.2, (T, n, n)).astype(np.float32)
    Y = np.triu(Y, 1)
    Y = Y + Y.transpose(0, 2, 1)
    b = rng.randn(C).astype(np.float32)

    ll_cur, ll_prop = undirected_loglik_pair_batch(
        jnp.asarray(Y), jnp.asarray(X), jnp.asarray(b), jnp.asarray(b + 0.1),
        interpret=True)
    dist = pairwise_distances(jnp.asarray(X))
    want_cur, want_prop = jax.vmap(
        lambda dd, bc, bp: undirected_loglik_pair(jnp.asarray(Y), dd, bc, bp)
    )(dist, jnp.asarray(b), jnp.asarray(b + 0.1))
    np.testing.assert_allclose(np.asarray(ll_cur), np.asarray(want_cur),
                               rtol=2e-5)
    np.testing.assert_allclose(np.asarray(ll_prop), np.asarray(want_prop),
                               rtol=2e-5)
