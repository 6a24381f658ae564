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


def _directed_want(Y, X, radii_cands, b_cands):
    from dynetlsm_tpu.ops.likelihoods import directed_loglik_full
    dist = pairwise_distances(jnp.asarray(X))

    def per_chain(dd, rc, bc):
        return jax.vmap(lambda r, b: directed_loglik_full(
            jnp.asarray(Y), dd, r, b[0], b[1]))(rc, bc)

    return jax.vmap(per_chain)(dist, jnp.asarray(radii_cands),
                               jnp.asarray(b_cands))


def test_directed_cands_matches_xla(rng):
    from dynetlsm_tpu.ops.pallas_loglik import directed_loglik_cands_batch
    C, T, n, d, n_cand = 3, 4, 150, 2, 3
    X = rng.randn(C, T, n, d).astype(np.float32)
    Y = rng.binomial(1, 0.15, (T, n, n)).astype(np.float32)
    for t in range(T):
        np.fill_diagonal(Y[t], 0.0)
    radii = rng.dirichlet(np.ones(n), size=(C, n_cand)).astype(np.float32)
    bs = rng.randn(C, n_cand, 2).astype(np.float32) * 0.5 + 0.3

    got = directed_loglik_cands_batch(
        jnp.asarray(Y), jnp.asarray(X), jnp.asarray(radii), jnp.asarray(bs),
        interpret=True)
    want = _directed_want(Y, X, radii, bs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5)


def test_directed_cands_chunked_chains(rng):
    """C > _MAX_C_DIR exercises the lax.map chain-chunking path; n_cand=1
    exercises the single-candidate variant."""
    from dynetlsm_tpu.ops import pallas_loglik
    C, T, n, d = pallas_loglik._MAX_C_DIR + 2, 2, 140, 2
    X = rng.randn(C, T, n, d).astype(np.float32)
    Y = rng.binomial(1, 0.2, (T, n, n)).astype(np.float32)
    for t in range(T):
        np.fill_diagonal(Y[t], 0.0)
    radii = rng.dirichlet(np.ones(n), size=(C, 1)).astype(np.float32)
    bs = rng.randn(C, 1, 2).astype(np.float32) * 0.5 + 0.3

    got = pallas_loglik.directed_loglik_cands_batch(
        jnp.asarray(Y), jnp.asarray(X), jnp.asarray(radii), jnp.asarray(bs),
        interpret=True)
    want = _directed_want(Y, X, radii, bs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5)


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
