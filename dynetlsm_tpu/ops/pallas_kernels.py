"""Pallas TPU kernels for the dyad log-likelihood.

Blockwise-tiled replacement of the dense (T, n, n) likelihood reductions for
large n (SURVEY.md §5.7: the node-axis analog of blockwise attention).  The
kernel streams (block_i, block_j) tiles of the adjacency matrix through VMEM
and computes distances on the fly from the two (block, d) position tiles —
the (T, n, n) distance tensor is never materialised in HBM.

Used for n >= ~512; below that the fused XLA reduction is already optimal.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# position value used to pad X rows so padded dyads contribute ~0
# (eta = b - huge  =>  Y*eta = 0 (padded Y is 0) and softplus(eta) ~ 0)
_PAD_POS = 1.0e4


def _loglik_tile_kernel(b_ref, y_ref, xi_ref, xj_ref, out_ref, *, block):
    """Partial undirected log-likelihood of one (block_i, block_j) tile."""
    xi = xi_ref[0]                                     # (bi, d)
    xj = xj_ref[0]                                     # (bj, d)
    y = y_ref[0]                                       # (bi, bj)
    intercept = b_ref[0]

    # pairwise squared distances via |xi|^2 + |xj|^2 - 2 xi.xj^T (MXU)
    xi_sq = jnp.sum(xi * xi, axis=-1, keepdims=True)   # (bi, 1)
    xj_sq = jnp.sum(xj * xj, axis=-1, keepdims=True).T  # (1, bj)
    cross = jnp.dot(xi, xj.T, preferred_element_type=jnp.float32)
    d2 = jnp.maximum(xi_sq + xj_sq - 2.0 * cross, 0.0)
    dist = jnp.sqrt(d2)

    eta = intercept - dist
    ll = y * eta - jax.nn.softplus(eta)

    # mask the diagonal (global row ids == global col ids)
    bi, bj = block
    row0 = pl.program_id(1) * bi
    col0 = pl.program_id(2) * bj
    rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (bi, bj), 0)
    cols = col0 + jax.lax.broadcasted_iota(jnp.int32, (bi, bj), 1)
    ll = jnp.where(rows == cols, 0.0, ll)

    # sequential-grid scalar accumulation into SMEM
    first = jnp.logical_and(
        pl.program_id(0) == 0,
        jnp.logical_and(pl.program_id(1) == 0, pl.program_id(2) == 0))

    @pl.when(first)
    def _():
        out_ref[0, 0] = jnp.sum(ll)

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[0, 0] = out_ref[0, 0] + jnp.sum(ll)


@functools.partial(jax.jit, static_argnames=('block', 'interpret'))
def undirected_loglik_pallas(Y, X, intercept, block=256, interpret=False):
    """Full undirected Bernoulli log-likelihood via a tiled Pallas kernel.

    Equivalent to :func:`dynetlsm_tpu.ops.undirected_loglik_full`
    (and hence the reference reduction, network_likelihoods.py:26-33).

    Parameters
    ----------
    Y : (T, n, n) float32 adjacency
    X : (T, n, d) float32 positions
    intercept : scalar
    block : tile edge (multiple of 128)
    interpret : run in interpreter mode (for CPU tests)
    """
    Y = jnp.asarray(Y, jnp.float32)
    X = jnp.asarray(X, jnp.float32)
    T, n, d = X.shape
    block = min(block, max(128, -(-n // 128) * 128))
    n_pad = -(-n // block) * block
    if n_pad != n:
        Y = jnp.pad(Y, ((0, 0), (0, n_pad - n), (0, n_pad - n)))
        X = jnp.pad(X, ((0, 0), (0, n_pad - n), (0, 0)),
                    constant_values=_PAD_POS)
    gi = n_pad // block

    b_arr = jnp.asarray([intercept], jnp.float32)
    partials = pl.pallas_call(
        functools.partial(_loglik_tile_kernel, block=(block, block)),
        grid=(T, gi, gi),
        in_specs=[
            pl.BlockSpec((1,), lambda t, i, j: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block, block), lambda t, i, j: (t, i, j)),
            pl.BlockSpec((1, block, d), lambda t, i, j: (t, i, 0)),
            pl.BlockSpec((1, block, d), lambda t, i, j: (t, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda t, i, j: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=interpret,
    )(b_arr, Y, X, X)
    return 0.5 * partials[0, 0]
