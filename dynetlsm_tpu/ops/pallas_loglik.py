"""Fused pairwise-distance + Bernoulli log-likelihood Pallas kernel.

The sweep's intercept MH step needs the full undirected log-likelihood at
two intercept candidates.  The XLA path materialises the (C, T, n, n)
distance tensor in HBM (~320 MB at 32 chains, T=10, n=500) and re-reads it
per candidate; this kernel computes distances on the fly from the (C, T, n,
d) positions tile-by-tile and reduces both candidates in the same pass —
HBM traffic drops to one int8 read of the shared adjacency.

A chain-batched pair evaluator wired directly into the sweeps (VERDICT
round-1 item 4).  Equivalent of the reference reduction
network_likelihoods.py:26-33 evaluated at two intercepts.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PAD_POS = 1.0e4
_BLOCK = 128


def _pair_tile_kernel(im_ref, jm_ref, b_ref, y_ref, *x_refs, block):
    """One upper-triangular (t, tile_i, tile_j) tile (j >= i): partial
    log-lik of both candidates.

    The dyad sum is symmetric, so only j >= i tiles are visited (the
    scalar-prefetched ``im``/``jm`` arrays enumerate them); off-diagonal
    tiles carry each unordered dyad once (weight 1), diagonal tiles carry
    both orders (weight 1/2, true diagonal masked) — 37.5% fewer tiles
    than the full grid at n = 500.

    b (C, 128) VMEM: intercepts in lanes 0/1 (lane-broadcast elsewhere);
    y (1, bi, bj) int8; x_refs: d pairs of row/col position tiles
    (1, C, bi) / (1, C, bj); out (1, C, 128) partial with candidate 0 in
    lane 0, candidate 1 in lane 1.
    """
    d = len(x_refs) // 2
    xi = [x_refs[di][0] for di in range(d)]                  # (C, bi)
    xj = [x_refs[d + di][0] for di in range(d)]              # (C, bj)
    out_ref = x_refs[2 * d]
    y = y_ref[0].astype(jnp.float32)[None]                   # (1, bi, bj)

    d2 = 0.0
    for di in range(d):
        diff = xi[di][:, :, None] - xj[di][:, None, :]       # (C, bi, bj)
        d2 = d2 + diff * diff
    dist = jnp.sqrt(jnp.maximum(d2, 0.0))

    # mask the true diagonal (global row ids == global col ids); padded
    # nodes need no mask: X pads with _PAD_POS => eta ~ -1e4 => y*eta = 0
    # (padded y is 0) and softplus(eta) == 0 in f32
    bi, bj = block
    u = pl.program_id(1)
    ti = im_ref[u]
    tj = jm_ref[u]
    rows = ti * bi + jax.lax.broadcasted_iota(jnp.int32, (1, bi, bj), 1)
    cols = tj * bj + jax.lax.broadcasted_iota(jnp.int32, (1, bi, bj), 2)
    offdiag = (rows != cols).astype(jnp.float32)
    weight = jnp.where(ti == tj, 0.5, 1.0)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, _BLOCK), 2)
    parts = 0.0
    for cand in (0, 1):
        b = jnp.sum(b_ref[...] * (lane[0] == cand).astype(jnp.float32),
                    axis=1, keepdims=True)[:, :, None]       # (C, 1, 1)
        eta = b - dist
        ll = y * eta - jax.nn.softplus(eta)
        # two single-axis reductions: the fused (1, 2) reduce crashes the
        # mosaic layout pass (layout.h rank check)
        red = jnp.sum(jnp.sum(ll * offdiag, axis=2, keepdims=True),
                      axis=1, keepdims=True)                 # (C, 1, 1)
        parts = parts + red[:, 0, :] * (lane[0] == cand).astype(jnp.float32)

    out_ref[0] = weight * parts                              # (C, 128)


def _pair_call(Y_i8, xs, b_vm, *, T, gi, d, C, n_pad, interpret):
    # upper-triangular tile enumeration, scalar-prefetched for the index maps
    iu, ju = zip(*[(i, j) for i in range(gi) for j in range(i, gi)])
    n_ut = len(iu)
    im = jnp.asarray(iu, jnp.int32)
    jm = jnp.asarray(ju, jnp.int32)
    grid = (T, n_ut)
    in_specs = [pl.BlockSpec((C, _BLOCK), lambda t, u, im, jm: (0, 0)),
                pl.BlockSpec((1, _BLOCK, _BLOCK),
                             lambda t, u, im, jm: (t, im[u], jm[u]))]
    # d row tiles then d col tiles
    in_specs += [pl.BlockSpec((1, C, _BLOCK),
                              lambda t, u, im, jm: (t, 0, im[u]))
                 for _ in range(d)]
    in_specs += [pl.BlockSpec((1, C, _BLOCK),
                              lambda t, u, im, jm: (t, 0, jm[u]))
                 for _ in range(d)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, C, _BLOCK), lambda t, u, im, jm: (t * n_ut + u, 0, 0)),
    )
    partials = pl.pallas_call(
        functools.partial(_pair_tile_kernel, block=(_BLOCK, _BLOCK)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T * n_ut, C, _BLOCK), jnp.float32),
        interpret=interpret,
    )(im, jm, b_vm, Y_i8, *xs)
    return jnp.sum(partials, axis=0)[:, :2]                  # (C, 2)


# per-tile temporaries are (C, 128, 128) f32; ~5 live at once must fit VMEM
_MAX_C = 16


def undirected_loglik_pair_batch(Y, X, b_cur, b_prop, interpret=False):
    """Both candidate log-likelihoods for every chain in one fused pass.

    Y (T, n, n) shared; X (C, T, n, d); b_cur, b_prop (C,).
    Returns (ll_cur (C,), ll_prop (C,)).
    """
    C, T, n, d = X.shape
    n_pad = max(-(-n // _BLOCK) * _BLOCK, _BLOCK)
    pad = n_pad - n
    gi = n_pad // _BLOCK

    Y_i8 = jnp.pad(Y, ((0, 0), (0, pad), (0, pad))).astype(jnp.int8)

    def run(Xc, bc, bp):
        c = Xc.shape[0]
        # row tiles pad at +PAD, column tiles at -PAD: padded-padded dyads
        # then sit 2e4 apart (eta ~ -2e4 => zero contribution) instead of
        # coinciding at distance 0
        xt = [jnp.transpose(Xc[..., di], (1, 0, 2)) for di in range(d)]
        xs_row = [jnp.pad(x, ((0, 0), (0, 0), (0, pad)),
                          constant_values=_PAD_POS) for x in xt]
        xs_col = [jnp.pad(x, ((0, 0), (0, 0), (0, pad)),
                          constant_values=-_PAD_POS) for x in xt]
        b_vm = (bc[:, None] * (jnp.arange(_BLOCK) == 0)
                + bp[:, None] * (jnp.arange(_BLOCK) == 1)).astype(X.dtype)
        return _pair_call(Y_i8, xs_row + xs_col, b_vm, T=T, gi=gi, d=d, C=c,
                          n_pad=n_pad, interpret=interpret)

    if C <= _MAX_C:
        out = run(X, b_cur, b_prop)
    else:
        groups = -(-C // _MAX_C)
        C_pad = groups * _MAX_C

        def regroup(a):
            widths = [(0, 0)] * a.ndim
            widths[0] = (0, C_pad - C)
            a = jnp.pad(a, widths)
            return a.reshape((groups, _MAX_C) + a.shape[1:])

        out = jax.lax.map(lambda ops: run(*ops),
                          (regroup(X), regroup(b_cur), regroup(b_prop)))
        out = out.reshape(C_pad, 2)[:C]
    return out[:, 0], out[:, 1]


@functools.lru_cache(maxsize=None)
def _custom_vmap_pair():
    def single(Y, X, b_cur, b_prop):
        ll = undirected_loglik_pair_batch(
            Y, X[None], jnp.reshape(b_cur, (1,)), jnp.reshape(b_prop, (1,)))
        return ll[0][0], ll[1][0]

    f = jax.custom_batching.custom_vmap(single)

    @f.def_vmap
    def _rule(axis_size, in_batched, Y, X, b_cur, b_prop):
        if in_batched[0]:
            out = jax.lax.map(
                lambda ops: single(*ops), (Y, X, b_cur, b_prop))
        else:
            bc = jnp.broadcast_to(jnp.reshape(b_cur, (-1,))[:1], (axis_size,)) \
                if not in_batched[2] else jnp.reshape(b_cur, (axis_size,))
            bp = jnp.broadcast_to(jnp.reshape(b_prop, (-1,))[:1], (axis_size,)) \
                if not in_batched[3] else jnp.reshape(b_prop, (axis_size,))
            out = undirected_loglik_pair_batch(Y, X, bc, bp)
        return out, (True, True)

    return f


def undirected_loglik_pair_fused(Y, X, b_cur, b_prop):
    """vmap-aware entry point used by the coefficient sampler on TPU."""
    f = _custom_vmap_pair()
    return f(Y, X, jnp.asarray(b_cur, X.dtype), jnp.asarray(b_prop, X.dtype))
