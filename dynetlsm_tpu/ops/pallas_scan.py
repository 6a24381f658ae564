"""Fused Pallas kernel for the exact sequential latent-position node scan.

The exact single-site sampler requires 2n dependent Metropolis steps per
sweep (mcmc/latent.py).  Executed as an XLA ``fori_loop``, each step is a
chain of small kernels whose dispatch dominates wall-clock at large n
(~9.5 us/step at T=10, n=500).  This kernel runs the entire scan inside one
Pallas program: the position field stays in VMEM across all 2n steps, node
gathers/scatters are one-hot lane operations, and the only HBM traffic is
one read of Y and the noise plus one write of the results.

The kernel carries an explicit chain axis (C on sublanes): vmapped Pallas
grids execute *sequentially* on a TPU core, so batching chains inside the
kernel is what recovers cross-chain vector parallelism.  Chains beyond the
VMEM budget are processed in ``lax.map`` chunks.

Layout: node axis on lanes — X as (C, T, d, n); Y shared as (T, n, n);
noise as (C, 2, T, d, n) / (C, 2, T, n) matching the XLA kernel's proposal
stream so the two implementations realise the identical Markov chain.

Undirected likelihood only (the directed social-radii model uses the XLA
scan).  LSM random-walk and mixture priors both supported.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PAD_POS = 1.0e4
# VMEM budget for the per-chain working set; larger batches are chunked
_MAX_CHAIN_BYTES = 4 * 2 ** 20


def _node_scan_kernel(params_ref, x_ref, y_ref, step_ref, eps0_ref, eps1_ref,
                      u0_ref, u1_ref, muz_ref, sigz_ref, x_out_ref,
                      acc_out_ref, *, n_real, mixture):
    """params: (C, 4, n) rows [intercept, tau_sq, sigma_sq, lmbda]
    pre-broadcast along lanes (per-chain scalars as lane vectors — sliced
    (1,1) scalars hit mosaic re-layout limits).

    x (C, T, d, n); y (T, n, n) shared; step (C, T, n);
    eps0/eps1 (C, T, d, n) per phase; u0/u1 (C, T, n) per phase;
    muz (C, T, d, n); sigz (C, T, n) (mu[z] / sigma[z] gathered outside;
    unused when mixture=False).  Rank kept <= 4: higher-rank operands hit
    unsupported gather lowerings in mosaic.
    """
    C, T, d, n = x_ref.shape
    params = params_ref[...]
    # all params full-lane (C, 1, 1, n): lane-sliced or newaxis-mixed views
    # lower to unsupported gathers / relayouts in mosaic
    intercept = params[:, 0:1, :].reshape(C, 1, 1, n)
    tau_sq = params[:, 1:2, :].reshape(C, 1, 1, n)
    sigma_sq = params[:, 2:3, :].reshape(C, 1, 1, n)
    lmbda = params[:, 3:4, :].reshape(C, 1, 1, n)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)    # (1, n)
    t_col = jax.lax.broadcasted_iota(jnp.int32, (1, T, 1, 1), 1)

    step = step_ref[...][:, :, None, :]                      # (C, T, 1, n)
    eps_phase = (eps0_ref[...], eps1_ref[...])               # (C, T, d, n)
    u_phase = (u0_ref[...][:, :, None, :],
               u1_ref[...][:, :, None, :])                   # (C, T, 1, n)
    if mixture:
        muz = muz_ref[...]
        sigz = sigz_ref[...][:, :, None, :]                  # (C, T, 1, n)

    def shift_down(a):
        return jnp.concatenate([jnp.zeros_like(a[:, :1]), a[:, :-1]], axis=1)

    def shift_up(a):
        return jnp.concatenate([a[:, 1:], jnp.zeros_like(a[:, :1])], axis=1)

    def prior_terms(xq, xj, mu_j, sig_j):
        """Per-(chain, time) log-prior of candidate xq (C, T, d, 1) given
        stale neighbours from xj; returns (C, T, 1, 1)."""
        prev = shift_down(xj)
        nxt = shift_up(xj)
        if mixture:
            mu_nxt = shift_up(mu_j)
            sig_nxt = jnp.concatenate(
                [sig_j[:, 1:], jnp.ones_like(sig_j[:, :1])], axis=1)
            diff0 = xq - mu_j
            difft = xq - (1.0 - lmbda) * prev - lmbda * mu_j
            diff = jnp.where(t_col == 0, diff0, difft)
            back = (-0.5 * jnp.sum(diff * diff, axis=2, keepdims=True)
                    / sig_j)
            fdiff = nxt - (1.0 - lmbda) * xq - lmbda * mu_nxt
            fwd = (-0.5 * jnp.sum(fdiff * fdiff, axis=2, keepdims=True)
                   / sig_nxt)
        else:
            back0 = -0.5 * jnp.sum(xq * xq, axis=2, keepdims=True) / tau_sq
            backt = (-0.5 * jnp.sum((xq - prev) ** 2, axis=2, keepdims=True)
                     / sigma_sq)
            back = jnp.where(t_col == 0, back0, backt)
            fwd = (-0.5 * jnp.sum((nxt - xq) ** 2, axis=2, keepdims=True)
                   / sigma_sq)
        fwd = jnp.where(t_col == T - 1, 0.0, fwd)
        return back + fwd                                    # (C, T, 1, 1)

    def loglik_row(x_field, xq, y_row, not_self):
        """Sum over partners of the Bernoulli terms at candidate xq
        (C, T, d, 1); returns (C, T, 1, 1)."""
        diff = x_field - xq                                  # (C, T, d, n)
        dist = jnp.sqrt(jnp.maximum(
            jnp.sum(diff * diff, axis=2, keepdims=True), 0.0))  # (C,T,1,n)
        eta = intercept - dist
        ll = y_row * eta - jax.nn.softplus(eta)
        return jnp.sum(ll * not_self, axis=3, keepdims=True)

    sub32 = jax.lax.broadcasted_iota(jnp.int32, (1, 32, 1), 1)

    def body(j, carry):
        x, acc = carry
        onehot = (lane == j).astype(x.dtype)                 # (1, n)
        not_self = 1.0 - onehot
        # int8 dynamic sublane slices must be 32-aligned: load the aligned
        # 32-row block and mask-reduce to the wanted row
        j32 = pl.multiple_of((j // 32) * 32, 32)
        block = y_ref[:, pl.ds(j32, 32), :].astype(x.dtype)  # (T, 32, n)
        rowmask = (sub32 == (j - j32)).astype(x.dtype)
        y_row = jnp.sum(block * rowmask, axis=1, keepdims=True)[None]
        if mixture:
            mu_j = jnp.sum(muz * onehot, axis=3, keepdims=True)  # (C,T,d,1)
            sig_j = jnp.sum(sigz * onehot, axis=3, keepdims=True)
        else:
            mu_j = sig_j = None
        step_j = jnp.sum(step * onehot, axis=3, keepdims=True)

        for phase in (0, 1):
            xj = jnp.sum(x * onehot, axis=3, keepdims=True)  # (C, T, d, 1)
            eps_j = jnp.sum(eps_phase[phase] * onehot, axis=3,
                            keepdims=True)
            u_j = jnp.sum(u_phase[phase] * onehot, axis=3, keepdims=True)
            x_prop = xj + step_j * eps_j

            ratio = (loglik_row(x, x_prop, y_row, not_self)
                     - loglik_row(x, xj, y_row, not_self)
                     + prior_terms(x_prop, xj, mu_j, sig_j)
                     - prior_terms(xj, xj, mu_j, sig_j))     # (C, T, 1, 1)
            in_phase = (t_col % 2) == phase
            accept = jnp.logical_and(u_j < ratio, in_phase)  # (C, T, 1, 1)
            x_new = jnp.where(accept, x_prop, xj)            # (C, T, d, 1)
            x = x * (1.0 - onehot) + x_new * onehot
            acc = acc + accept.astype(x.dtype) * onehot
        return x, acc

    x0 = x_ref[...]
    acc0 = jnp.zeros((C, T, 1, n), x0.dtype)
    x_fin, acc_fin = jax.lax.fori_loop(0, n_real, body, (x0, acc0))
    x_out_ref[...] = x_fin
    acc_out_ref[...] = acc_fin[:, :, 0, :]


def _call_kernel(Y_p, chunk, *, n_real, mixture, interpret):
    x_l, step_p, eps_l, u_l, muz, sigz, params = chunk
    C, T, d, n_pad = x_l.shape
    return pl.pallas_call(
        functools.partial(_node_scan_kernel, n_real=n_real, mixture=mixture),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 10,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((C, T, d, n_pad), x_l.dtype),
                   jax.ShapeDtypeStruct((C, T, n_pad), x_l.dtype)),
        interpret=interpret,
    )(params, x_l, Y_p, step_p, eps_l[:, 0], eps_l[:, 1],
      u_l[:, 0], u_l[:, 1], muz, sigz)


def node_scan_batch(Y, X, intercept, step_size, eps, log_u, *,
                    tau_sq, sigma_sq, mu=None, sigma=None, lmbda=None,
                    z=None, mixture=False, interpret=False):
    """Chain-batched exact node scan.

    Shapes: X (C, T, n, d); intercept / lmbda (C,); tau_sq / sigma_sq
    scalars or (C,); step_size (C, T, n); eps (C, 2, n, T, d) and
    log_u (C, 2, n, T) in the XLA kernel's stream layout; mu (C, K, d);
    sigma (C, K); z (C, T, n).  Y is shared (T, n, n).

    Returns (X_new (C, T, n, d), n_accepted (C, T, n)).
    """
    C, T, n, d = X.shape
    n_pad = max(-(-n // 128) * 128, 128)
    pad = n_pad - n

    x_l = jnp.pad(jnp.moveaxis(X, 2, 3), ((0, 0),) * 3 + ((0, pad),),
                  constant_values=_PAD_POS)
    # adjacency is binary: int8 storage quarters its VMEM footprint, which
    # bounds how many chains fit per kernel
    Y_p = jnp.pad(Y, ((0, 0), (0, pad), (0, pad))).astype(jnp.int8)
    step_p = jnp.pad(step_size, ((0, 0),) * 2 + ((0, pad),))
    eps_l = jnp.pad(jnp.transpose(eps, (0, 1, 3, 4, 2)),     # (C,2,T,d,n)
                    ((0, 0),) * 4 + ((0, pad),))
    u_l = jnp.pad(jnp.transpose(log_u, (0, 1, 3, 2)),        # (C, 2, T, n)
                  ((0, 0),) * 3 + ((0, pad),))

    if mixture:
        muz = jax.vmap(lambda m, zz: m[zz])(mu, z)           # (C, T, n, d)
        muz = jnp.pad(jnp.moveaxis(muz, 2, 3), ((0, 0),) * 3 + ((0, pad),))
        sigz = jax.vmap(lambda s, zz: s[zz])(sigma, z)
        sigz = jnp.pad(sigz, ((0, 0),) * 2 + ((0, pad),), constant_values=1.0)
        lam = jnp.reshape(lmbda, (C,))
        tau_arr = jnp.zeros((C,), X.dtype)
        sig_arr = jnp.ones((C,), X.dtype)
    else:
        muz = jnp.zeros((C, T, d, n_pad), X.dtype)
        sigz = jnp.ones((C, T, n_pad), X.dtype)
        lam = jnp.zeros((C,), X.dtype)
        tau_arr = jnp.broadcast_to(jnp.asarray(tau_sq, X.dtype), (C,))
        sig_arr = jnp.broadcast_to(jnp.asarray(sigma_sq, X.dtype), (C,))

    params = jnp.stack([
        jnp.broadcast_to(jnp.reshape(intercept, (C, 1)), (C, n_pad)),
        jnp.broadcast_to(tau_arr[:, None], (C, n_pad)),
        jnp.broadcast_to(sig_arr[:, None], (C, n_pad)),
        jnp.broadcast_to(lam[:, None], (C, n_pad)),
    ], axis=1).astype(X.dtype)                               # (C, 4, n_pad)

    # VMEM sizing: the shared adjacency tile plus the per-chain working set
    # (positions, noise, prior params, outputs — measured ~0.6 MB per chain
    # at T=10, n_pad=512) must fit in the ~16 MB of VMEM with headroom.
    y_bytes = T * n_pad * n_pad          # int8
    # compiler working set per chain, fitted to measured scoped-vmem usage
    # (~1.0 MB at T=10/n_pad=512, ~0.22 MB at T=3/n_pad=128): a T*n-linear
    # term for live buffers plus a fixed per-chain scheduling overhead
    per_chain = 220 * T * n_pad + 160 * 1024
    max_c = int(max(1, (12 * 2 ** 20 - y_bytes) // per_chain))
    operands = (x_l, step_p, eps_l, u_l, muz, sigz, params)

    if C <= max_c:
        x_out, acc = _call_kernel(Y_p, operands, n_real=n, mixture=mixture,
                                  interpret=interpret)
    else:
        groups = -(-C // max_c)
        C_pad = groups * max_c

        def regroup(a):
            widths = [(0, 0)] * a.ndim
            widths[0] = (0, C_pad - C)
            a = jnp.pad(a, widths)
            return a.reshape((groups, max_c) + a.shape[1:])

        xs = tuple(regroup(a) for a in operands)
        x_out, acc = jax.lax.map(
            lambda chunk: _call_kernel(Y_p, chunk, n_real=n, mixture=mixture,
                                       interpret=interpret), xs)
        x_out = x_out.reshape((C_pad,) + x_out.shape[2:])[:C]
        acc = acc.reshape((C_pad,) + acc.shape[2:])[:C]

    X_new = jnp.moveaxis(x_out, 3, 2)[:, :, :n, :]
    return X_new, acc[:, :, :n]


@functools.partial(jax.jit, static_argnames=('mixture', 'interpret'))
def _node_scan_with_noise(Y, X, intercept, step_size, eps, log_u, *,
                          tau_sq=0.0, sigma_sq=1.0,
                          mu=None, sigma=None, lmbda=None, z=None,
                          mixture=False, interpret=False):
    """Single-chain wrapper (adds C=1): same Markov kernel and proposal
    stream as :func:`dynetlsm_tpu.mcmc.latent.sample_latent_positions`."""
    X1 = X[None]
    X_new, acc = node_scan_batch(
        Y, X1, jnp.reshape(jnp.asarray(intercept, X.dtype), (1,)),
        step_size[None], eps[None], log_u[None],
        tau_sq=tau_sq, sigma_sq=sigma_sq,
        mu=None if mu is None else mu[None],
        sigma=None if sigma is None else sigma[None],
        lmbda=None if lmbda is None else jnp.reshape(
            jnp.asarray(lmbda, X.dtype), (1,)),
        z=None if z is None else z[None],
        mixture=mixture, interpret=interpret)
    return X_new[0], acc[0]


@functools.lru_cache(maxsize=None)
def _custom_vmap_scan(mixture):
    """custom_vmap wrapper: the driver vmaps the whole sweep over chains;
    this rule routes that batch axis into the kernel's chain dimension
    instead of a (sequential) Pallas grid."""

    if mixture:
        def single(Y, X, intercept, step, eps, log_u, mu, sigma, lmbda, z):
            Xn, acc = node_scan_batch(
                Y, X[None], jnp.reshape(intercept, (1,)), step[None],
                eps[None], log_u[None], tau_sq=0.0, sigma_sq=1.0,
                mu=mu[None], sigma=sigma[None],
                lmbda=jnp.reshape(lmbda, (1,)), z=z[None], mixture=True)
            return Xn[0], acc[0]

        def batched(Y, X, intercept, step, eps, log_u, mu, sigma, lmbda, z):
            C = X.shape[0]
            return node_scan_batch(
                Y, X, jnp.reshape(intercept, (C,)), step, eps, log_u,
                tau_sq=0.0, sigma_sq=1.0, mu=mu, sigma=sigma,
                lmbda=jnp.reshape(lmbda, (C,)), z=z, mixture=True)
    else:
        def single(Y, X, intercept, step, eps, log_u, tau_sq, sigma_sq):
            Xn, acc = node_scan_batch(
                Y, X[None], jnp.reshape(intercept, (1,)), step[None],
                eps[None], log_u[None], tau_sq=tau_sq, sigma_sq=sigma_sq,
                mixture=False)
            return Xn[0], acc[0]

        def batched(Y, X, intercept, step, eps, log_u, tau_sq, sigma_sq):
            C = X.shape[0]
            return node_scan_batch(
                Y, X, jnp.reshape(intercept, (C,)), step, eps, log_u,
                tau_sq=jnp.broadcast_to(tau_sq, (C,))[0],
                sigma_sq=jnp.broadcast_to(sigma_sq, (C,))[0],
                mixture=False)

    def xla_chain(Y, X, intercept, step, eps, log_u, *rest):
        from ..mcmc.latent import xla_exact_scan
        if mixture:
            mu, sigma, lmbda, z = rest
            return xla_exact_scan(Y, X, jnp.reshape(intercept, (1,)), step,
                                  eps, log_u, mu=mu, sigma=sigma,
                                  lmbda=lmbda, z=z, mixture=True)
        tau_sq, sigma_sq = rest
        return xla_exact_scan(Y, X, jnp.reshape(intercept, (1,)), step,
                              eps, log_u, tau_sq=tau_sq, sigma_sq=sigma_sq,
                              mixture=False)

    f = jax.custom_batching.custom_vmap(single)

    @f.def_vmap
    def _rule(axis_size, in_batched, Y, *args):
        y_batched = in_batched[0]
        arg_batched = in_batched[1:]
        args = tuple(
            a if b else jnp.broadcast_to(
                jnp.asarray(a), (axis_size,) + jnp.shape(jnp.asarray(a)))
            for a, b in zip(args, arg_batched))
        T, n, d = args[0].shape[1:]
        n_pad = max(-(-n // 128) * 128, 128)
        per_chain = 220 * T * n_pad + 160 * 1024
        max_c = int(max(1, (12 * 2 ** 20 - T * n_pad * n_pad) // per_chain))
        if y_batched:
            # per-chain networks (missing-data Gibbs): no shared-Y kernel,
            # fall back to mapping the single-chain program
            out = jax.lax.map(lambda ops: single(ops[0], *ops[1:]),
                              (Y,) + args)
        elif n < 256 and axis_size > max_c:
            # small networks with many chains: XLA vectorises chains inside
            # each node step, beating sequential lax.map kernel chunks
            out = jax.vmap(lambda *a: xla_chain(Y, *a))(*args)
        else:
            out = batched(Y, *args)
        return out, (True, True)

    return f


def node_scan_dispatch(Y, X, intercept, step_size, eps, log_u, *,
                       tau_sq=None, sigma_sq=None, mu=None, sigma=None,
                       lmbda=None, z=None, mixture=False):
    """Entry point used by mcmc.latent: batch-aware exact node scan."""
    f = _custom_vmap_scan(mixture)
    if mixture:
        return f(Y, X, jnp.asarray(intercept, X.dtype), step_size, eps,
                 log_u, mu, sigma, jnp.asarray(lmbda, X.dtype), z)
    return f(Y, X, jnp.asarray(intercept, X.dtype), step_size, eps, log_u,
             jnp.asarray(tau_sq, X.dtype), jnp.asarray(sigma_sq, X.dtype))


def node_scan_sweep_pallas(key, Y, X, intercept, step_size, *,
                           tau_sq=0.0, sigma_sq=1.0,
                           mu=None, sigma=None, lmbda=None, z=None,
                           mixture=False, interpret=False):
    """One full exact node-scan sweep (draws its own proposal stream)."""
    T, n, d = X.shape
    k_eps, k_u = jax.random.split(key)
    eps = jax.random.normal(k_eps, (2, n, T, d), X.dtype)
    log_u = jnp.log(jax.random.uniform(k_u, (2, n, T), X.dtype))
    return _node_scan_with_noise(
        Y, X, intercept, step_size, eps, log_u, tau_sq=tau_sq,
        sigma_sq=sigma_sq, mu=mu, sigma=sigma, lmbda=lmbda, z=z,
        mixture=mixture, interpret=interpret)
