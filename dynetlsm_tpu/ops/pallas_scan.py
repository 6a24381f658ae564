"""Fused Pallas kernel for the exact sequential latent-position node scan.

The exact single-site sampler requires 2n dependent Metropolis steps per
sweep (mcmc/latent.py).  Executed as an XLA ``fori_loop``, each step is a
chain of small kernels whose dispatch dominates wall-clock at large n
(~9.5 us/step at T=10, n=500).  This kernel runs the entire scan inside one
Pallas program: the position field stays in VMEM/registers across all 2n
steps, node gathers/scatters are one-hot lane operations, and the only HBM
traffic is one read of Y and the noise plus one write of the results.

Layout: node axis on lanes — X is carried as (T, d, n); Y as (T, n, n);
noise as (2, T, d, n) / (2, T, n) matching the XLA kernel's stream so the
two implementations are comparable proposal-for-proposal.

Undirected likelihood only (the directed social-radii model still uses the
XLA scan).  LSM random-walk and mixture priors both supported.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PAD_POS = 1.0e4


def _node_scan_kernel(scalars_ref, x_ref, y_ref, step_ref, eps_ref, u_ref,
                      muz_ref, sigz_ref, x_out_ref, acc_out_ref,
                      *, n_real, mixture):
    """scalars: (8, 128) VMEM tile carrying [intercept, tau_sq, sigma_sq,
    lmbda] in rows 0-3 of column 0 (a full VMEM tile keeps the operand
    batchable under vmap, unlike SMEM scalars).

    x (T, d, n); y (T, n, n); step (T, n); eps (2, T, d, n); u (2, T, n);
    muz/sigz: per-(t, node) mixture prior parameters gathered on the host
    (mu[z], sigma[z]) — (T, d, n) and (T, n); unused when mixture=False.
    """
    scal = scalars_ref[...]
    # reduce to rank-0 scalars (sregs) — sliced (1,1) vectors keep a
    # position-dependent layout mosaic cannot re-broadcast
    intercept = jnp.sum(scal[0:1, 0:1])
    tau_sq = jnp.sum(scal[1:2, 0:1])
    sigma_sq = jnp.sum(scal[2:3, 0:1])
    lmbda = jnp.sum(scal[3:4, 0:1])

    T, d, n = x_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)        # (1, n)
    t_col = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)       # (T, 1)

    step = step_ref[...]
    eps = eps_ref[...]
    log_u = u_ref[...]
    if mixture:
        muz = muz_ref[...]
        sigz = sigz_ref[...]

    def shift_down(a):
        """a[t-1] with zeros at t=0; a is (T, k)."""
        return jnp.concatenate([jnp.zeros_like(a[:1]), a[:-1]], axis=0)

    def shift_up(a):
        """a[t+1] with zeros at t=T-1."""
        return jnp.concatenate([a[1:], jnp.zeros_like(a[:1])], axis=0)

    def prior_terms(xq, xj, mu_j, sig_j):
        """Per-time log-prior of candidate xq (T, d) given the node's stale
        trajectory xj for temporal neighbours."""
        prev = shift_down(xj)
        nxt = shift_up(xj)
        if mixture:
            mu_nxt = shift_up(mu_j)
            sig_nxt = jnp.concatenate([sig_j[1:], jnp.ones_like(sig_j[:1])], 0)
            diff0 = xq - mu_j
            difft = xq - (1.0 - lmbda) * prev - lmbda * mu_j
            diff = jnp.where(t_col == 0, diff0, difft)
            back = -0.5 * jnp.sum(diff * diff, axis=1, keepdims=True) / sig_j
            fdiff = nxt - (1.0 - lmbda) * xq - lmbda * mu_nxt
            fwd = -0.5 * jnp.sum(fdiff * fdiff, axis=1, keepdims=True) / sig_nxt
        else:
            back0 = -0.5 * jnp.sum(xq * xq, axis=1, keepdims=True) / tau_sq
            backt = (-0.5 * jnp.sum((xq - prev) ** 2, axis=1, keepdims=True)
                     / sigma_sq)
            back = jnp.where(t_col == 0, back0, backt)
            fwd = (-0.5 * jnp.sum((nxt - xq) ** 2, axis=1, keepdims=True)
                   / sigma_sq)
        fwd = jnp.where(t_col == T - 1, 0.0, fwd)
        return back + fwd                                        # (T, 1)

    def loglik_row(x_field, xq, y_row, not_self):
        """Sum over partners of the Bernoulli terms at candidate xq (T, d)."""
        # dist[t, i] = || x_field[t, :, i] - xq[t, :] ||
        diff = x_field - xq[:, :, None]                          # (T, d, n)
        dist = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=1), 0.0))
        eta = intercept - dist                                   # (T, n)
        ll = y_row * eta - jax.nn.softplus(eta)
        return jnp.sum(ll * not_self, axis=1, keepdims=True)     # (T, 1)

    def body(j, carry):
        x, acc = carry
        onehot = (lane == j).astype(x.dtype)                     # (1, n)
        not_self = 1.0 - onehot
        y_row = y_ref[:, pl.ds(j, 1), :][:, 0, :]                # (T, n)
        if mixture:
            mu_j = jnp.sum(muz * onehot[None], axis=2)           # (T, d)
            sig_j = jnp.sum(sigz * onehot, axis=1, keepdims=True)  # (T, 1)
        else:
            mu_j = sig_j = None
        step_j = jnp.sum(step * onehot, axis=1, keepdims=True)   # (T, 1)

        for phase in (0, 1):
            xj = jnp.sum(x * onehot[None], axis=2)               # (T, d)
            eps_j = jnp.sum(eps[phase] * onehot[None], axis=2)   # (T, d)
            u_j = jnp.sum(log_u[phase] * onehot, axis=1,
                          keepdims=True)                         # (T, 1)
            x_prop = xj + step_j * eps_j

            ratio = (loglik_row(x, x_prop, y_row, not_self)
                     - loglik_row(x, xj, y_row, not_self)
                     + prior_terms(x_prop, xj, mu_j, sig_j)
                     - prior_terms(xj, xj, mu_j, sig_j))         # (T, 1)
            in_phase = (t_col % 2) == phase
            accept = jnp.logical_and(u_j < ratio, in_phase)      # (T, 1)
            x_new = jnp.where(accept, x_prop, xj)                # (T, d)
            x = x * (1.0 - onehot[None]) + x_new[:, :, None] * onehot[None]
            acc = acc + accept.astype(x.dtype) * onehot
        return x, acc

    x0 = x_ref[...]
    acc0 = jnp.zeros((T, n), x0.dtype)
    x_fin, acc_fin = jax.lax.fori_loop(0, n_real, body, (x0, acc0))
    x_out_ref[...] = x_fin
    acc_out_ref[...] = acc_fin


@functools.partial(jax.jit, static_argnames=('mixture', 'interpret'))
def node_scan_sweep_pallas(key, Y, X, intercept, step_size, *,
                           tau_sq=0.0, sigma_sq=1.0,
                           mu=None, sigma=None, lmbda=None, z=None,
                           mixture=False, interpret=False):
    """One full exact node-scan sweep fused into a single Pallas kernel.

    Same Markov kernel and proposal stream layout as
    :func:`dynetlsm_tpu.mcmc.latent.sample_latent_positions` (undirected).
    Returns (X_new (T, n, d), n_accepted (T, n)).
    """
    T, n, d = X.shape
    n_pad = max(-(-n // 128) * 128, 128)

    k_eps, k_u = jax.random.split(key)
    eps = jax.random.normal(k_eps, (2, n, T, d), X.dtype)
    log_u = jnp.log(jax.random.uniform(k_u, (2, n, T), X.dtype))
    return _node_scan_with_noise(
        Y, X, intercept, step_size, eps, log_u,
        tau_sq=tau_sq, sigma_sq=sigma_sq, mu=mu, sigma=sigma, lmbda=lmbda,
        z=z, mixture=mixture, interpret=interpret)


@functools.partial(jax.jit, static_argnames=('mixture', 'interpret'))
def _node_scan_with_noise(Y, X, intercept, step_size, eps, log_u, *,
                          tau_sq=0.0, sigma_sq=1.0,
                          mu=None, sigma=None, lmbda=None, z=None,
                          mixture=False, interpret=False):
    T, n, d = X.shape
    n_pad = max(-(-n // 128) * 128, 128)
    pad = n_pad - n

    x_l = jnp.moveaxis(X, 1, 2)                                  # (T, d, n)
    x_l = jnp.pad(x_l, ((0, 0), (0, 0), (0, pad)),
                  constant_values=_PAD_POS)
    Y_p = jnp.pad(Y, ((0, 0), (0, pad), (0, pad)))
    step_p = jnp.pad(step_size, ((0, 0), (0, pad)))
    eps_l = jnp.pad(jnp.transpose(eps, (0, 2, 3, 1)),            # (2, T, d, n)
                    ((0, 0), (0, 0), (0, 0), (0, pad)))
    u_l = jnp.pad(jnp.transpose(log_u, (0, 2, 1)),               # (2, T, n)
                  ((0, 0), (0, 0), (0, pad)))

    if mixture:
        muz = jnp.moveaxis(mu[z], 1, 2)                          # (T, d, n)
        muz = jnp.pad(muz, ((0, 0), (0, 0), (0, pad)))
        sigz = jnp.pad(sigma[z], ((0, 0), (0, pad)),
                       constant_values=1.0)
        lam = lmbda
    else:
        muz = jnp.zeros((T, d, n_pad), X.dtype)
        sigz = jnp.ones((T, n_pad), X.dtype)
        lam = 0.0

    scalars = jnp.zeros((8, 128), X.dtype)
    scalars = scalars.at[0, 0].set(jnp.asarray(intercept, X.dtype).reshape(()))
    scalars = scalars.at[1, 0].set(jnp.asarray(tau_sq, X.dtype))
    scalars = scalars.at[2, 0].set(jnp.asarray(sigma_sq, X.dtype))
    scalars = scalars.at[3, 0].set(jnp.asarray(lam, X.dtype))

    x_out, acc = pl.pallas_call(
        functools.partial(_node_scan_kernel, n_real=n, mixture=mixture),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((T, d, n_pad), X.dtype),
                   jax.ShapeDtypeStruct((T, n_pad), X.dtype)),
        interpret=interpret,
    )(scalars, x_l, Y_p, step_p, eps_l, u_l, muz, sigz)

    X_new = jnp.moveaxis(x_out, 2, 1)[:, :n, :]
    return X_new, acc[:, :n]
