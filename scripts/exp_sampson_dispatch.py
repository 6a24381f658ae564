"""Measure kernel-vs-XLA crossover for the exact node scan at Sampson
scale (n=18 < 256) with many chains.

The dispatch rule in ops/pallas_scan._custom_vmap_scan routes small-n
many-chain batches to the vectorised XLA scan (round-2 measurement: XLA
1.8x at C=64, time-major kernel layout).  The chain-major layout removes
the T -> 8 sublane padding (2.67x wasted work at T=3), so the crossover
needs re-measuring.  Developer tool; not part of the benchmark contract.

Usage: python scripts/exp_sampson_dispatch.py [n_chains]
"""
import sys
import time

import numpy as np

sys.path.insert(0, '.')


def force(x):
    import jax.numpy as jnp
    import jax
    return float(jnp.ravel(jax.tree.leaves(x)[0])[0])


def timeit(fn, *args, rounds=8):
    out = fn(*args)
    force(out)

    def run(r):
        t0 = time.time()
        for _ in range(r):
            out = fn(*args)
        force(out)
        return time.time() - t0

    t1 = min(run(rounds), run(rounds))
    t4 = min(run(4 * rounds), run(4 * rounds))
    return max(t4 - t1, 1e-9) / (3 * rounds) * 1000.0


def main():
    import jax
    import jax.numpy as jnp
    from dynetlsm_tpu.datasets import load_monks
    from dynetlsm_tpu.ops.pallas_scan import node_scan_batch
    from dynetlsm_tpu.mcmc.latent import xla_exact_scan

    C = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    rng = np.random.RandomState(0)
    Y, _, _ = load_monks(is_directed=False)
    Y = np.asarray(Y, np.float32)
    T, n, d, K = Y.shape[0], Y.shape[1], 2, 10

    Xc = jnp.asarray(rng.randn(C, T, n, d), jnp.float32)
    step = jnp.full((C, T, n), 0.1, jnp.float32)
    eps = jnp.asarray(rng.randn(C, 2, n, T, d), jnp.float32)
    log_u = jnp.asarray(np.log(rng.rand(C, 2, n, T)), jnp.float32)
    mu = jnp.asarray(rng.randn(C, K, d), jnp.float32)
    sig = jnp.asarray(rng.rand(C, K) + 0.3, jnp.float32)
    z = jnp.asarray(rng.randint(0, K, (C, T, n)), jnp.int32)
    b = jnp.asarray(rng.rand(C) + 0.5, jnp.float32)
    lam = jnp.full((C,), 0.8, jnp.float32)
    Yd = jnp.asarray(Y)

    kern = jax.jit(lambda x, bb, st, ep, lu, m, s, lm, zz: node_scan_batch(
        Yd, x, bb, st, ep, lu, tau_sq=0.0, sigma_sq=1.0,
        mu=m, sigma=s, lmbda=lm, z=zz, mixture=True))
    t_kern = timeit(kern, Xc, b, step, eps, log_u,
                    mu, sig, lam, z)

    xla = jax.jit(jax.vmap(
        lambda x, bb, st, ep, lu, m, s, lm, zz: xla_exact_scan(
            Yd, x, jnp.reshape(bb, (1,)), st, ep, lu,
            mu=m, sigma=s, lmbda=lm, z=zz, mixture=True)))
    t_xla = timeit(xla, Xc, b, step, eps, log_u, mu, sig, lam, z)

    print('C=%d  kernel %.2f ms  xla %.2f ms  (kernel/xla %.2fx)'
          % (C, t_kern, t_xla, t_kern / t_xla))


if __name__ == '__main__':
    main()
