"""Time the exact node-scan kernel at large n with dispatch amortised.

`probe_scan_limits.py` calls node_scan_batch eagerly, so through a
remote-dispatch tunnel (axon) every sweep pays a ~1.5 s round trip and
the printed rates are meaningless; this script jits a k-sweep chain with
the adjacency passed as an *argument* (a closed-over (T, n, n) constant
past ~100 MB is rejected by the remote-compile tunnel with HTTP 413) and
times whole jitted calls.  Results go into docs/scaling.md.

Usage: python scripts/time_scan_large_n.py [n ...]   (default 2048 4096 8192)
       prefix a case with d to run directed, e.g. d8192
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

K_SWEEPS = 3


def run(n, directed=False, T=10):
    import jax
    import jax.numpy as jnp
    from dynetlsm_tpu.ops.pallas_scan import node_scan_batch

    rng = np.random.RandomState(0)
    d = 2
    C = 1
    # build the adjacency a timestep at a time (a dense f64 (T, n, n)
    # intermediate is 21 GB at n = 16384)
    slices = []
    for _ in range(T):
        A = (rng.rand(n, n) < 0.02).astype(np.float32)
        A = np.triu(A, 1)
        if not directed:
            A = A + A.T
        slices.append(A.astype(np.float16))
    Y = jnp.asarray(np.stack(slices),
                    jnp.bfloat16 if n > 4096 else jnp.float32)
    del slices

    X = jnp.asarray(rng.randn(C, T, n, d), jnp.float32)
    step = jnp.full((C, T, n), 0.1, jnp.float32)
    eps = jnp.asarray(rng.randn(C, 2, n, T, d), jnp.float32)
    log_u = jnp.asarray(np.log(rng.rand(C, 2, n, T)), jnp.float32)
    if directed:
        b = jnp.tile(jnp.asarray([[0.4, 0.8]], jnp.float32), (C, 1))
        radii = jnp.tile(jnp.asarray(rng.dirichlet(np.ones(n)),
                                     jnp.float32)[None], (C, 1))
    else:
        b = jnp.ones((C,), jnp.float32)
        radii = None

    @jax.jit
    def k_sweeps(Y, X, step, eps, log_u, b, radii):
        for _ in range(K_SWEEPS):
            X, acc = node_scan_batch(Y, X, b, step, eps, log_u,
                                     tau_sq=2.0, sigma_sq=0.1,
                                     radii=radii, mixture=False)
        return X, acc

    def sync(a):
        # block_until_ready is not a real barrier through the axon remote
        # tunnel; a host fetch of a scalar is
        return float(jnp.sum(a))

    t0 = time.time()
    Xn, acc = k_sweeps(Y, X, step, eps, log_u, b, radii)
    sync(Xn[0, 0, 0])
    warm = time.time() - t0
    t0 = time.time()
    Xn, acc = k_sweeps(Y, Xn, step, eps, log_u, b, radii)
    sync(Xn[0, 0, 0])
    per_sweep = (time.time() - t0) / K_SWEEPS
    print('%s n=%d: warm(compile+transfer+%d sweeps) %.1fs, '
          '%.3f s/sweep steady' % ('directed' if directed else 'undirected',
                                   n, K_SWEEPS, warm, per_sweep),
          flush=True)


if __name__ == '__main__':
    cases = sys.argv[1:] or ['2048', '4096', '8192']
    for c in cases:
        directed = c.startswith('d')
        run(int(c.lstrip('d')), directed)
