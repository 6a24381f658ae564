"""Probe whether raising --xla_tpu_scoped_vmem_limit_kib lifts the node-scan
kernel's chains-per-invocation capacity.

The `_vmem_max_chains` model is calibrated against the compiler's DEFAULT
scoped-VMEM budget (~16 MiB on v5e; total VMEM is 128 MiB).  If the
per-compile DebugOptions flag is honored through the axon tunnel, a larger
scoped budget fits proportionally more chains in ONE kernel invocation —
amortizing the sequential node-scan's per-step overhead over more lanes.

Usage: python scripts/probe_scoped_vmem.py [limit_kib] [C ...]
e.g.   python scripts/probe_scoped_vmem.py 65536 64 96 128
"""
import os
import sys
import time

limit_kib = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_tpu_scoped_vmem_limit_kib=%d'
                           % limit_kib).strip()

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def run_case(C, T=10, n=500, n_sweeps=10):
    import jax
    import jax.numpy as jnp
    from dynetlsm_tpu.ops import pallas_scan

    # bypass the capacity clamp so the whole batch lands in ONE invocation
    orig = pallas_scan._vmem_max_chains
    pallas_scan._vmem_max_chains = (
        lambda *a, **k: 10**6 if k.get('clamp', True) else 10**6)
    try:
        rng = np.random.RandomState(0)
        d = 2
        Y = (rng.rand(T, n, n) < 0.05).astype(np.float32)
        Y = np.triu(Y, 1)
        Y = Y + np.transpose(Y, (0, 2, 1))
        Y = jnp.asarray(Y)
        X = jnp.asarray(rng.randn(C, T, n, d), jnp.float32)
        step = jnp.full((C, T, n), 0.1, jnp.float32)
        eps = jnp.asarray(rng.randn(C, 2, n, T, d), jnp.float32)
        log_u = jnp.asarray(np.log(rng.rand(C, 2, n, T)), jnp.float32)
        b = jnp.ones((C,), jnp.float32)

        @jax.jit
        def k_sweeps(Y, X, step, eps, log_u, b):
            for _ in range(n_sweeps):
                X, acc = pallas_scan.node_scan_batch(
                    Y, X, b, step, eps, log_u,
                    tau_sq=2.0, sigma_sq=0.1, mixture=False)
            return X

        t0 = time.time()
        try:
            Xn = k_sweeps(Y, X, step, eps, log_u, b)
            float(jnp.sum(Xn[0, 0, 0]))
        except Exception as e:  # noqa: BLE001
            print('C=%d limit=%dKiB: FAIL (%.1fs): %s'
                  % (C, limit_kib, time.time() - t0,
                     str(e).splitlines()[0][:140]), flush=True)
            return
        warm = time.time() - t0
        t0 = time.time()
        Xn = k_sweeps(Y, Xn, step, eps, log_u, b)
        float(jnp.sum(Xn[0, 0, 0]))
        per = (time.time() - t0) / n_sweeps
        print('C=%d limit=%dKiB: OK warm %.1fs, %.4f s/sweep '
              '-> %.0f sweep*chains/s (one invocation)'
              % (C, limit_kib, warm, per, C / per), flush=True)
    finally:
        pallas_scan._vmem_max_chains = orig


if __name__ == '__main__':
    cases = [int(c) for c in sys.argv[2:]] or [48, 64, 96]
    for C in cases:
        run_case(C)
