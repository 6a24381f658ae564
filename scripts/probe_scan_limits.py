"""Probe the exact node-scan Pallas kernel's real VMEM limits on the TPU.

Compiles/runs node_scan_batch at the shapes the `_vmem_max_chains`
formula claims to serve (and the first shapes past each claimed cap) and
times one sweep at each.  Used to calibrate the capacity constants after
kernel-layout changes; results are recorded in docs/scaling.md.

Usage: python scripts/probe_scan_limits.py [case ...]
  cases: ns48 ns56 ns64 dir48 u8192 d8192 u16384 d16384 u16384t ...
  (default: a safe calibration sweep)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def run_case(name, T, n, C, directed, n_sweeps=1):
    import jax
    import jax.numpy as jnp
    from dynetlsm_tpu.ops.pallas_scan import node_scan_batch

    rng = np.random.RandomState(0)
    d = 2
    # sparse-ish adjacency assembled in bf16 on host: at n = 16384 a dense
    # f32 (T, n, n) is 10.7 GB and would not leave room for the bf16 copy
    Y = (rng.rand(T, n, n) < 0.02).astype(np.float32)
    Y = np.triu(Y, 1)
    if not directed:
        Y = Y + np.transpose(Y, (0, 2, 1))
    Y = jnp.asarray(Y, jnp.bfloat16 if n > 4096 else jnp.float32)

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

    t0 = time.time()
    try:
        Xn, acc = node_scan_batch(Y, X, b, step, eps, log_u,
                                  tau_sq=2.0, sigma_sq=0.1, radii=radii,
                                  mixture=False)
        jax.block_until_ready(Xn)
    except Exception as e:  # noqa: BLE001
        print('%s: FAIL (%.1fs): %s' % (name, time.time() - t0,
                                        str(e).splitlines()[0][:160]),
              flush=True)
        return
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(n_sweeps):
        Xn, acc = node_scan_batch(Y, Xn, b, step, eps, log_u,
                                  tau_sq=2.0, sigma_sq=0.1, radii=radii,
                                  mixture=False)
    jax.block_until_ready(Xn)
    per_sweep = (time.time() - t0) / n_sweeps
    print('%s: OK compile %.1fs, %.4f s/sweep (C=%d -> %.1f sweep*chains/s)'
          % (name, compile_s, per_sweep, C, C / per_sweep), flush=True)


CASES = {
    'ns48': (10, 500, 48, False, 20),
    'ns52': (10, 500, 52, False, 20),
    'ns56': (10, 500, 56, False, 20),
    'ns64': (10, 500, 64, False, 20),
    'dir48': (10, 500, 48, True, 20),
    'dir56': (10, 500, 56, True, 20),
    'u4096': (10, 4096, 1, False, 3),
    'u8192': (10, 8192, 1, False, 3),
    'd8192': (10, 8192, 1, True, 3),
    'u16384': (10, 16384, 1, False, 2),
    'd16384': (10, 16384, 1, True, 1),
}

if __name__ == '__main__':
    names = sys.argv[1:] or ['ns48', 'ns56', 'u8192', 'd8192', 'u16384']
    for nm in names:
        run_case(nm, *CASES[nm])
