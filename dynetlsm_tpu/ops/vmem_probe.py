"""Probe-and-cache calibration of the Pallas node-scan chain capacity.

``pallas_scan._vmem_max_chains`` models how many chains fit one kernel
invocation inside VMEM.  The model's constants (buffer counts, spill
allowance) mirror the XLA compiler's scoped-vmem accounting, which is not
a contract — a compiler upgrade can silently invalidate them, either
wasting capacity (underestimate) or failing to compile (overestimate).
This module makes the analytic model an *initial guess only*: the first
time a (T, n_pad, directed, stream16, mixture) shape is used on a TPU,
the kernel is compiled (abstract shapes only — no data, no execution) at
the guessed chain count, the count is grown while compilation succeeds
and shrunk while it fails, and the calibrated capacity is persisted to a
JSON cache next to the XLA compilation cache.  Subsequent processes pay
nothing.

Compile probes run at trace time of the enclosing sweep jit (an
independent nested AOT compile), each costing one kernel compilation;
the search is bounded (<= ~6 probes) and runs once per shape per
machine.  ``DYNETLSM_VMEM_PROBE=0`` disables probing (pure analytic
model); ``DYNETLSM_VMEM_CACHE`` overrides the cache path.
"""
import json
import os
import tempfile
import threading

_CACHE_LOCK = threading.Lock()
_CACHE = None


def scoped_vmem_options():
    """Optional XLA compiler options raising the TPU scoped-VMEM limit
    (DYNETLSM_SCOPED_VMEM_KIB, e.g. 65536 for 64 MiB): measured on v5e,
    64 MiB roughly doubles the node-scan chain capacity (n=512: 84
    chains compile vs 42; directed n=8192 becomes servable at all).
    Returns None when unset (compiler default, 16 MiB)."""
    kib = os.environ.get('DYNETLSM_SCOPED_VMEM_KIB')
    if not kib:
        return None
    return {'xla_tpu_scoped_vmem_limit_kib': str(int(kib))}


def _cache_path():
    return os.environ.get(
        'DYNETLSM_VMEM_CACHE',
        os.path.join(os.path.expanduser('~'), '.cache', 'dynetlsm_tpu',
                     'vmem_probe.json'))


def _load_cache():
    global _CACHE
    if _CACHE is None:
        try:
            with open(_cache_path()) as fh:
                _CACHE = json.load(fh)
        except (OSError, ValueError):
            _CACHE = {}
    return _CACHE


def _store(key, value):
    with _CACHE_LOCK:
        cache = _load_cache()
        cache[key] = value
        path = _cache_path()
        try:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path))
            with os.fdopen(fd, 'w') as fh:
                json.dump(cache, fh)
            os.replace(tmp, path)
        except OSError:
            pass                     # in-memory cache still serves this run


def search_capacity(fits, guess, max_grow=12):
    """Bounded search for the largest C with ``fits(C)`` true, seeded at
    ``guess``: grow by ~3/2 while fitting (up to ``max_grow`` steps, so
    even a badly under-seeded search recovers — 12 steps reach ~90x the
    seed), halve while failing.  Returns 0 when not even one chain fits.
    Pure logic — unit-tested with fake ``fits`` oracles (graceful
    degradation under a mis-model)."""
    c = max(1, int(guess))
    if fits(c):
        best = c
        for _ in range(max_grow):
            nxt = max(c + 1, (c * 3) // 2)
            if not fits(nxt):
                break
            c = best = nxt
        return best
    while c > 1:
        c = max(1, c // 2)
        if fits(c):
            return c
    return 0


def _probe_key(T, n_pad, directed, stream16, mixture):
    import jax
    dev = jax.devices()[0]
    kind = getattr(dev, 'device_kind', 'unknown').replace(' ', '_')
    scoped = os.environ.get('DYNETLSM_SCOPED_VMEM_KIB', 'dflt')
    return 'p2/v%s/%s/vmem%s/T%d_n%d_dir%d_s16%d_mix%d' % (
        jax.__version__, kind, scoped, T, n_pad, int(directed),
        int(stream16), int(mixture))


def _compile_fits(T, n_pad, directed, stream16, mixture, C):
    """True when the node-scan kernel compiles at C chains for this shape
    (abstract AOT compile; nothing executes).

    The kernel is probed inside a 2-iteration ``fori_loop`` carrying the
    position field, mirroring how the sweep scan actually invokes it: a
    loop-carried pallas call pays extra scoped-VMEM stack for its aliased
    outputs (~4.5 MB at n_pad=8192), so a standalone-compile probe would
    overestimate the capacity of the real program."""
    import jax
    import jax.numpy as jnp
    from . import pallas_scan as ps

    d = 2
    y_dtype = jnp.bfloat16 if stream16 else jnp.int8

    def f(Y_p, x, step, eps, u, muz, sigz, params):
        def body(_, carry):
            x_new, _acc = ps._call_kernel(
                Y_p, (carry, step, eps, u, muz, sigz, params),
                mixture=mixture, directed=directed, n_real=n_pad,
                interpret=False, stream16=stream16)
            return x_new
        return jax.lax.fori_loop(0, 2, body, x)

    sds = jax.ShapeDtypeStruct
    args = (sds((T, n_pad, n_pad), y_dtype),
            sds((d, C, T, n_pad), jnp.float32),
            sds((C, T, n_pad), jnp.float32),
            sds((2, d, C, T, n_pad), jnp.float32),
            sds((C, 2, T, n_pad), jnp.float32),
            sds((d, C, T, n_pad), jnp.float32),
            sds((C, T, n_pad), jnp.float32),
            sds((C, 8, n_pad), jnp.float32))
    try:
        opts = scoped_vmem_options()
        lowered = jax.jit(f).lower(*args)
        if opts:
            lowered.compile(compiler_options=opts)
        else:
            lowered.compile()
        return True
    except Exception as exc:                     # noqa: BLE001
        if os.environ.get('DYNETLSM_VMEM_PROBE_DEBUG'):
            print('[vmem_probe] C=%d failed: %s'
                  % (C, str(exc).splitlines()[0] if str(exc) else exc))
        return False


def probed_max_chains(T, n_pad, directed, stream16, mixture, guess):
    """Calibrated chain capacity for one kernel shape: cached probe result
    if available, else run the bounded compile search seeded at the
    analytic ``guess`` and persist it.  Returns the capacity (0 = the
    kernel does not fit at all)."""
    if os.environ.get('DYNETLSM_VMEM_PROBE', '1') == '0':
        return guess
    key = _probe_key(T, n_pad, directed, stream16, mixture)
    cache = _load_cache()
    if key in cache:
        return int(cache[key])
    cap = search_capacity(
        lambda C: _compile_fits(T, n_pad, directed, stream16, mixture, C),
        guess)
    _store(key, int(cap))
    return cap
