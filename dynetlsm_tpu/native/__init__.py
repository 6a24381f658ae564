"""ctypes loader for the native posterior post-processing library.

Compiles ``fastpost.cpp`` with g++ on first use into a per-user cache and
binds it through the plain C ABI.  Every entry point has a NumPy fallback,
so the package works without a compiler.
"""
import ctypes
import hashlib
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), 'fastpost.cpp')
_LIB = None
_TRIED = False


def _build_and_load():
    with open(_SRC, 'rb') as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.path.join(os.path.expanduser('~'), '.cache', 'dynetlsm_tpu')
    os.makedirs(cache, exist_ok=True)
    so_path = os.path.join(cache, 'fastpost_%s.so' % digest)
    if not os.path.exists(so_path):
        tmp = so_path + '.tmp.%d' % os.getpid()
        cmd = ['g++', '-O3', '-fPIC', '-shared', '-std=c++17',
               '-o', tmp, _SRC]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, so_path)
    lib = ctypes.CDLL(so_path)

    i64 = ctypes.c_int64
    p_i32 = np.ctypeslib.ndpointer(np.int32, flags='C_CONTIGUOUS')
    p_f64 = np.ctypeslib.ndpointer(np.float64, flags='C_CONTIGUOUS')
    lib.cluster_counts.argtypes = [p_i32, i64, i64, i64, p_i32]
    lib.cluster_counts_t.argtypes = [p_i32, i64, i64, i64, i64, p_i32]
    lib.cooccurrence.argtypes = [p_i32, i64, i64, i64, p_f64]
    return lib


def get_lib():
    """The loaded native library, or None if compilation failed."""
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        try:
            _LIB = _build_and_load()
        except Exception:  # pragma: no cover - depends on toolchain
            _LIB = None
    return _LIB


def cluster_counts(z, n_components):
    """Occupied-cluster count per sample; z (S, ...) int labels."""
    z = np.ascontiguousarray(np.asarray(z, np.int32).reshape(z.shape[0], -1))
    lib = get_lib()
    if lib is None:
        return np.array([np.unique(row).shape[0] for row in z],
                        dtype=np.int32)
    out = np.empty(z.shape[0], dtype=np.int32)
    lib.cluster_counts(z, z.shape[0], z.shape[1], int(n_components), out)
    return out


def cluster_counts_t(z, n_components):
    """Occupied-cluster counts per (time, sample); z (S, T, n)."""
    z = np.ascontiguousarray(np.asarray(z, np.int32))
    S, T, n = z.shape
    lib = get_lib()
    if lib is None:
        return np.array([[np.unique(z[s, t]).shape[0] for s in range(S)]
                         for t in range(T)], dtype=np.int32)
    out = np.empty((T, S), dtype=np.int32)
    lib.cluster_counts_t(z, S, T, n, int(n_components), out)
    return out


def cooccurrence(z, n_components):
    """Mean co-clustering probabilities; z (S, n) -> (n, n) float64."""
    z = np.ascontiguousarray(np.asarray(z, np.int32))
    S, n = z.shape
    lib = get_lib()
    if lib is None:
        onehot = np.eye(int(n_components), dtype=np.float32)[z]
        return np.einsum('sik,sjk->ij', onehot, onehot).astype(np.float64) / S
    out = np.empty((n, n), dtype=np.float64)
    lib.cooccurrence(z, S, n, int(n_components), out)
    return out / S
