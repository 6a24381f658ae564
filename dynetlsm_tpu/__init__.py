"""dynetlsm_tpu: TPU-native Bayesian latent space models for dynamic networks.

A from-scratch JAX/XLA rebuild of the capabilities of joshloyal/dynetlsm:
LSM, LPCM, and HDP-LPCM estimators driven by jitted Metropolis-within-Gibbs
sweeps, vmapped parallel chains, and mesh-sharded execution.
"""
import os as _os

import jax as _jax

# Persistent XLA compilation cache: sweep executables are large (20-40 s to
# compile) but reusable across processes for identical shapes.
if 'JAX_COMPILATION_CACHE_DIR' not in _os.environ:
    try:
        _cache = _os.path.join(
            _os.path.expanduser('~'), '.cache', 'dynetlsm_tpu', 'jax_cache')
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update('jax_compilation_cache_dir', _cache)
        _jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.2)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

from .models.lsm import DynamicNetworkLSM
from .models.lpcm import DynamicNetworkLPCM
from .models.hdp_lpcm import DynamicNetworkHDPLPCM

__all__ = ['DynamicNetworkLSM', 'DynamicNetworkLPCM',
           'DynamicNetworkHDPLPCM']
__version__ = '0.1.0'
