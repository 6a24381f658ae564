"""dynetlsm_tpu: TPU-native Bayesian latent space models for dynamic networks.

A from-scratch JAX/XLA rebuild of the capabilities of joshloyal/dynetlsm:
LSM, LPCM, and HDP-LPCM estimators driven by jitted Metropolis-within-Gibbs
sweeps, vmapped parallel chains, and mesh-sharded execution.
"""
from .models.lsm import DynamicNetworkLSM

__all__ = ['DynamicNetworkLSM']
__version__ = '0.1.0'
