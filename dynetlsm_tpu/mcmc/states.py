"""Sampler-state pytrees.

The reference scatters sampler state across Python objects (per-parameter
``Metropolis`` instances, estimator attributes).  Here each model's full
MCMC state is one NamedTuple pytree so a sweep is a pure
``state -> state`` function that can be ``jit``-ed, ``lax.scan``-ed over
iterations, ``vmap``-ed over chains, and sharded over a device mesh.
"""
from typing import NamedTuple, Optional

import jax.numpy as jnp


class LSMState(NamedTuple):
    """Dynamic LSM sampler state (reference lsm.py fit loop variables)."""
    key: jnp.ndarray
    it: jnp.ndarray                  # sweep counter, int32 scalar
    X: jnp.ndarray                   # (T, n, d)
    intercept: jnp.ndarray           # (1,) or (2,)
    radii: Optional[jnp.ndarray]     # (n,) directed only
    Y: Optional[jnp.ndarray]         # (T, n, n) only when sampling missing
    # adaptive MH bookkeeping
    step_X: jnp.ndarray              # (T, n)
    acc_X: jnp.ndarray               # (T, n)
    step_int: jnp.ndarray            # (1,) or (2,)
    acc_int: jnp.ndarray
    step_radii: Optional[jnp.ndarray]
    acc_radii: Optional[jnp.ndarray]
    # log joint + MAP tracking
    logp: jnp.ndarray
    logp_map: jnp.ndarray
    X_map: jnp.ndarray
    intercept_map: jnp.ndarray
    radii_map: Optional[jnp.ndarray]
    # frozen-at-burn reference for Procrustes rotation (lsm.py:495-498)
    logp_ref: jnp.ndarray
    X_ref: jnp.ndarray
    # posterior sum of sampled missing dyads (post-burn)
    missing_sum: Optional[jnp.ndarray]
    # case-control control-node index tensors (T, n, n_control), -1 padded
    ctrl_in: Optional[jnp.ndarray] = None
    ctrl_out: Optional[jnp.ndarray] = None
    # inverse temperature of the NETWORK likelihood (parallel tempering,
    # mcmc/tempering.py); None (the default) compiles the untempered sweep
    temper: Optional[jnp.ndarray] = None
    # accumulated replica-swap acceptances of the pair (slot, slot+1),
    # driving ladder adaptation during the tune phase
    acc_swap: Optional[jnp.ndarray] = None


class MixtureState(NamedTuple):
    """Shared state for LPCM / HDP-LPCM samplers.

    ``weights`` holds the full (T, K, K) stack with the initial distribution
    stored in weights[0, 0] (HDP convention, reference hdp_lpcm.py:123).
    For the LPCM, ``init_weights`` (K,) and ``trans_weights`` (K, K) are used
    instead and ``weights``/``beta`` stay None.  Resampled concentration /
    hyper-prior scalars live here because they are chain-specific.
    """
    key: jnp.ndarray
    it: jnp.ndarray
    X: jnp.ndarray
    intercept: jnp.ndarray
    radii: Optional[jnp.ndarray]
    Y: Optional[jnp.ndarray]
    z: jnp.ndarray                   # (T, n) int32
    mu: jnp.ndarray                  # (K, d)
    sigma: jnp.ndarray               # (K,)
    lmbda: jnp.ndarray               # () blending coefficient
    # HDP-only fields
    weights: Optional[jnp.ndarray]   # (T, K, K)
    beta: Optional[jnp.ndarray]      # (K,)
    gamma: Optional[jnp.ndarray]     # () DP concentration
    alpha_init: Optional[jnp.ndarray]
    alpha: Optional[jnp.ndarray]
    kappa: Optional[jnp.ndarray]
    # LPCM-only fields
    init_weights: Optional[jnp.ndarray]   # (K,)
    trans_weights: Optional[jnp.ndarray]  # (K, K)
    # resampled hyper-priors (hdp_lpcm.py:957-972)
    mean_var: jnp.ndarray            # tau^2 prior variance of cluster means
    b_scale: jnp.ndarray             # scale of InvGamma prior on sigma
    # adaptive MH bookkeeping
    step_X: jnp.ndarray
    acc_X: jnp.ndarray
    step_int: jnp.ndarray
    acc_int: jnp.ndarray
    step_radii: Optional[jnp.ndarray]
    acc_radii: Optional[jnp.ndarray]
    # log joint + MAP
    logp: jnp.ndarray
    missing_sum: Optional[jnp.ndarray]
    # case-control control-node index tensors (T, n, n_control), -1 padded
    ctrl_in: Optional[jnp.ndarray] = None
    ctrl_out: Optional[jnp.ndarray] = None
    # inverse temperature of the NETWORK likelihood (parallel tempering,
    # mcmc/tempering.py); None (the default) compiles the untempered sweep
    temper: Optional[jnp.ndarray] = None
    # accumulated replica-swap acceptances of the pair (slot, slot+1),
    # driving ladder adaptation during the tune phase
    acc_swap: Optional[jnp.ndarray] = None
