"""Procrustes alignment of latent spaces (jittable).

Replaces reference dynetlsm/procrustes.py (scipy ``orthogonal_procrustes``)
with ``jnp.linalg.svd`` on the tiny (d, d) cross-covariance so it can run
inside the jitted sweep (the reference applies it every post-burn iteration,
lsm.py:495-498).
"""
import jax.numpy as jnp


def procrustes_rotation(X_ref, X):
    """Orthogonal R minimising ||X R - X_ref||_F (reference procrustes.py:20-25).

    Parameters are 2-D (m, d) matrices.
    """
    # highest precision: TPU default matmul precision (bf16 inputs) would
    # make the applied rotation measurably non-orthogonal
    cross = jnp.matmul(X.T, X_ref, precision='highest')
    u, _, vt = jnp.linalg.svd(cross, full_matrices=False)
    return jnp.matmul(u, vt, precision='highest')


def static_procrustes_rotation(X_ref, X):
    R = procrustes_rotation(X_ref, X)
    return jnp.matmul(X, R, precision='highest'), R


def longitudinal_procrustes_rotation(X_ref, X):
    """One rotation shared by all time steps, fitted on the time-flattened
    matrices (reference procrustes.py:28-35).

    X_ref, X : (T, n, d)
    """
    T, n, d = X.shape
    R = procrustes_rotation(X_ref.reshape(T * n, d), X.reshape(T * n, d))
    return jnp.matmul(X, R, precision='highest'), R


def longitudinal_procrustes_transform(Xs, means=None):
    """Rotate every stored sample (and optionally cluster means) onto the
    first sample (reference procrustes.py:38-59), vmapped over samples."""
    import jax
    X_ref = Xs[0]

    def align(X):
        T, n, d = X.shape
        R = procrustes_rotation(X_ref.reshape(T * n, d), X.reshape(T * n, d))
        return jnp.matmul(X, R, precision='highest'), R

    rotated, Rs = jax.vmap(align)(Xs)
    if means is None:
        return rotated, None
    return rotated, jnp.einsum('skd,sde->ske', means, Rs,
                               precision='highest')


def flatten_array(X):
    """(..., n, d) -> (prod(...)*n, d) (reference procrustes.py:6-9)."""
    return jnp.reshape(X, (-1, X.shape[-1]))


# alias matching the reference name (reference procrustes.py:12-27)
compute_procrustes_rotation = procrustes_rotation
