"""Host-side (one-time) initialisation routines.

These run once per fit on the host, so NumPy/scipy/sklearn are acceptable
here; everything inside the sweep is jittable (see dynetlsm_tpu.mcmc).

* :func:`generalized_mds` — Sarkar & Moore (2005) dynamic-graph MDS
  (reference latent_space.py:47-95)
* :func:`longitudinal_kmeans` — Genolini & Falissard (2010)
  (reference latent_space.py:98-137)
* :func:`initialize_radii` (reference latent_space.py:140-153)
* :func:`scale_intercept_mle`, :func:`directed_intercept_mle`
  (reference lsm.py:47-97) — BFGS on the jitted likelihood with JAX autodiff
  instead of hand-written gradients.
"""
import numpy as np
import jax
import jax.numpy as jnp

from scipy.optimize import minimize
from scipy.sparse import csgraph
from sklearn.cluster import KMeans
from sklearn.manifold import MDS

from ..ops.distances import pairwise_distances
from ..ops.likelihoods import (
    undirected_loglik_full, directed_loglik_full)


def shortest_path_dissimilarity(Y, unweighted=True):
    """Shortest-path graph dissimilarity; unreachable pairs imputed with
    (max finite distance + 1) (reference latent_space.py:36-44)."""
    dist = csgraph.shortest_path(Y, directed=False, unweighted=unweighted)
    inf_mask = np.isinf(dist)
    if inf_mask.any():
        dist[inf_mask] = np.max(dist[~inf_mask]) + 1
    return dist


def generalized_mds(Y, n_features=2, is_directed=False, unweighted=True,
                    lmbda=10.0, random_state=None):
    """Generalized MDS initialisation of the latent trajectory.

    t=0 uses classical MDS on the shortest-path dissimilarity; subsequent
    steps take the top eigenvectors of a blend of the new Gram matrix and
    the previous embedding's Gram matrix, then Procrustes-align
    (reference latent_space.py:47-95).
    """
    Y = np.asarray(Y, dtype=np.float64)
    squeeze = Y.ndim == 2
    if squeeze:
        Y = Y[None]
    T, n, _ = Y.shape

    D = np.stack([shortest_path_dissimilarity(Y[t], unweighted) for t in range(T)])

    X = np.empty((T, n, n_features))
    # sklearn >= 1.9 renamed dissimilarity= to metric= and will flip the
    # default init to 'classical_mds' in 1.10; pin both (random init keeps
    # the reference's SMACOF behaviour, latent_space.py:65)
    try:
        mds = MDS(metric='precomputed', init='random',
                  n_components=n_features, random_state=random_state)
    except TypeError:  # older sklearn without metric=/init=
        mds = MDS(dissimilarity='precomputed', n_components=n_features,
                  random_state=random_state)
    X[0] = mds.fit_transform(D[0])

    H = np.eye(n) - np.full((n, n), 1.0 / n)
    a = 1.0 / (1.0 + lmbda)
    b = lmbda / (1.0 + lmbda)
    for t in range(1, T):
        gram = a * (H @ (-0.5 * D[t] ** 2) @ H) + b * (X[t - 1] @ X[t - 1].T)
        evals, evecs = np.linalg.eigh(gram)
        top = slice(-1, -n_features - 1, -1)
        X[t] = evecs[:, top] * np.sqrt(np.maximum(evals[top], 0.0))
        # align with previous step to remove the rotation ambiguity
        u, _, vt = np.linalg.svd(X[t].T @ X[t - 1], full_matrices=False)
        X[t] = X[t] @ (u @ vt)

    if is_directed:
        # match the scale of the radii simplex (reference latent_space.py:92-93)
        X /= n

    return X[0] if squeeze else X


def longitudinal_kmeans(X, n_clusters=5, var_reg=1e-3, random_state=None):
    """K-means on time-stacked node trajectories; returns time-constant
    cluster means, spherical variances, and labels
    (reference latent_space.py:98-137)."""
    T, n, d = X.shape
    feats = np.moveaxis(np.asarray(X, dtype=np.float64), 0, -1).reshape(n, T * d)
    km = KMeans(n_clusters=n_clusters, random_state=random_state, n_init=10)
    labels_static = km.fit_predict(feats)
    labels = np.tile(labels_static, (T, 1))

    centers = np.empty((n_clusters, d))
    for k in range(n_clusters):
        centers[k] = km.cluster_centers_[k].reshape(d, T).T.mean(axis=0)

    variances = np.zeros(n_clusters)
    for k in range(n_clusters):
        for t in range(T):
            pts = X[t][labels[t] == k]
            if pts.shape[0]:
                variances[k] += np.var(pts, axis=0).mean()
        variances[k] /= T
    variances[variances == 0.0] = var_reg

    return centers, variances, labels


def initialize_radii(Y, reg=1e-5):
    """Degree-normalised social radii (reference latent_space.py:140-153)."""
    Y = np.asarray(Y, dtype=np.float64)
    radii = 0.5 * (Y.sum(axis=(0, 1)) + Y.sum(axis=(0, 2)))
    radii /= Y.sum()
    if np.any(radii == 0.0):
        radii += reg
        radii /= radii.sum()
    return radii


# ---------------------------------------------------------------------------
# intercept MLEs (BFGS over the jitted likelihood, JAX autodiff gradients)
# ---------------------------------------------------------------------------

@jax.jit
def _neg_ll_undirected(params, Y, dist):
    scale, intercept = params[0], params[1]
    return -undirected_loglik_full(Y, jnp.exp(scale) * dist, intercept)


@jax.jit
def _neg_ll_directed(params, Y, dist, radii):
    return -directed_loglik_full(Y, dist, radii, params[0], params[1])


def _host_cpu():
    """The host CPU device: BFGS init runs dozens of tiny objective
    evaluations, each a blocking round-trip if dispatched to a (possibly
    remote) accelerator — on-host they are microseconds."""
    try:
        return jax.devices('cpu')[0]
    except RuntimeError:  # pragma: no cover - cpu platform always present
        return None


def scale_intercept_mle(Y, X, tol=1e-4):
    """Joint MLE of a log-scale for X and the intercept (reference lsm.py:47-70)."""
    with jax.default_device(_host_cpu()):
        dist = jnp.asarray(pairwise_distances(jnp.asarray(X, jnp.float32)))
        Yj = jnp.asarray(Y, jnp.float32)
        vg = jax.jit(jax.value_and_grad(_neg_ll_undirected))

        def fun(x):
            v, g = vg(jnp.asarray(x, jnp.float32), Yj, dist)
            return float(v), np.asarray(g, np.float64)

        res = minimize(fun, x0=np.array([0.0, 1.0]), jac=True, method='BFGS',
                       tol=tol)
    return float(res.x[0]), float(res.x[1])


def directed_intercept_mle(Y, X, radii, intercept_init=None, tol=1e-4):
    """MLE of (intercept_in, intercept_out) (reference lsm.py:73-97)."""
    with jax.default_device(_host_cpu()):
        dist = jnp.asarray(pairwise_distances(jnp.asarray(X, jnp.float32)))
        Yj = jnp.asarray(Y, jnp.float32)
        rj = jnp.asarray(radii, jnp.float32)
        vg = jax.jit(jax.value_and_grad(_neg_ll_directed))

        def fun(x):
            v, g = vg(jnp.asarray(x, jnp.float32), Yj, dist, rj)
            return float(v), np.asarray(g, np.float64)

        x0 = (np.asarray(intercept_init, np.float64)
              if intercept_init is not None else np.zeros(2))
        res = minimize(fun, x0=x0, jac=True, method='BFGS', tol=tol)
    return float(res.x[0]), float(res.x[1])


# ---------------------------------------------------------------------------
# public gradient / distance helpers (reference latent_space.py:19-33,
# lsm.py:32-44) — autodiff on the jitted likelihood instead of hand-written
# gradient formulas
# ---------------------------------------------------------------------------

def calculate_distances(X, squared=False):
    """Pairwise latent distances, static (n, d) or longitudinal (T, n, d)
    (reference latent_space.py:19-33)."""
    return np.asarray(pairwise_distances(jnp.asarray(X), squared=squared))


def undirected_intercept_grad(Y, X, intercept, squared=False, dist=None):
    """d loglik / d intercept (reference lsm.py:32-36)."""
    if dist is None:
        dist = pairwise_distances(jnp.asarray(X, jnp.float32),
                                  squared=squared)
    g = jax.grad(lambda b: undirected_loglik_full(
        jnp.asarray(Y, jnp.float32), dist, b))(jnp.asarray(intercept,
                                                           jnp.float32))
    return float(g)


def scale_grad(Y, X, intercept, scale, squared=False, dist=None):
    """d loglik / d log-scale of the latent positions (reference
    lsm.py:39-44; the reference parameterises the scale as exp(scale)).

    The reference sums this gradient over the full off-diagonal matrix
    (both triangles, no 1/2 — unlike its intercept gradient); the factor
    2 below reproduces that convention from the i<j autodiff value.
    """
    if dist is None:
        dist = pairwise_distances(jnp.asarray(X, jnp.float32),
                                  squared=squared)
    g = jax.grad(lambda s: undirected_loglik_full(
        jnp.asarray(Y, jnp.float32), jnp.exp(s) * dist,
        jnp.asarray(intercept, jnp.float32)))(jnp.asarray(scale, jnp.float32))
    return 2.0 * float(g)
