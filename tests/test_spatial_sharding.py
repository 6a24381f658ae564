"""Node-axis (spatial) sharding: fits on a 2-D ('chains', 'nodes') mesh.

The reference has no distributed execution at all (SURVEY.md §5.8); chains
data-parallelism is covered by tests/test_mesh_sharding.py.  These tests
exercise the second mesh axis: Y rows / latent positions / labels sharded
over ``nodes`` inside each chain, with XLA inserting the all-gathers and
psums the pairwise likelihood terms need.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from dynetlsm_tpu import DynamicNetworkLSM, DynamicNetworkHDPLPCM
from dynetlsm_tpu.datasets import simple_splitting_dynamic_network
from dynetlsm_tpu.mcmc.driver import spatial_mesh, spatial_auto_mesh


@pytest.fixture(scope='module')
def network():
    Y, labels = simple_splitting_dynamic_network(
        n_nodes=24, n_time_steps=2, random_state=7)
    return Y


def test_spatial_mesh_shapes():
    mesh = spatial_mesh(2, 4)
    assert mesh.axis_names == ('chains', 'nodes')
    assert mesh.devices.shape == (2, 4)
    # auto: 8 devices, 4-way node sharding, 3 chains -> 1 chain row used
    mesh = spatial_auto_mesh(3, 24, 4)
    assert mesh.devices.shape == (1, 4)
    with pytest.raises(ValueError, match='divide'):
        spatial_auto_mesh(2, 25, 4)


def test_lsm_spatial_fit(network):
    m = DynamicNetworkLSM(n_iter=40, tune=40, burn=40, n_chains=2,
                          node_devices=4, latent_update='parallel',
                          random_state=5).fit(network)
    assert m.mesh_.devices.shape == (2, 4)
    assert m.mesh_.axis_names == ('chains', 'nodes')
    # the positions really are node-sharded on device
    assert m.state_sharding_ is not None
    assert m.state_sharding_.spec == P('chains', None, 'nodes', None)
    assert np.isfinite(np.asarray(m.logps_)).all()
    assert m.auc_ > 0.6


def test_hdp_spatial_fit(network):
    m = DynamicNetworkHDPLPCM(n_iter=40, tune=40, burn=40, n_components=5,
                              n_chains=2, node_devices=4,
                              latent_update='parallel',
                              random_state=5).fit(network)
    assert m.mesh_.devices.shape == (2, 4)
    # sample 0 is the -inf init placeholder; every drawn sample's log
    # joint must be finite
    logps = np.asarray(m.logps_)[:, 1:]
    assert np.isfinite(logps).all()
    assert m.auc_ > 0.6


def test_case_control_spatial_fit(network):
    """Case-control x node sharding — the intended large-n configuration
    (docs/scaling.md): control-index gathers cross shard boundaries, so
    GSPMD must resolve them against the sharded position field."""
    m = DynamicNetworkLSM(n_iter=30, tune=30, burn=30, n_chains=2,
                          node_devices=4, latent_update='parallel',
                          n_control=8, random_state=5).fit(network)
    assert m.mesh_.devices.shape == (2, 4)
    assert np.isfinite(np.asarray(m.logps_)).all()
    assert m.auc_ > 0.6


def test_directed_spatial_fit():
    rng = np.random.RandomState(0)
    Y = (rng.rand(2, 24, 24) < 0.2).astype(float)
    for t in range(2):
        np.fill_diagonal(Y[t], 0)
    m = DynamicNetworkLSM(is_directed=True, n_iter=30, tune=30, burn=30,
                          n_chains=2, node_devices=4,
                          latent_update='parallel', random_state=5).fit(Y)
    assert m.mesh_.devices.shape == (2, 4)
    # radii are (chains, n): sharded over nodes too
    assert np.isfinite(np.asarray(m.logps_)).all()
    assert m.auc_ > 0.55


def test_spatial_checkpoint_resume(network, tmp_path, monkeypatch):
    """Resuming onto a 2-D mesh re-places the state node-sharded
    (collect_traces routes through shard_state_spatial)."""
    import pytest as _pytest
    from dynetlsm_tpu.mcmc import driver as drv
    import dynetlsm_tpu.models.lsm as lsm_mod

    ckpt = str(tmp_path / 'sp_ckpt')
    kwargs = dict(n_iter=40, tune=30, burn=30, random_state=5,
                  trace_chunk=25, n_chains=2, node_devices=4,
                  latent_update='parallel')

    full = DynamicNetworkLSM(**kwargs).fit(network)

    class Stop(Exception):
        pass

    orig = drv.collect_traces
    calls = {'chunks': 0}

    def failing_collect(runner, state, n_samples, chunk=512, progress=None,
                        checkpoint_dir=None, mesh=None):
        def counting_progress(done, total):
            calls['chunks'] += 1
            if calls['chunks'] == 2:
                raise Stop()
        return orig(runner, state, n_samples, chunk=chunk,
                    progress=counting_progress,
                    checkpoint_dir=checkpoint_dir, mesh=mesh)

    monkeypatch.setattr(lsm_mod, 'collect_traces', failing_collect)
    with _pytest.raises(Stop):
        DynamicNetworkLSM(checkpoint_dir=ckpt, **kwargs).fit(network)
    monkeypatch.setattr(lsm_mod, 'collect_traces', orig)

    resumed = DynamicNetworkLSM(checkpoint_dir=ckpt, **kwargs).fit(network)
    assert resumed.state_sharding_.spec == P('chains', None, 'nodes', None)
    np.testing.assert_allclose(resumed.Xs_, full.Xs_, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(resumed.logps_),
                               np.asarray(full.logps_), rtol=1e-4, atol=1e-3)


def test_missing_dyads_spatial_fit(network):
    """Missing-dyad resampling under node sharding: the imputed Y lives in
    the (sharded) state and the miss mask is row-sharded too."""
    Y = np.array(network, dtype=float)
    rng = np.random.RandomState(1)
    miss = rng.rand(*Y.shape) < 0.05
    miss = np.triu(miss, 1) | np.swapaxes(np.triu(miss, 1), 1, 2)
    Y[miss] = np.nan
    m = DynamicNetworkLSM(n_iter=30, tune=30, burn=30, n_chains=2,
                          node_devices=4, latent_update='parallel',
                          random_state=5).fit(Y)
    assert m.mesh_.devices.shape == (2, 4)
    assert np.isfinite(np.asarray(m.logps_)).all()


def test_spatial_requires_parallel_update(network):
    with pytest.raises(ValueError, match='parallel'):
        DynamicNetworkLSM(n_iter=10, tune=0, burn=0, node_devices=4,
                          random_state=5).fit(network)


@pytest.mark.slow
def test_spatial_posterior_agrees_with_replicated(network):
    """Matched-budget fits sharded vs replicated sample the same posterior:
    a partitioning bug that perturbed the kernel (dropped psum terms, wrong
    row masks) would shift the post-burn log joint and the fit quality far
    beyond reduction-order noise."""
    kw = dict(n_iter=800, tune=400, burn=400, n_components=5,
              latent_update='parallel', random_state=5, n_chains=2)
    a = DynamicNetworkHDPLPCM(**kw).fit(network)
    b = DynamicNetworkHDPLPCM(node_devices=4, **kw).fit(network)
    la = np.asarray(a.logps_)[:, 401:]
    lb = np.asarray(b.logps_)[:, 401:]
    # mode-switching on the splitting network keeps the per-sample sd large
    # (~300); a broken likelihood shifts the mean by thousands
    assert abs(la.mean() - lb.mean()) < 0.5 * max(la.std(), lb.std())
    assert abs(a.auc_ - b.auc_) < 0.05


def test_spatial_evaluations_match_replicated(network):
    """The deterministic building blocks compute the same values under node
    sharding (GSPMD changes the partitioning, not the math).

    A full *sweep* is deliberately not compared path-wise: sharded psums
    reduce in a different order than fused unsharded sums, and an MH accept
    whose ratio lands within float noise of its threshold can legitimately
    flip — after which the discrete label path diverges.  The Markov kernel
    itself is unchanged; fit-level agreement is covered by the fit tests
    above.
    """
    from dynetlsm_tpu.ops.likelihoods import undirected_loglik_full
    from dynetlsm_tpu.ops.distances import pairwise_distances
    from dynetlsm_tpu.mcmc.latent import sample_latent_positions
    from dynetlsm_tpu.mcmc.labels import sample_labels_block

    rng = np.random.RandomState(3)
    Y = np.asarray(network, np.float32)
    T, n, _ = Y.shape
    K, d = 5, 2
    X = rng.randn(T, n, d).astype(np.float32)
    mu = jnp.asarray(rng.randn(K, d), jnp.float32)
    sigma = jnp.ones(K, jnp.float32)
    z = jnp.asarray(rng.randint(0, K, (T, n)), jnp.int32)
    w = jnp.full((T, K, K), 1.0 / K, jnp.float32)
    step = jnp.full((T, n), 0.1, jnp.float32)
    key = jax.random.PRNGKey(42)

    mesh = spatial_mesh(2, 4)

    def put(a, spec):
        return jax.device_put(jnp.asarray(a), NamedSharding(mesh, P(*spec)))

    # full network log-likelihood: psum over sharded rows vs fused sum
    ll = jax.jit(lambda Yd, Xd: undirected_loglik_full(
        Yd, pairwise_distances(Xd), 1.0))
    ref = np.asarray(ll(jnp.asarray(Y), jnp.asarray(X)))
    got = np.asarray(ll(put(Y, (None, 'nodes', None)),
                        put(X, (None, 'nodes', None))))
    np.testing.assert_allclose(got, ref, rtol=1e-5)

    # one parallel latent update: same RNG bits, same proposals
    upd = jax.jit(lambda k, Yd, Xd, zd, sd: sample_latent_positions(
        k, Yd, Xd, jnp.ones(1), sd, mu=mu, sigma=sigma,
        lmbda=jnp.asarray(0.9), z=zd, mixture=True, scheme='parallel'))
    X_ref, acc_ref = upd(key, jnp.asarray(Y), jnp.asarray(X), z, step)
    X_got, acc_got = upd(key, put(Y, (None, 'nodes', None)),
                         put(X, (None, 'nodes', None)),
                         put(np.asarray(z), (None, 'nodes')),
                         put(np.asarray(step), (None, 'nodes')))
    np.testing.assert_allclose(np.asarray(X_got), np.asarray(X_ref),
                               rtol=1e-4, atol=1e-5)

    # blocked FFBS labels: emission + backward scan + Gumbel draws
    ffbs = jax.jit(lambda k, Xd: sample_labels_block(
        k, Xd, mu, sigma, jnp.asarray(0.9), w)[0])
    z_ref = np.asarray(ffbs(key, jnp.asarray(X)))
    z_got = np.asarray(ffbs(key, put(X, (None, 'nodes', None))))
    np.testing.assert_array_equal(z_got, z_ref)
