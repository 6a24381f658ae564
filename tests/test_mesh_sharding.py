"""Mesh-sharded execution tests (fast tier).

The conftest provisions a virtual 8-device CPU mesh, so these tests verify
the production sharding strategy — chains sharded over a 1-D ``chains``
mesh (SURVEY.md §5.8) — actually places state across devices, for both the
driver primitives and a full model fit.  Capability supersedes the
reference's process-level parallelism (examples/homogeneous_simulation.py:28).
"""
import numpy as np
import pytest

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from dynetlsm_tpu import DynamicNetworkLSM
from dynetlsm_tpu.datasets import simple_splitting_dynamic_network
from dynetlsm_tpu.mcmc.driver import auto_mesh


def test_auto_mesh_subsets():
    devs = jax.devices()
    assert len(devs) == 8, 'conftest should provision 8 virtual devices'
    # even division: all devices
    assert auto_mesh(8).devices.size == 8
    assert auto_mesh(16).devices.size == 8
    # fewer chains than devices: use a subset, not a single device
    assert auto_mesh(4).devices.size == 4
    assert auto_mesh(6).devices.size == 6
    # non-divisible: largest divisor subset
    assert auto_mesh(12).devices.size == 6
    # degenerate
    assert auto_mesh(1) is None
    assert auto_mesh(7).devices.size == 7


def test_lsm_fit_is_mesh_sharded():
    Y, _ = simple_splitting_dynamic_network(n_nodes=16, n_time_steps=2,
                                            random_state=7)
    model = DynamicNetworkLSM(n_iter=30, tune=30, burn=30, n_chains=8,
                              random_state=5).fit(Y)
    assert model.mesh_ is not None
    assert model.mesh_.devices.size == 8

    # the final sampler state must really have been placed
    # NamedSharding(P('chains')) across all 8 devices
    sh = model.state_sharding_
    assert isinstance(sh, NamedSharding)
    assert sh.spec == P('chains')
    assert len(sh.mesh.devices.ravel()) == 8

    assert model.Xs_.shape == (8, 90, 2, 16, 2)
    assert np.isfinite(model.logps_).all()


def test_multichain_hdp_diagnostics():
    # per-chain Geweke (worst |z|) + between-chain diagnostics are stored
    # as fitted attributes on multichain mixture fits
    from dynetlsm_tpu import DynamicNetworkHDPLPCM
    Y, _ = simple_splitting_dynamic_network(n_nodes=16, n_time_steps=2,
                                            random_state=7)
    model = DynamicNetworkHDPLPCM(n_iter=60, tune=30, burn=30, n_chains=4,
                                  n_components=4, random_state=5).fit(Y)
    z, p = model.logp_geweke_
    assert np.isfinite(z) and 0.0 <= p <= 1.0
    assert np.isfinite(model.logp_rhat_) and model.logp_rhat_ >= 1.0
    assert model.logp_effective_n_ > 0.0


def test_lsm_fit_device_subset_mesh():
    # 4 chains on an 8-device host must engage a 4-device mesh (the round-1
    # heuristic silently ran on one device here)
    Y, _ = simple_splitting_dynamic_network(n_nodes=16, n_time_steps=2,
                                            random_state=7)
    model = DynamicNetworkLSM(n_iter=20, tune=20, burn=20, n_chains=4,
                              random_state=5).fit(Y)
    assert model.mesh_ is not None
    assert model.mesh_.devices.size == 4
    assert np.isfinite(model.logps_).all()
