"""Test configuration: run the suite on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware
(SURVEY.md §4 implication)."""
import os

# Force the virtual CPU mesh even when the ambient environment points JAX at
# a real accelerator (e.g. JAX_PLATFORMS=axon): the test suite's multi-chip
# assertions need 8 devices.  Set DYNETLSM_TEST_PLATFORM to override.
# jax may already be imported by a sitecustomize hook, so mutating
# os.environ['JAX_PLATFORMS'] alone is not enough — update the live config
# (safe as long as no backend is initialized yet, which is the case at
# conftest-import time).
_platform = os.environ.get('DYNETLSM_TEST_PLATFORM', 'cpu')
os.environ['JAX_PLATFORMS'] = _platform
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
import jax  # noqa: E402

jax.config.update('jax_platforms', _platform)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(42)
