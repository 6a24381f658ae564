"""Execute the estimator docstring examples as tests.

The reference runs its docstring fits as CI doctests
(reference setup.cfg ``[tool:pytest] --doctest-modules``;
reference lsm.py:218-223, hdp_lpcm.py:366-374) — they are its de-facto
integration tests on real data.  This mirrors that: each estimator's
``Examples`` section is executed under doctest on the virtual CPU mesh.
"""
import doctest

import pytest

import dynetlsm_tpu.models.lsm
import dynetlsm_tpu.models.lpcm
import dynetlsm_tpu.models.hdp_lpcm


@pytest.mark.parametrize('module', [
    dynetlsm_tpu.models.lsm,
    dynetlsm_tpu.models.lpcm,
    dynetlsm_tpu.models.hdp_lpcm,
], ids=lambda m: m.__name__.rsplit('.', 1)[-1])
def test_estimator_docstring_examples(module):
    results = doctest.testmod(module, verbose=False)
    assert results.attempted > 0, 'docstring examples missing'
    assert results.failed == 0
