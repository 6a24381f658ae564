"""Execute the shipped walkthrough notebooks end-to-end (fast budgets).

The reference ships two `.ipynb` walkthroughs (reference
`notebooks/Sampson's Monastery.ipynb` and `notebooks/Synthetic Network
(Community Splitting).ipynb`); ours live in `notebooks/` with the same
structure on the TPU-native estimators.  `DYNETLSM_NB_FAST=1` shrinks the
sweep budgets so each notebook executes in well under a minute — this test
runs every cell for real through nbclient, so a broken plot kwarg or a
renamed estimator attribute fails CI rather than a user's kernel.
"""
import os

import pytest

nbformat = pytest.importorskip('nbformat')
nbclient = pytest.importorskip('nbclient')

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NOTEBOOKS = [
    'notebooks/synthetic_community_splitting.ipynb',
    'notebooks/sampson_monastery.ipynb',
]


# The environment's sitecustomize force-registers the TPU backend, so
# JAX_PLATFORMS in the kernel's env is not enough to keep the notebook
# off the accelerator (same reason conftest.py calls jax.config.update);
# pin the platform with a prepended cell before any notebook cell
# imports jax.
_PIN_PLATFORM = (
    "import jax\n"
    "jax.config.update('jax_platforms', %r)\n"
    % os.environ.get('DYNETLSM_TEST_PLATFORM', 'cpu'))


@pytest.mark.slow
@pytest.mark.parametrize('rel_path', NOTEBOOKS)
def test_notebook_executes(rel_path):
    path = os.path.join(REPO, rel_path)
    nb = nbformat.read(path, as_version=4)
    nb.cells.insert(0, nbformat.v4.new_code_cell(_PIN_PLATFORM))
    os.environ['DYNETLSM_NB_FAST'] = '1'
    client = nbclient.NotebookClient(
        nb, timeout=600, kernel_name='python3',
        resources={'metadata': {'path': REPO}})
    client.execute()  # raises CellExecutionError on any failing cell
