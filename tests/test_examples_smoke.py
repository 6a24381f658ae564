"""Smoke tests for the simulation-study harnesses in examples/.

The reference establishes correctness-in-practice through these studies
(SURVEY.md §4); a tiny-budget replicate must keep producing the full
reference metric-column set (reference examples/homogeneous_simulation.py:
139-184) so the scripts cannot bit-rot.
"""
import os
import sys

import numpy as np
import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), os.pardir, 'examples')


@pytest.mark.slow
def test_homogeneous_simulation_single_replicate(tmp_path):
    sys.path.insert(0, EXAMPLES)
    try:
        from homogeneous_simulation import benchmark_single, STAT_NAMES
    finally:
        sys.path.remove(EXAMPLES)

    out = str(tmp_path / 'benchmark_0.csv')
    res = benchmark_single(n_iter=60, burn=15, tune=15, outfile_name=out,
                           model_type='hdp_lpcm', random_state=0)
    # the reference study's metric columns, all present and sane even at a
    # smoke budget
    for name in STAT_NAMES:
        assert name in res.columns, name
    row = res.iloc[0]
    assert 0.5 < row['insample_auc'] <= 1.0
    assert 0.5 < row['outsample_auc'] <= 1.0
    assert 0.5 < row['onestep_auc'] <= 1.0
    assert row['vi'] >= 0.0
    assert -1.0 <= row['rand_index'] <= 1.0
    assert os.path.exists(out)


def test_simulation_scripts_importable():
    # the replicate entry points exist with the expected signatures (the
    # scripts guard execution behind __main__, so importing is side-effect
    # free)
    sys.path.insert(0, EXAMPLES)
    try:
        import homogeneous_simulation as hom
        import inhomogeneous_simulation as inhom
        import detection_limit as det
        import parallel_tempering as pt
    finally:
        sys.path.remove(EXAMPLES)
    assert callable(hom.benchmark_single)
    assert callable(inhom.benchmark_single)
    assert hasattr(det, '__file__')
    assert callable(pt.run)
    assert pt.make_hard_directed_network(random_state=1).shape == (3, 24, 24)
    # the generators the studies depend on produce the fit/forecast split
    from dynetlsm_tpu.datasets import homogeneous_simulation as gen
    Y = gen(n_time_steps=3, n_nodes=30, random_state=1)[0]
    assert Y.shape == (3, 30, 30)


@pytest.mark.slow
def test_parallel_tempering_demo():
    """The tempering demo's headline claim at a reduced budget: the
    cold-chain means agree more tightly than the same slot budget spent
    on independent chains in the metastable regime."""
    sys.path.insert(0, EXAMPLES)
    try:
        from parallel_tempering import run
    finally:
        sys.path.remove(EXAMPLES)
    b_plain, b_pt, ladder = run(n_iter=400, tune=150, burn=150)
    assert b_plain.shape == (8,) and b_pt.shape == (2,)
    assert np.isfinite(b_plain).all() and np.isfinite(b_pt).all()
    assert b_pt.std() < b_plain.std()
    assert ladder.shape == (8,) and np.allclose(ladder[::4], 1.0)


def test_competitor_sbm_smoke():
    """Native spectral-SBM competitor baseline (the reference's dynsbm
    comparison scripts are R-only): one replicate end to end with both
    variants, metrics well-formed."""
    sys.path.insert(0, os.path.join(EXAMPLES, os.pardir))
    from examples.competitor_sbm import run_study

    for variant in ('static', 'dynamic'):
        rows, med = run_study(n_reps=1, sim_type='easy', variant=variant,
                              n_time_steps=3, n_nodes=60, true_k=6)
        assert -0.5 <= med['rand_index'] <= 1.0
        assert med['vi'] >= 0.0
        assert 2 <= med['num_clusters'] <= 8
