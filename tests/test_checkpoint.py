"""Checkpoint/resume: an interrupted fit resumes bit-exactly."""
import numpy as np
import pytest

from dynetlsm_tpu import DynamicNetworkLSM
from dynetlsm_tpu.datasets import simple_splitting_dynamic_network
from dynetlsm_tpu.mcmc import driver as drv


def test_lsm_checkpoint_resume(tmp_path, monkeypatch):
    Y, _ = simple_splitting_dynamic_network(n_nodes=16, n_time_steps=2,
                                            random_state=7)
    ckpt = str(tmp_path / 'ckpt')

    # uninterrupted run (no checkpoint)
    full = DynamicNetworkLSM(n_iter=40, tune=30, burn=30, random_state=5,
                             trace_chunk=25).fit(Y)

    # interrupted run: stop collect_traces after the second chunk
    orig = drv.collect_traces

    class Stop(Exception):
        pass

    calls = {'chunks': 0}

    def failing_collect(runner, state, n_samples, chunk=512, progress=None,
                        checkpoint_dir=None):
        def counting_progress(done, total):
            calls['chunks'] += 1
            if calls['chunks'] == 2:
                raise Stop()
        return orig(runner, state, n_samples, chunk=chunk,
                    progress=counting_progress,
                    checkpoint_dir=checkpoint_dir)

    import dynetlsm_tpu.models.lsm as lsm_mod
    monkeypatch.setattr(lsm_mod, 'collect_traces', failing_collect)
    with pytest.raises(Stop):
        DynamicNetworkLSM(n_iter=40, tune=30, burn=30, random_state=5,
                          trace_chunk=25, checkpoint_dir=ckpt).fit(Y)
    monkeypatch.setattr(lsm_mod, 'collect_traces', orig)

    # resume: same constructor args + checkpoint dir
    resumed = DynamicNetworkLSM(n_iter=40, tune=30, burn=30, random_state=5,
                                trace_chunk=25, checkpoint_dir=ckpt).fit(Y)

    # identical RNG stream + identical state => identical traces
    np.testing.assert_allclose(resumed.Xs_, full.Xs_, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(resumed.logps_, full.logps_, rtol=1e-4,
                               atol=1e-4)


def test_hdp_checkpoint_resume_runs(tmp_path):
    """Mixture-state checkpointing: a second fit with an existing checkpoint
    directory resumes and completes with identical trace shapes."""
    from dynetlsm_tpu import DynamicNetworkHDPLPCM
    Y, _ = simple_splitting_dynamic_network(n_nodes=14, n_time_steps=2,
                                            random_state=3)
    ckpt = str(tmp_path / 'hdp_ckpt')
    m1 = DynamicNetworkHDPLPCM(n_iter=30, tune=20, burn=20, n_components=4,
                               random_state=9, trace_chunk=25,
                               checkpoint_dir=ckpt).fit(Y)
    # resume from the completed checkpoint: all chunks load from disk
    m2 = DynamicNetworkHDPLPCM(n_iter=30, tune=20, burn=20, n_components=4,
                               random_state=9, trace_chunk=25,
                               checkpoint_dir=ckpt).fit(Y)
    assert m2.Xs_.shape == m1.Xs_.shape
    np.testing.assert_allclose(m2.logps_[1:], m1.logps_[1:], rtol=1e-5)
