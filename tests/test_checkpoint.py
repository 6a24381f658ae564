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
                        checkpoint_dir=None, mesh=None):
        def counting_progress(done, total):
            calls['chunks'] += 1
            if calls['chunks'] == 2:
                raise Stop()
        return orig(runner, state, n_samples, chunk=chunk,
                    progress=counting_progress,
                    checkpoint_dir=checkpoint_dir, mesh=mesh)

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


def test_checkpoint_stale_chunks_not_spliced(tmp_path):
    """Reusing a checkpoint dir after a budget change must not splice the
    old run's chunk files into the new run's traces (round-2 review
    finding: resume used to load every chunk_*.npz on disk)."""
    import jax.numpy as jnp
    from dynetlsm_tpu.mcmc.driver import collect_traces

    def make_runner(chunk):
        def run(state, n):
            vals = state + 1 + jnp.arange(chunk)
            vals = jnp.where(jnp.arange(chunk) < n, vals, 0)
            return state + n, {'v': vals}
        run.chunk = chunk
        return run

    runner = make_runner(4)
    ck = str(tmp_path)

    # run A: 12 samples, completes, leaves chunk_00000..2 on disk
    _, tr = collect_traces(runner, jnp.asarray(0), 12, chunk=4,
                           checkpoint_dir=ck)
    assert list(np.asarray(tr['v'])) == list(range(1, 13))

    # run B: 16 samples, interrupted after its first chunk
    calls = {'n': 0}

    def stop_progress(done, total):
        calls['n'] += 1
        if calls['n'] == 1:
            raise RuntimeError('interrupt')

    with pytest.raises(RuntimeError):
        collect_traces(runner, jnp.asarray(0), 16, chunk=4,
                       checkpoint_dir=ck, progress=stop_progress)

    # resume run B: exactly 1..16 — run A's stale chunks must not appear
    _, tr = collect_traces(runner, jnp.asarray(0), 16, chunk=4,
                           checkpoint_dir=ck)
    assert list(np.asarray(tr['v'])) == list(range(1, 17))


def test_checkpoint_fingerprint_mismatch_restarts(tmp_path):
    """A resume against a different state structure starts fresh instead of
    loading incompatible leaves."""
    import jax.numpy as jnp
    from dynetlsm_tpu.mcmc.driver import collect_traces

    def make_runner(chunk):
        def run(state, n):
            vals = state[0] + 1 + jnp.arange(chunk)
            vals = jnp.where(jnp.arange(chunk) < n, vals, 0)
            return state.at[0].add(n), {'v': vals}
        run.chunk = chunk
        return run

    runner = make_runner(4)
    ck = str(tmp_path)
    calls = {'n': 0}

    def stop_progress(done, total):
        calls['n'] += 1
        if calls['n'] == 1:
            raise RuntimeError('interrupt')

    with pytest.raises(RuntimeError):
        collect_traces(runner, jnp.zeros(2), 8, chunk=4,
                       checkpoint_dir=ck, progress=stop_progress)

    # same n_samples/chunk but a different state shape: must NOT resume
    _, tr = collect_traces(runner, jnp.zeros(3), 8, chunk=4,
                           checkpoint_dir=ck)
    assert list(np.asarray(tr['v'])) == list(range(1, 9))


def test_tempered_checkpoint_resume(tmp_path, monkeypatch):
    """Tempered fits checkpoint the full ladder state (temper, acc_swap)
    and resume bit-exactly, including mid-tune ladder adaptation."""
    Y, _ = simple_splitting_dynamic_network(n_nodes=16, n_time_steps=2,
                                            random_state=7)
    ckpt = str(tmp_path / 'pt_ckpt')
    kw = dict(n_iter=40, tune=30, burn=30, tune_interval=10, random_state=5,
              trace_chunk=25, n_temps=3, beta_min=0.25)

    full = DynamicNetworkLSM(**kw).fit(Y)

    orig = drv.collect_traces

    class Stop(Exception):
        pass

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

    import dynetlsm_tpu.models.lsm as lsm_mod
    monkeypatch.setattr(lsm_mod, 'collect_traces', failing_collect)
    with pytest.raises(Stop):
        DynamicNetworkLSM(checkpoint_dir=ckpt, **kw).fit(Y)
    monkeypatch.setattr(lsm_mod, 'collect_traces', orig)

    resumed = DynamicNetworkLSM(checkpoint_dir=ckpt, **kw).fit(Y)
    np.testing.assert_allclose(resumed.Xs_, full.Xs_, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(resumed.logps_, full.logps_, rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(resumed.temper_ladder_, full.temper_ladder_,
                               rtol=1e-6)
