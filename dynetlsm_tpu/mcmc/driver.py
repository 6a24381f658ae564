"""Chain drivers: scan over sweeps, vmap over chains, shard over the mesh.

Replaces the reference's Python ``for it in tqdm(range(...))`` fit loops
(lsm.py:474, hdp_lpcm.py:823) with a jitted ``lax.scan`` whose outputs are
the posterior traces.  Chains are embarrassingly parallel: the chain axis is
vmapped and sharded across TPU devices over a 1-D ``chains`` mesh — no
collectives are needed in the sweep body (SURVEY.md §5.8).
"""
import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def chain_mesh(devices=None):
    """1-D mesh over all (or the given) devices with axis name ``chains``."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, ('chains',))


def auto_mesh(n_chains, devices=None):
    """Pick a ``chains`` mesh for ``n_chains`` parallel chains.

    Uses the largest device subset that evenly divides ``n_chains`` — so 4
    chains on an 8-device host run on a 4-device mesh rather than silently
    falling back to one device.  Returns ``None`` when a single device (or a
    single chain) is the right answer.
    """
    devices = list(devices) if devices is not None else jax.devices()
    use = min(n_chains, len(devices))
    while use > 1 and n_chains % use:
        use -= 1
    if use <= 1:
        return None
    return chain_mesh(devices[:use])


def shard_state(state, mesh):
    """Place a chain-batched state pytree on the mesh, sharding the leading
    (chains) axis of every leaf."""
    if mesh is None:
        return state
    sharding = NamedSharding(mesh, P('chains'))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), state)


# ---------------------------------------------------------------------------
# spatial (node-axis) sharding — scaling a fit beyond one chip's HBM
# ---------------------------------------------------------------------------

# state fields carrying a per-node axis, and that axis's position in the
# chain-batched leaf (axis 0 is always the chain axis).  Y / missing_sum are
# (C, T, n, n): sharding their *row* axis matches the Y_fixed layout below.
_NODE_AXIS = {'X': 2, 'z': 2, 'step_X': 2, 'acc_X': 2, 'radii': 1,
              'X_map': 2, 'X_ref': 2, 'radii_map': 1,
              'Y': 2, 'missing_sum': 2, 'ctrl_in': 1, 'ctrl_out': 1}


def spatial_mesh(n_chain_shards, n_node_shards, devices=None):
    """2-D ``('chains', 'nodes')`` mesh: data-parallel over chains and
    model-parallel over the node axis within each chain.

    The node axis is how a fit outgrows one chip: Y rows, latent positions,
    labels, and per-site MH bookkeeping are sharded over ``nodes`` and XLA
    inserts the all-gathers (positions) / psums (loglik reductions) the
    pairwise terms need — riding ICI on a real slice.  (The reference has no
    distributed execution at all; SURVEY.md §5.8.)
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    use = n_chain_shards * n_node_shards
    if use > devices.size:
        raise ValueError('spatial mesh %dx%d needs %d devices, have %d'
                         % (n_chain_shards, n_node_shards, use, devices.size))
    shape = (n_chain_shards, n_node_shards)
    try:
        # topology-aware placement: jax.devices() enumeration order does not
        # follow the physical torus on real slices, and a raw reshape could
        # put a node-shard column on non-neighbouring chips — the per-sweep
        # all-gather/psum axis must ride adjacent ICI links
        from jax.experimental import mesh_utils
        dev_arr = mesh_utils.create_device_mesh(
            shape, devices=list(devices.flat[:use]))
    except Exception:
        dev_arr = devices.flat[:use].reshape(shape)
    return Mesh(dev_arr, ('chains', 'nodes'))


def spatial_auto_mesh(n_chains, n_nodes, node_devices, devices=None):
    """Mesh for ``node_devices``-way node sharding: uses as many device rows
    as divide ``n_chains``.  Requires the node axis to split evenly."""
    if n_nodes % node_devices:
        raise ValueError(
            'node_devices=%d must divide n_nodes=%d (pad the network or '
            'choose a divisor)' % (node_devices, n_nodes))
    devices = list(devices) if devices is not None else jax.devices()
    rows = max(1, len(devices) // node_devices)
    rows = min(rows, n_chains)
    while rows > 1 and n_chains % rows:
        rows -= 1
    return spatial_mesh(rows, node_devices, devices)


def shard_state_spatial(state, mesh):
    """Place a chain-batched state pytree on a ``('chains', 'nodes')`` mesh:
    every leaf shards its chain axis; leaves with a per-node axis
    (:data:`_NODE_AXIS`) shard that axis over ``nodes`` too."""
    if mesh is None:
        return state

    def put(name, x):
        if x is None:
            return None
        spec = [None] * jnp.ndim(x)
        if spec:
            spec[0] = 'chains'
        ax = _NODE_AXIS.get(name)
        if ax is not None and jnp.ndim(x) > ax:
            spec[ax] = 'nodes'
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return type(state)(*[put(f, x) for f, x in zip(state._fields, state)])


def shard_network_spatial(Y, mesh):
    """Place an observed (T, n, n) network (or (T, n) per-node tensor) with
    its row/node axis sharded over ``nodes``, replicated over chains."""
    if mesh is None:
        return Y
    spec = (None, 'nodes') + (None,) * (jnp.ndim(Y) - 2)
    return jax.device_put(Y, NamedSharding(mesh, P(*spec)))


@functools.partial(jax.jit, static_argnums=(1,))
def replicate_state(state0, n_chains, key):
    """Broadcast a single-chain state pytree across a new leading chain axis
    and give each chain its own PRNG key.

    Jitted as one program: the per-leaf broadcasts would otherwise each be
    an eager dispatch (a compile + round-trip per leaf on a remote
    accelerator backend).  NumPy leaves are accepted and land on device.
    """
    keys = jax.random.split(key, n_chains)
    state = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n_chains,) + jnp.shape(x)), state0)
    return state._replace(key=keys)


def make_scan_runner(sweep_fn, trace_fn, thin=1, multi_chain=True,
                     donate=True, chunk=512, state_shardings=None):
    """Compile a runner executing up to ``chunk`` traced iterations.

    ``trace_fn(state) -> pytree`` selects what is recorded each (thinned)
    iteration.  With ``thin > 1`` the body advances ``thin`` sweeps per
    recorded sample (device-side thinning — the reference thins traces on the
    host after the fact, hdp_lpcm.py:1072-1083).

    The iteration count is a *dynamic* argument: the loop writes into a
    fixed ``chunk``-sized trace buffer via ``fori_loop``, so every chunk —
    including the final partial one — reuses one compiled executable
    (a static scan length would trigger a full sweep recompile per distinct
    remainder).

    ``state_shardings`` (a pytree of shardings matching the state) pins the
    output state to the input layout.  Without it GSPMD may return the state
    in whatever partitioning it found internally convenient, and the *next*
    chunk — keyed on its input shardings — would recompile; with a 2-D
    ``('chains', 'nodes')`` mesh it really does move the node axis.
    """
    # the sweep gets a chain-invariant scalar iteration index alongside the
    # per-chain state: chains advance in lockstep, so the cadence-gated
    # blocks (case-control redraws) can branch on a real lax.cond instead of
    # a batched select that would evaluate both branches every sweep
    step = (jax.vmap(sweep_fn, in_axes=(0, None)) if multi_chain
            else sweep_fn)

    def advance(state):
        it0 = state.it[0] if multi_chain else state.it
        if thin == 1:
            return step(state, it0)
        return jax.lax.fori_loop(0, thin, lambda k, s: step(s, it0 + k),
                                 state)

    def run(state, n_samples):
        sample0 = trace_fn(state)
        buf = jax.tree.map(
            lambda x: jnp.zeros((chunk,) + x.shape, x.dtype), sample0)

        def body(i, carry):
            state, buf = carry
            state = advance(state)
            buf = jax.tree.map(
                lambda b, v: jax.lax.dynamic_update_index_in_dim(b, v, i, 0),
                buf, trace_fn(state))
            return state, buf

        return jax.lax.fori_loop(0, n_samples, body, (state, buf))

    kwargs = {}
    if state_shardings is not None:
        kwargs['out_shardings'] = (state_shardings, None)
    if jax.default_backend() == 'tpu':
        from ..ops.vmem_probe import scoped_vmem_options
        opts = scoped_vmem_options()
        if opts:
            # raise the TPU scoped-VMEM limit for the whole sweep program
            # (DYNETLSM_SCOPED_VMEM_KIB): at 64 MiB the Pallas node scan
            # fits ~2x the chains per invocation (docs/scaling.md)
            kwargs['compiler_options'] = opts
    runner = jax.jit(run, donate_argnums=(0,) if donate else (), **kwargs)
    runner.chunk = chunk    # collect_traces validates its chunk against this
    return runner


def state_shardings_of(state):
    """The per-leaf shardings of a placed state pytree (for
    :func:`make_scan_runner`'s ``state_shardings``)."""
    return jax.tree.map(lambda x: x.sharding, state)


def collect_traces(runner, state, n_samples, chunk=512, progress=None,
                   checkpoint_dir=None, mesh=None):
    """Run ``n_samples`` recorded iterations in device chunks, off-loading
    each chunk's traces to host memory (replaces the reference's fully
    preallocated host trace arrays, hdp_lpcm.py:88-131).

    With ``checkpoint_dir`` the sampler state and every trace chunk are
    persisted after each chunk, and an interrupted run resumes from the
    last completed chunk (the reference has no checkpointing at all,
    SURVEY.md §5.3-5.4).  Resume requires the checkpoint's structural
    fingerprint (state leaf shapes/dtypes), ``n_samples``, and ``chunk``
    to match; otherwise the directory's contents are cleared and the run
    starts fresh (stale chunks from an earlier, incompatible run must
    never be spliced into this run's traces).  ``mesh`` re-places a
    resumed multi-chain state on the chains mesh.

    Returns (final_state, traces) where traces is a pytree of NumPy arrays
    with the sample axis leading.
    """
    from ..checkpoint import (
        save_state, load_state, save_traces_chunk, load_traces_chunks,
        read_meta, write_meta, state_fingerprint, clear_checkpoint)

    runner_chunk = getattr(runner, 'chunk', None)
    if runner_chunk is not None and runner_chunk != chunk:
        raise ValueError(
            'collect_traces chunk=%d does not match the runner\'s compiled '
            'trace buffer (%d); out-of-range buffer writes would silently '
            'clamp onto the last row' % (chunk, runner_chunk))

    spatial = mesh is not None and 'nodes' in mesh.axis_names

    def place(st):
        st = jax.tree.map(jnp.asarray, st)
        return shard_state_spatial(st, mesh) if spatial else \
            shard_state(st, mesh)

    if n_samples <= 0:
        # the runner donates its input state; return the (unadvanced)
        # output state, with the trace pytree empty along the sample axis
        state, tmpl = runner(place(state), 0)
        return state, jax.tree.map(lambda y: np.asarray(y)[:0], tmpl)

    chunks = []
    done = 0
    if checkpoint_dir is not None:
        os.makedirs(checkpoint_dir, exist_ok=True)
        meta = read_meta(checkpoint_dir)
        fingerprint = state_fingerprint(state)
        if meta is not None and meta.get('n_samples') == n_samples \
                and meta.get('chunk') == chunk and meta.get('n_done', 0) > 0 \
                and meta.get('fingerprint') == fingerprint:
            state_np = load_state(os.path.join(checkpoint_dir, 'state.npz'),
                                  state)
            # a chunk template: run zero iterations to get trace shapes
            # (the runner donates its input, so place a throwaway copy and
            # re-place the NumPy state afterwards for the sampling loop)
            _, tmpl = runner(place(state_np), 0)
            tmpl = jax.tree.map(np.asarray, tmpl)
            done = meta['n_done']
            chunks = load_traces_chunks(checkpoint_dir, tmpl,
                                        -(-done // chunk))
            state = place(state_np)
        else:
            # incompatible or absent checkpoint: purge leftovers so stale
            # chunk files cannot shadow this run's
            clear_checkpoint(checkpoint_dir)

    while done < n_samples:
        step_n = min(chunk, n_samples - done)
        state, ys = runner(state, step_n)
        host_chunk = jax.tree.map(lambda y: np.asarray(y), ys)
        if checkpoint_dir is not None:
            save_traces_chunk(checkpoint_dir, len(chunks), host_chunk)
            save_state(os.path.join(checkpoint_dir, 'state.npz'), state)
        chunks.append(host_chunk)
        done += step_n
        if checkpoint_dir is not None:
            write_meta(checkpoint_dir,
                       {'n_done': done, 'n_samples': n_samples,
                        'chunk': chunk, 'fingerprint': fingerprint})
        if progress is not None:
            progress(done, n_samples)

    # trim each chunk to the samples it actually holds
    sizes = []
    remaining = n_samples
    for _ in chunks:
        sizes.append(min(chunk, remaining))
        remaining -= sizes[-1]
    trimmed = [jax.tree.map(lambda y, s=s: y[:s], c)
               for c, s in zip(chunks, sizes)]
    traces = jax.tree.map(lambda *xs: np.concatenate(xs, axis=0), *trimmed)
    return state, traces
