"""Shared estimator machinery for the three model classes."""
import numpy as np
import jax
import jax.numpy as jnp

from ..array_utils import triu_indices_from_3d, nondiag_indices_from_3d
from ..config import DTYPE


def validate_network(Y, is_directed, copy=True):
    """Validate the dynamic adjacency tensor and locate missing dyads.

    Returns (Y float64 array, nan_mask over dyad vector, miss_mask (T,n,n)
    boolean tensor, sample_missing flag).  Missing dyads are coded -1
    (NaNs are converted), mirroring reference lsm.py:341-360.
    """
    # NumPy 2 made copy=False mean "never copy" (raising when a dtype cast
    # is needed, e.g. int 0/1 adjacencies); copy=None restores the
    # intended copy-only-if-needed semantics
    Y = np.array(Y, dtype=np.float64, copy=True if copy else None)
    if Y.ndim != 3 or Y.shape[1] != Y.shape[2]:
        raise ValueError('Y must have shape (n_time_steps, n_nodes, n_nodes), '
                         'got %r' % (Y.shape,))
    Y[np.isnan(Y)] = -1.0

    if is_directed:
        indices = nondiag_indices_from_3d(Y)
    else:
        indices = triu_indices_from_3d(Y, k=1)
    nan_mask = Y[indices] == -1

    miss_mask = Y == -1
    if not is_directed:
        miss_mask |= np.swapaxes(miss_mask, 1, 2)
    for t in range(Y.shape[0]):
        np.fill_diagonal(miss_mask[t], False)

    return Y, nan_mask, miss_mask, bool(nan_mask.any())


def to_device_f32(x):
    return jax.numpy.asarray(np.asarray(x, dtype=DTYPE))


def resolve_fit_mesh(n_chains, n_nodes, node_devices, devices,
                     latent_update, n_temps=1):
    """Pick the fit mesh.

    Default: 1-D ``chains`` mesh (data-parallel chains, no collectives).
    With ``node_devices > 1``: 2-D ``('chains', 'nodes')`` mesh sharding the
    node axis inside each chain — for networks whose (T, n, n) tensors
    outgrow one chip.  Returns ``(mesh or None, spatial flag)``.

    Validated here — before any expensive initialisation work — because
    both knobs are constructor state: ``n_temps > 1`` (parallel
    tempering) cannot combine with ``node_devices > 1``; the
    replica-exchange gather permutes the chain axis, which conflicts
    with the 2-D spatial mesh.
    """
    from ..mcmc.driver import auto_mesh, spatial_auto_mesh
    if node_devices and node_devices > 1:
        if n_temps and int(n_temps) > 1:
            raise ValueError(
                'n_temps > 1 (parallel tempering) is not supported '
                'together with node_devices > 1: the replica-exchange '
                'gather permutes the chain axis, which conflicts with '
                'the 2-D spatial mesh')
        if latent_update not in ('parallel', 'mala'):
            raise ValueError(
                "node_devices > 1 shards the node axis across devices; the "
                "sequential exact node scan cannot be partitioned — "
                "construct the model with latent_update='parallel' or "
                "'mala' (both are fused dense passes GSPMD can shard)")
        return (spatial_auto_mesh(n_chains, n_nodes, node_devices, devices),
                True)
    return auto_mesh(n_chains, devices), False


def setup_tempering(sweep, cfg, Y_fixed_dev, n_chains, n_temps, beta_min,
                    swap_every, state):
    """Attach per-slot inverse-temperature ladders and wrap the sweep for
    replica exchange (``n_temps > 1``).

    ``state`` must already be replicated to ``n_chains * n_temps`` slots;
    each consecutive block of ``n_temps`` slots becomes one ladder (cold
    chain first).  Returns ``(step_fn, multi_chain, state)`` for
    :func:`dynetlsm_tpu.mcmc.driver.make_scan_runner` — the PT step
    handles the chain axis itself, so ``multi_chain=False``.
    """
    if n_temps is None or int(n_temps) <= 1:
        return sweep, True, state
    from ..mcmc.tempering import temper_ladder, make_pt_step
    betas = temper_ladder(int(n_temps), float(beta_min),
                          n_ladders=n_chains)
    state = state._replace(temper=jnp.asarray(betas),
                           acc_swap=jnp.zeros(betas.shape[0], DTYPE))
    step = make_pt_step(sweep, cfg, Y_fixed_dev, int(n_temps),
                        swap_every=int(swap_every),
                        adapt_until=int(cfg.tune or 0),
                        adapt_interval=int(cfg.tune_interval))
    return step, False, state


def cold_slot_trace_fn(trace_fn, n_temps):
    """Record traces from the cold (beta = 1) slots only: slot 0 of each
    ladder block.  Applied INSIDE the scan runner so hot-slot samples are
    never buffered on device nor copied to host (with n_temps = 10 that
    is 10x less trace memory and transfer)."""
    if n_temps is None or int(n_temps) <= 1:
        return trace_fn
    k = int(n_temps)

    def cold(state):
        return trace_fn(jax.tree.map(lambda v: v[::k], state))

    return cold


def strip_hot_slots(state, n_temps):
    """Keep only the cold (beta = 1) slots of the final state.  Posterior
    attributes, MAP selection, and missing-dyad averages must come from
    the cold chains only (traces are already cold-only via
    :func:`cold_slot_trace_fn`).

    Returns ``(cold_state, ladder)`` where ``ladder`` is the final
    (possibly tune-adapted) full inverse-temperature array, or None for
    untempered runs.
    """
    if n_temps is None or int(n_temps) <= 1:
        return state, None
    k = int(n_temps)
    ladder = (np.asarray(state.temper) if state.temper is not None
              else None)
    return jax.tree.map(lambda v: v[::k], state), ladder


def chain_traces_to_numpy(traces, n_chains):
    """Reorder scan traces from (samples, chains, ...) to reference layout.

    Single chain -> (samples, ...) exactly like the reference's trace
    attributes; multiple chains -> (chains, samples, ...).
    """
    out = {}
    for name, arr in traces.items():
        arr = np.asarray(arr)
        if n_chains == 1:
            out[name] = arr[:, 0]
        else:
            out[name] = np.swapaxes(arr, 0, 1)
    return out


def build_case_control(cfg, Y_dev, Y_host, rng, miss_mask=None):
    """Prepare the case-control structures when cfg.n_control is set.

    Goes beyond the reference's directed-only support (lsm.py:425-427): the
    undirected path uses the row-symmetric edge lists with the
    static_network_fast.pyx:47-94 estimator, and missing dyads are handled
    by rebuilding the edge lists in-device every sweep with a static
    degree bound (``max_deg``) instead of the reference's host-side
    MissingDirectedCaseControlSampler.

    Returns (cc_static dict of device arrays or None,
             (ctrl_in, ctrl_out) initial control draws or None).
    """
    from ..ops.case_control import (
        build_edge_lists, color_conflict_graph, sample_controls_colored,
        max_degree_bound)

    if cfg.n_control is None:
        return None, None

    lists = build_edge_lists(Y_host)
    if cfg.sample_missing:
        # edge structure drifts as missing dyads are resampled — the sweep
        # rebuilds the padded lists in-device with this static safe bound
        cc_static = {'max_deg': max_degree_bound(Y_host, miss_mask)}
    else:
        cc_static = {k: jnp.asarray(v) for k, v in lists.items()}
    # color classes for the exact chromatic scan (mcmc/latent
    # cc_colored_scan): conflicts = observed edges + missing dyads (which
    # resampling can turn into edges)
    colors, groups = color_conflict_graph(
        lists, Y_host.shape[1], miss_mask=miss_mask,
        seed=rng.randint(0, 2 ** 31 - 1))
    cc_static['colors'] = jnp.asarray(colors)
    cc_static['color_groups'] = jnp.asarray(groups)
    # chain-invariant control key: every chain shares one control set per
    # redraw window (one surrogate posterior across chains, shared-index
    # gathers — see mcmc.sweeps._refresh_controls); the initial draw uses
    # the same key the first sweep's redraw will fold at it=0
    cc_static['ctrl_key'] = jax.random.PRNGKey(rng.randint(0, 2 ** 31 - 1))
    ctrl = sample_controls_colored(
        jax.random.fold_in(cc_static['ctrl_key'], 0), cc_static['colors'],
        Y_host.shape[1], cfg.n_control, directed=cfg.is_directed)
    return cc_static, ctrl


def init_cc_dict(cfg, Y_dev, cc_static, ctrl0):
    """Case-control structures for the initial-sample logp, mirroring the
    in-sweep ``_cc_structures`` so the stored ``logps_`` trace uses one
    estimator throughout (the reference's ``logp`` also switches to the
    case-control approximation when the sampler is active, lsm.py:581-591).

    Returns None when case-control is off.
    """
    if cc_static is None:
        return None
    from ..mcmc.sweeps import build_cc_dict
    return build_cc_dict(cfg, Y_dev, cc_static, ctrl0[0], ctrl0[1])


def resolve_n_control(n_control, n_nodes):
    """Integer control-set size from an int or node fraction
    (reference case_control_likelihood.py:40-43)."""
    if n_control is None:
        return None
    if isinstance(n_control, (int, np.integer)):
        return int(n_control)
    return int(n_control * n_nodes)


def total_iterations(n_iter, tune, burn):
    """Total stored samples = n_iter + tune + burn (reference semantics:
    lsm.py:362-368 folds tune/burn into n_iter)."""
    total = n_iter
    if tune:
        total += tune
    if burn:
        total += burn
    return total
