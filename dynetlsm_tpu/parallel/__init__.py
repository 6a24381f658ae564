"""Chain-parallel execution utilities.

The reference is single-core with no parallel execution at all
(SURVEY.md §2 checklist); here independent MCMC chains are the first-class
parallelism axis: vmapped on one chip and sharded over a 1-D ``chains``
mesh across chips (ICI) / hosts (DCN) with zero collectives in the sweep
body (SURVEY.md §5.8).
"""
from ..mcmc.driver import (
    chain_mesh, shard_state, replicate_state, make_scan_runner,
    collect_traces)

__all__ = ['chain_mesh', 'shard_state', 'replicate_state',
           'make_scan_runner', 'collect_traces']
