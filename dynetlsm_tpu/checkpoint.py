"""Sampler-state checkpointing.

The reference has no checkpoint/resume — a killed fit loses everything
(SURVEY.md §5.3-5.4).  Here the full sampler state pytree (PRNG keys,
current draw, adaptive step sizes, MAP trackers) plus every off-loaded
trace chunk is persisted, so a fit can resume exactly where it stopped.

Layout of a checkpoint directory::

    meta.json          {"n_done": int, "n_samples": int}
    state.npz          flattened sampler-state leaves
    chunk_00000.npz    trace pytree of the first off-loaded chunk
    ...
"""
import json
import os

import numpy as np
import jax


def _flatten_with_names(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def save_state(path, state):
    """Persist a sampler-state pytree to ``path`` (.npz)."""
    leaves, _ = _flatten_with_names(state)
    arrays = {('leaf_%05d' % i): np.asarray(leaf)
              for i, leaf in enumerate(leaves)}
    with open(path, 'wb') as f:
        np.savez(f, **arrays)


def load_state(path, template):
    """Rebuild a sampler-state pytree from ``path`` using ``template`` for
    the tree structure (including which optional fields are None)."""
    _, treedef = _flatten_with_names(template)
    with np.load(path) as data:
        leaves = [data['leaf_%05d' % i] for i in range(len(data.files))]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_traces_chunk(directory, index, traces):
    leaves, _ = _flatten_with_names(traces)
    arrays = {('leaf_%05d' % i): np.asarray(leaf)
              for i, leaf in enumerate(leaves)}
    with open(os.path.join(directory, 'chunk_%05d.npz' % index), 'wb') as f:
        np.savez(f, **arrays)


def load_traces_chunks(directory, template):
    """Load all persisted trace chunks (in order) as pytrees shaped like
    ``template``."""
    _, treedef = _flatten_with_names(template)
    chunks = []
    idx = 0
    while True:
        path = os.path.join(directory, 'chunk_%05d.npz' % idx)
        if not os.path.exists(path):
            break
        with np.load(path) as data:
            leaves = [data['leaf_%05d' % i] for i in range(len(data.files))]
        chunks.append(jax.tree_util.tree_unflatten(treedef, leaves))
        idx += 1
    return chunks


def read_meta(directory):
    path = os.path.join(directory, 'meta.json')
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def write_meta(directory, meta):
    with open(os.path.join(directory, 'meta.json'), 'w') as f:
        json.dump(meta, f)
