"""Sampler-state checkpointing.

The reference has no checkpoint/resume — a killed fit loses everything
(SURVEY.md §5.3-5.4).  Here the full sampler state pytree (PRNG keys,
current draw, adaptive step sizes, MAP trackers) plus every off-loaded
trace chunk is persisted, so a fit can resume exactly where it stopped.

All writes are atomic (temp file + ``os.replace``): a crash mid-write —
precisely the event checkpointing protects against — can never destroy
the previous good copy.

Layout of a checkpoint directory::

    meta.json          {"n_done": int, "n_samples": int, "chunk": int,
                        "fingerprint": str}
    state.npz          flattened sampler-state leaves
    chunk_00000.npz    trace pytree of the first off-loaded chunk
    ...
"""
import glob
import json
import os

import numpy as np
import jax


def _flatten_with_names(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def _atomic_write(path, write_fn):
    """Write via a same-directory temp file and ``os.replace`` so the
    destination is always either the old or the complete new content."""
    tmp = path + '.tmp'
    with open(tmp, 'wb') as f:
        write_fn(f)
    os.replace(tmp, path)


def state_fingerprint(state):
    """Cheap structural fingerprint of a state pytree (leaf shapes +
    dtypes).  Stored in meta.json so a resume against a different sampler
    configuration (n_chains, model dimensions, ...) is refused instead of
    silently splicing incompatible runs."""
    leaves, _ = _flatten_with_names(state)
    parts = ['%s:%s' % (np.shape(np.asarray(leaf)),
                        np.asarray(leaf).dtype) for leaf in leaves]
    return '|'.join(parts)


def save_state(path, state):
    """Persist a sampler-state pytree to ``path`` (.npz), atomically."""
    leaves, _ = _flatten_with_names(state)
    arrays = {('leaf_%05d' % i): np.asarray(leaf)
              for i, leaf in enumerate(leaves)}
    _atomic_write(path, lambda f: np.savez(f, **arrays))


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
    _atomic_write(os.path.join(directory, 'chunk_%05d.npz' % index),
                  lambda f: np.savez(f, **arrays))


def load_traces_chunks(directory, template, n_chunks):
    """Load exactly the first ``n_chunks`` persisted trace chunks (the ones
    the meta accounts for — files beyond that may be stale leftovers from
    an earlier run in the same directory) as pytrees shaped like
    ``template``."""
    _, treedef = _flatten_with_names(template)
    chunks = []
    for idx in range(n_chunks):
        path = os.path.join(directory, 'chunk_%05d.npz' % idx)
        with np.load(path) as data:
            leaves = [data['leaf_%05d' % i] for i in range(len(data.files))]
        chunks.append(jax.tree_util.tree_unflatten(treedef, leaves))
    return chunks


def clear_checkpoint(directory):
    """Remove meta/state/chunk files ahead of a fresh run so stale chunks
    from a previous (incompatible) run cannot be spliced into its traces."""
    for path in ([os.path.join(directory, 'meta.json'),
                  os.path.join(directory, 'state.npz')]
                 + glob.glob(os.path.join(directory, 'chunk_*.npz'))):
        if os.path.exists(path):
            os.remove(path)


def read_meta(directory):
    path = os.path.join(directory, 'meta.json')
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            return json.load(f)
    except (json.JSONDecodeError, OSError):
        return None              # torn legacy meta: treat as no checkpoint


def write_meta(directory, meta):
    _atomic_write(os.path.join(directory, 'meta.json'),
                  lambda f: f.write(json.dumps(meta).encode()))
