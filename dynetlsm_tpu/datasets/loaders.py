"""Real-data loaders (Sampson's monastery, Game of Thrones, Cold-War
military alliances).

Raw data files are shared with the reference distribution
(reference dynetlsm/datasets/raw_data/); the loaders reproduce the same
preprocessing (reference load_monks.py / load_got.py / load_alliances.py).
"""
import glob
import os

import numpy as np

from sklearn.preprocessing import LabelEncoder

__all__ = ['load_monks', 'load_dynamic_monks', 'load_static_monks',
           'load_got', 'load_got_edgelists',
           'network_from_edgelist', 'load_alliances']

RAW = os.path.join(os.path.dirname(__file__), 'raw_data')


def _monk_groups(include_waverers, encode_labels):
    group_file = ('sampson_groups_waverers.txt' if include_waverers
                  else 'sampson_groups.txt')
    with open(os.path.join(RAW, group_file)) as f:
        groups = np.array([line.rstrip('\n') for line in f])
    if encode_labels:
        groups = LabelEncoder().fit_transform(groups)
    return groups


def load_monks(dynamic=True, is_directed=True, include_waverers=False,
               encode_labels=True):
    """Sampson's monastery network (1968): T=3, n=18 liking networks plus
    faction labels and monk names (reference load_monks.py:11-19)."""
    if dynamic:
        return load_dynamic_monks(encode_labels, include_waverers,
                                  is_directed=is_directed)
    return load_static_monks(encode_labels, include_waverers,
                             is_directed=is_directed)


def load_dynamic_monks(encode_labels=True, include_waverers=False,
                       is_directed=True):
    """The three-wave (T=3, n=18) monastery networks, per-wave faction
    labels, and monk names (reference load_monks.py:22-49)."""
    groups = _monk_groups(include_waverers, encode_labels)
    Y = np.stack([np.loadtxt(os.path.join(RAW, 'sampson_%d.npy' % t))
                  for t in range(3)]).astype(np.float64)
    with open(os.path.join(RAW, 'sampson_names.txt')) as f:
        names = np.array([line.rstrip('\n') for line in f])
    if not is_directed:
        Y = ((Y + Y.transpose(0, 2, 1)) > 0).astype(np.float64)
    return Y, np.repeat(groups[None], 3, axis=0), names


def load_static_monks(encode_labels=True, include_waverers=False,
                      is_directed=True):
    """The aggregated single-wave (n=18) monastery network and faction
    labels (reference load_monks.py:52-71)."""
    groups = _monk_groups(include_waverers, encode_labels)
    Y = np.loadtxt(os.path.join(RAW, 'sampson.npy')).astype(np.float64)
    if not is_directed:
        Y = ((Y + Y.T) > 0).astype(np.float64)
    return Y, groups


def network_from_edgelist(edgelist, n_nodes):
    """Symmetric binary adjacency from an (n_edges, 2) integer edge list
    (reference load_got.py:16-25)."""
    Y = np.zeros((n_nodes, n_nodes))
    Y[edgelist[:, 0], edgelist[:, 1]] = 1.0
    return ((Y + Y.T) > 0).astype(np.float64)


def load_got_edgelists():
    """Per-season GoT co-occurrence edge lists as one dataframe with
    summed weights (reference load_got.py:28-42)."""
    import pandas as pd

    frames = []
    for path in sorted(glob.glob(os.path.join(RAW, 'got', 'got-s*-edges.csv'))):
        df = pd.read_csv(path, names=['source', 'target', 'weight', 'season'],
                         skiprows=1)
        frames.append(df)
    data = pd.concat(frames)
    return data.groupby(['source', 'target', 'season'],
                        as_index=False).agg({'weight': 'sum'})


def load_got(seasons=None, weight_min=None):
    """Game of Thrones co-occurrence networks, one snapshot per season
    (reference load_got.py:45-67).  Returns (Y, character names)."""
    data = load_got_edgelists()

    if seasons is not None:
        data = data[data['season'].isin(np.atleast_1d(seasons))]
    if weight_min is not None:
        data = data[data['weight'] >= weight_min]

    encoder = LabelEncoder().fit(data[['source', 'target']].values.ravel())
    src = encoder.transform(data['source'])
    tgt = encoder.transform(data['target'])
    season_vals = np.sort(data['season'].unique())
    n = encoder.classes_.shape[0]

    Y = np.zeros((season_vals.shape[0], n, n))
    for t, s in enumerate(season_vals):
        mask = (data['season'] == s).to_numpy()
        edges = np.stack([src[mask], tgt[mask]], axis=1)
        Y[t] = network_from_edgelist(edges, n)
    return Y, encoder.classes_


def load_alliances(min_degree=1, directed=False, remove_periphery=True):
    """Cold-War military alliances, 1950-1975 in 5-year snapshots
    (reference load_alliances.py:11-53).  Returns (Y, country names)."""
    import pandas as pd

    base = os.path.join(RAW, 'military_alliances')
    if directed:
        raise NotImplementedError(
            'directed alliance networks are not shipped with the raw data')
    years = list(range(1950, 1980, 5))
    Y = np.stack([np.loadtxt(os.path.join(base, 'network_%d.npy' % y))
                  for y in years])
    Y = (Y > 0).astype(np.float64)
    Y = (((Y + Y.transpose(0, 2, 1)) / 2.0) > 0).astype(np.float64)

    if remove_periphery:
        import networkx as nx
        for t in range(Y.shape[0]):
            G = nx.from_numpy_array(Y[t])
            core = np.asarray(list(nx.core_number(G).values()))
            periphery = np.where(core <= 2)[0]
            Y[t, periphery] = 0.0
            Y[t, :, periphery] = 0.0

    active = np.where(
        (Y.sum(axis=(0, 1)) + Y.sum(axis=(0, 2))) >= min_degree)[0]
    Y = np.ascontiguousarray(Y[:, active][:, :, active])

    names = pd.read_csv(os.path.join(base, 'names.csv')).values.ravel()[active]
    return Y, names
