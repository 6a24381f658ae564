"""Label placement for latent-space plots (reference dynetlsm/text_utils.py).

Spring-layout relaxation pushes text labels away from their anchor points
and from each other.
"""
import numpy as np
import networkx as nx


def repel_labels(ax, x, y, labels, k=0.01, fontsize=9, color='k'):
    """Annotate (x, y) points with labels nudged apart by a spring layout
    (reference text_utils.py:5-55)."""
    G = nx.DiGraph()
    data_nodes = []
    init_pos = {}
    for xi, yi, label in zip(x, y, labels):
        data = 'data_{0}'.format(label)
        G.add_node(data)
        G.add_node(label)
        G.add_edge(label, data)
        data_nodes.append(data)
        init_pos[data] = (xi, yi)
        init_pos[label] = (xi, yi)

    pos = nx.spring_layout(G, pos=init_pos, fixed=data_nodes, k=k)

    # undo the spring layout's rescaling so anchors stay at the data
    pos_after = np.vstack([pos[d] for d in data_nodes])
    pos_before = np.vstack([init_pos[d] for d in data_nodes])
    scale, shift_x = np.polyfit(pos_after[:, 0], pos_before[:, 0], 1)
    scale, shift_y = np.polyfit(pos_after[:, 1], pos_before[:, 1], 1)
    shift = np.array([shift_x, shift_y])
    for key, val in pos.items():
        pos[key] = (val * scale) + shift

    for label, data in G.edges():
        ax.annotate(label,
                    xy=pos[data], xycoords='data',
                    xytext=pos[label], textcoords='data',
                    fontsize=fontsize, color=color,
                    arrowprops=dict(arrowstyle='-',
                                    shrinkA=0, shrinkB=0,
                                    connectionstyle='arc3',
                                    color='gray', alpha=0.3))
    return ax
