"""Topology visualisation (reference visualize_tensornetwork,
tensor/utils.py:7-110): render the node graph with networkx/matplotlib when
available, else an ASCII fallback listing columns and edges."""
from __future__ import annotations

from typing import Optional

from ..core.topology import Topology, PARAM, INPUT


def visualize_topology(topology: Topology, path: Optional[str] = None):
    """Draw (or print) the network graph. Returns the figure or the ASCII
    string."""
    edges = []
    for aid, carriers in topology.axis_nodes.items():
        if aid == topology.sample_axis or len(carriers) < 2:
            continue
        for a, b in zip(carriers[:-1], carriers[1:]):
            edges.append((a, b, aid))
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import networkx as nx
    except Exception:
        lines = ["topology:"]
        for ci, col in enumerate(topology.columns):
            names = ", ".join(
                f"{topology.nodes[n].name}({topology.nodes[n].kind})" for n in col)
            lines.append(f"  column {ci}: {names}")
        for a, b, aid in edges:
            lines.append(f"  {topology.nodes[a].name} --{aid}-- "
                         f"{topology.nodes[b].name}")
        text = "\n".join(lines)
        if path:
            with open(path, "w") as f:
                f.write(text)
        return text

    g = nx.Graph()
    colors = []
    pos = {}
    for ni, spec in enumerate(topology.nodes):
        g.add_node(spec.name)
        colors.append({PARAM: "#4a90d9", INPUT: "#7bc67b"}.get(spec.kind,
                                                               "#c9c9c9"))
        ci = topology.col_of[ni]
        row = topology.columns[ci].index(ni)
        pos[spec.name] = (ci, -row)
    for a, b, _ in edges:
        g.add_edge(topology.nodes[a].name, topology.nodes[b].name)
    fig, ax = plt.subplots(figsize=(1.5 * len(topology.columns) + 2, 4))
    nx.draw(g, pos=pos, ax=ax, with_labels=True, node_color=colors,
            node_size=900, font_size=8)
    if path:
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
    return fig
