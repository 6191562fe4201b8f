"""Graph-kernel oracles (networkx + pure Python) for differential tests.

The Spark kernels must match:
- PageRank: networkx semantics (d=0.85, power iteration, dangling mass to the
  personalization vector, L1 stop err < N*tol) to allclose 1e-6
  (reference call site deepRank.py:535; BASELINE.json north_rule).
- Connected components: exact (undirected projection).
- Label propagation: exact vs this synchronous min-tie-break spec.
- Triangle count: exact (undirected simple graph).
"""

from __future__ import annotations

import networkx as nx
from networkx.algorithms.link_analysis.pagerank_alg import _pagerank_python


def pagerank_nx(edges, pers=None, alpha=0.85, tol=1.0e-6, max_iter=100) -> dict:
    # nx.pagerank dispatches to scipy (not installed here); the documented
    # pure-Python implementation has identical published semantics.
    g = nx.DiGraph()
    for (s, d) in edges:
        g.add_edge(s, d)
    if g.number_of_nodes() == 0:
        return {}
    if pers is not None:
        pers = {k: v for k, v in pers.items() if k in g}
        if sum(pers.values()) <= 0:
            pers = None
    return _pagerank_python(
        g, alpha=alpha, personalization=pers, tol=tol, max_iter=max_iter
    )


def components_nx(edges, nodes=()) -> dict:
    """node -> component id (= min node key in component, matching hash-min)."""
    g = nx.Graph()
    g.add_nodes_from(nodes)
    g.add_edges_from(edges)
    out = {}
    for comp in nx.connected_components(g):
        label = min(comp)
        for n in comp:
            out[n] = label
    return out


def scc_nx(edges, nodes=()) -> dict:
    """node -> SCC id (= min node key in the strongly connected component),
    matching the reference's nx.strongly_connected_components gate
    (deepRank.py:398-406)."""
    g = nx.DiGraph()
    g.add_nodes_from(nodes)
    g.add_edges_from(edges)
    out = {}
    for comp in nx.strongly_connected_components(g):
        label = min(comp)
        for n in comp:
            out[n] = label
    return out


def lpa_sync(edges, nodes=(), max_iter: int = 20) -> dict:
    """Synchronous label propagation, deterministic spec:

    label'(v) = the smallest label among those with maximal count over
    N(v) (undirected, previous iteration's labels); isolated vertices keep
    their own label. Stops at fixpoint or max_iter.
    """
    adj: dict = {}
    for (a, b) in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for n in nodes:
        adj.setdefault(n, set())
    labels = {n: n for n in adj}
    for _ in range(max_iter):
        new = {}
        for v, nbrs in adj.items():
            if not nbrs:
                new[v] = labels[v]
                continue
            counts: dict = {}
            for u in nbrs:
                l = labels[u]
                counts[l] = counts.get(l, 0) + 1
            best = max(counts.values())
            new[v] = min(l for l, c in counts.items() if c == best)
        if new == labels:
            break
        labels = new
    return labels


def triangles_nx(edges, nodes=()) -> dict:
    g = nx.Graph()
    g.add_nodes_from(nodes)
    for (a, b) in edges:
        if a != b:
            g.add_edge(a, b)
    return nx.triangles(g)
