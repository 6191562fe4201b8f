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


def hits_nx(edges, max_iter=100, tol=1.0e-8):
    """(hubs, auths) dicts via networkx's documented pure-Python power
    iteration (`_hits_python`, hits_alg.py — nx.hits itself dispatches to
    scipy's svds, not installed here). hits_distributed mirrors this
    schedule float-for-float: max-normalization of both vectors each
    iteration, h-step uses the UNnormalized authority sums, L1 stop on
    the hub vector at raw (unscaled) tol, final sum-normalization."""
    from networkx.algorithms.link_analysis.hits_alg import _hits_python

    g = nx.DiGraph()
    for (s, d) in edges:
        g.add_edge(s, d)
    if g.number_of_nodes() == 0:
        return {}, {}
    return _hits_python(g, max_iter=max_iter, tol=tol, normalized=True)


def hits_fixed_python(edges, iters):
    """(hubs, auths) after EXACTLY `iters` iterations of the _hits_python
    schedule (no convergence break) + final sum-normalization — the
    pure-Python mirror of hits_distributed's tol=0 mode and of the
    unrolled DuckDB contract oracle."""
    g = nx.DiGraph()
    for (s, d) in edges:
        g.add_edge(s, d)
    if g.number_of_nodes() == 0:
        return {}, {}
    h = dict.fromkeys(g, 1.0 / g.number_of_nodes())
    a = dict.fromkeys(g, 0.0)
    for _ in range(iters):
        hlast = h
        h = dict.fromkeys(hlast.keys(), 0.0)
        a = dict.fromkeys(hlast.keys(), 0.0)
        for n_ in h:
            for nbr in g[n_]:
                a[nbr] += hlast[n_]
        for n_ in h:
            for nbr in g[n_]:
                h[n_] += a[nbr]
        s = 1.0 / max(h.values())
        for n_ in h:
            h[n_] *= s
        s = 1.0 / max(a.values())
        for n_ in a:
            a[n_] *= s
    s = 1.0 / sum(a.values())
    for n_ in a:
        a[n_] *= s
    s = 1.0 / sum(h.values())
    for n_ in h:
        h[n_] *= s
    return h, a


def pagerank_weighted_nx(wedges, alpha=0.85, tol=1.0e-6, max_iter=100) -> dict:
    """nx weighted-PageRank oracle: wedges = [(src, dst, w)]; contribution
    rank*w / out-weight-sum (stochastic normalization, _pagerank_python's
    weight= path)."""
    g = nx.DiGraph()
    for (s, d, w) in wedges:
        g.add_edge(s, d, weight=w)
    if g.number_of_nodes() == 0:
        return {}
    return _pagerank_python(g, alpha=alpha, tol=tol, max_iter=max_iter, weight="weight")
