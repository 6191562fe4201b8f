"""Betweenness / closeness / harmonic kernels vs networkx — allclose
gates (float accumulation order differs from nx's, so 1e-9 not bitwise)."""

import math
import random

import networkx as nx

from deeprank_spark.config import CraftParams
from deeprank_spark.engine import digest as spark_digest
from deeprank_spark.operators.centrality import (
    brandes_betweenness,
    centrality_per_conv,
    closeness_wf,
    harmonic_bfs,
)
from deeprank_spark.oracle import textgraph as otg
from deeprank_spark.transcripts import small_transcripts, transcripts_sdf


def _close(a, b):
    return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)


def _check_graph(edges):
    g = nx.Graph()
    g.add_nodes_from({x for e in edges for x in e})
    g.add_edges_from((a, b) for a, b in edges if a != b)
    nodes = sorted(g.nodes)
    idx = {v: i for i, v in enumerate(nodes)}
    adj = [[] for _ in nodes]
    for a, b in g.edges:
        adj[idx[a]].append(idx[b])
        adj[idx[b]].append(idx[a])
    bc = brandes_betweenness(len(nodes), adj)
    cc = closeness_wf(len(nodes), adj)
    hc = harmonic_bfs(len(nodes), adj)
    exp_bc = nx.betweenness_centrality(g)
    exp_cc = nx.closeness_centrality(g)
    exp_hc = nx.harmonic_centrality(g)
    for v in nodes:
        assert _close(bc[idx[v]], exp_bc[v]), ("bc", v)
        assert _close(cc[idx[v]], exp_cc[v]), ("cc", v)
        assert _close(hc[idx[v]], exp_hc[v]), ("hc", v)


def test_pure_kernels_match_networkx_random():
    for seed in range(12):
        rng = random.Random(seed)
        n = rng.randrange(2, 30)
        m = rng.randrange(1, 4 * n)
        edges = sorted({(rng.randrange(n), rng.randrange(n)) for _ in range(m)})
        _check_graph(edges)  # includes self-loops, disconnected pieces


def test_pure_kernels_fixed_shapes():
    _check_graph([(0, 1), (1, 2), (2, 3), (3, 4)])          # path: mid high bc
    _check_graph([(0, 1), (0, 2), (0, 3), (0, 4)])          # star
    _check_graph([(0, 1), (2, 3), (4, 4)])                  # disconnected + loop
    _check_graph([(0, 0)])                                  # single self-loop
    _check_graph([(0, 1)])                                  # n=2: bc normalizes to 0


def test_centrality_per_conv_matches_networkx(spark):
    pdf = small_transcripts(n_convs=8)
    d = spark_digest(transcripts_sdf(spark, pdf), CraftParams())
    got = {}
    for r in centrality_per_conv(d.gedges).collect():
        got[(r["conv_id"], r["kind"] + r["key"])] = (
            r["betweenness"], r["closeness"], r["harmonic"]
        )
    for conv, grp in pdf.groupby("conv_id"):
        sents = list(grp.sort_values("turn_idx")["text"])
        g0 = otg.nx_graph(otg.digest(sents))
        g = nx.Graph()
        enc = lambda x: ("S" + str(x)) if isinstance(x, int) else ("W" + x)
        g.add_nodes_from(enc(v) for v in g0.nodes)
        g.add_edges_from(
            (enc(a), enc(b)) for a, b in g0.edges() if enc(a) != enc(b)
        )
        exp_bc = nx.betweenness_centrality(g)
        exp_cc = nx.closeness_centrality(g)
        exp_hc = nx.harmonic_centrality(g)
        for node in g.nodes:
            gb, gc, gh = got[(conv, node)]
            assert _close(gb, exp_bc[node]), (conv, node)
            assert _close(gc, exp_cc[node]), (conv, node)
            assert _close(gh, exp_hc[node]), (conv, node)
