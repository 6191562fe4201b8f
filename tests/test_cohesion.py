"""Clustering coefficient / k-core / core numbers vs networkx — exact gates."""

import random

import networkx as nx
import pytest

from deeprank_spark.operators.cohesion import (
    clustering_coefficient,
    core_numbers_distributed,
    kcore_distributed,
)


def _gnm(n, m, seed):
    rng = random.Random(seed)
    edges = set()
    while len(edges) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    return sorted(edges)


def _clique_tail(k, tail):
    """k-clique with a path of `tail` vertices hanging off vertex 0."""
    edges = [(i, j) for i in range(k) for j in range(i + 1, k)]
    prev = 0
    for t in range(tail):
        edges.append((prev, k + t))
        prev = k + t
    return edges


FIXTURES = {
    "gnm": _gnm(60, 150, seed=7),
    "clique_tail": _clique_tail(6, 5),
    "two_tri": [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5), (3, 5)],
}


def _sdf(spark, edges):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "src long, dst long"
    )


@pytest.mark.parametrize("name", sorted(FIXTURES))
def test_clustering_coefficient(spark, name):
    edges = FIXTURES[name]
    g = nx.Graph(edges)
    exp = nx.clustering(g)
    got = {
        r["id"]: (r["degree"], r["lcc"])
        for r in clustering_coefficient(_sdf(spark, edges)).collect()
    }
    assert set(got) == set(g.nodes())
    for v in g.nodes():
        assert got[v][0] == g.degree(v), v
        assert abs(got[v][1] - exp[v]) < 1e-12, (v, got[v][1], exp[v])


@pytest.mark.parametrize("name", sorted(FIXTURES))
@pytest.mark.parametrize("k", [2, 3])
def test_kcore(spark, name, k):
    edges = FIXTURES[name]
    g = nx.Graph(edges)
    core = nx.k_core(g, k)
    got = {
        r["id"]: r["core_deg"]
        for r in kcore_distributed(_sdf(spark, edges), k=k).collect()
    }
    assert set(got) == set(core.nodes())
    for v in core.nodes():
        assert got[v] == core.degree(v), v


def test_kcore_fixed_rounds_reaches_fixed_point(spark):
    edges = FIXTURES["clique_tail"]  # tail peels one vertex per round
    g = nx.Graph(edges)
    core = nx.k_core(g, 2)
    got = {
        r["id"]: r["core_deg"]
        for r in kcore_distributed(_sdf(spark, edges), k=2, rounds=8).collect()
    }
    assert set(got) == set(core.nodes())


@pytest.mark.parametrize("name", sorted(FIXTURES))
def test_core_numbers(spark, name):
    edges = FIXTURES[name]
    g = nx.Graph(edges)
    exp = nx.core_number(g)
    got = {
        r["id"]: r["core"]
        for r in core_numbers_distributed(_sdf(spark, edges)).collect()
    }
    assert got == {v: c for v, c in exp.items()}


def test_core_numbers_fixed_rounds(spark):
    edges = FIXTURES["gnm"]
    g = nx.Graph(edges)
    exp = nx.core_number(g)
    got = {
        r["id"]: r["core"]
        for r in core_numbers_distributed(
            _sdf(spark, edges), rounds=12
        ).collect()
    }
    assert got == {v: c for v, c in exp.items()}
