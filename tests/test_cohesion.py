"""Clustering coefficient / k-core / core numbers vs networkx — exact gates."""

import random

import networkx as nx
import pytest

from deeprank_spark.operators.cohesion import (
    clustering_coefficient,
    core_numbers_distributed,
    degree_assortativity,
    kcore_distributed,
    modularity,
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


@pytest.mark.parametrize("name", sorted(FIXTURES))
def test_degree_assortativity(spark, name):
    edges = FIXTURES[name]
    g = nx.Graph(edges)
    exp = nx.degree_assortativity_coefficient(g)
    row = degree_assortativity(_sdf(spark, edges)).collect()[0]
    assert row["n_edges"] == g.number_of_edges()
    assert abs(row["assortativity"] - exp) < 1e-9, (row["assortativity"], exp)


@pytest.mark.parametrize("name", sorted(FIXTURES))
def test_modularity_vs_networkx(spark, name):
    edges = FIXTURES[name]
    g = nx.Graph(edges)
    # deterministic 3-way partition by id
    parts = {v: v % 3 for v in g.nodes()}
    comms = [{v for v in g if parts[v] == c} for c in range(3)]
    comms = [c for c in comms if c]
    exp = nx.community.modularity(g, comms)
    labels = _sdf(spark, edges).sparkSession.createDataFrame(
        [(int(v), int(c)) for v, c in parts.items()], "id long, label long"
    )
    row = modularity(_sdf(spark, edges), labels).collect()[0]
    assert row["n_communities"] == len(comms)
    assert abs(row["modularity"] - exp) < 1e-12, (row["modularity"], exp)


def test_modularity_singleton_fallback(spark):
    edges = FIXTURES["two_tri"]
    g = nx.Graph(edges)
    # label only vertices 0-2 as one community; the rest become singletons
    labeled = {0: 9, 1: 9, 2: 9}
    comms = [{0, 1, 2}] + [{v} for v in g.nodes() if v not in labeled]
    exp = nx.community.modularity(g, comms)
    spark_df = _sdf(spark, edges)
    labels = spark_df.sparkSession.createDataFrame(
        [(v, c) for v, c in labeled.items()], "id long, label long"
    )
    row = modularity(spark_df, labels).collect()[0]
    assert row["n_communities"] == len(comms)
    assert abs(row["modularity"] - exp) < 1e-12


@pytest.mark.parametrize("name", sorted(FIXTURES))
def test_link_prediction(spark, name):
    from deeprank_spark.operators.linkpred import (
        link_prediction_scores,
        two_hop_candidates,
    )

    edges = FIXTURES[name]
    g = nx.Graph(edges)
    e = _sdf(spark, edges)
    cand_rows = two_hop_candidates(e).collect()
    exp_cand = {
        (min(u, v), max(u, v))
        for u in g
        for v in g
        if u < v and not g.has_edge(u, v) and set(g[u]) & set(g[v])
    }
    assert {(r["u"], r["v"]) for r in cand_rows} == exp_cand

    cand = e.sparkSession.createDataFrame(
        sorted(exp_cand), "u long, v long"
    )
    got = {
        (r["u"], r["v"]): (r["common_neighbors"], r["jaccard"], r["adamic_adar"])
        for r in link_prediction_scores(e, cand).collect()
    }
    jac = {(u, v): j for u, v, j in nx.jaccard_coefficient(g, sorted(exp_cand))}
    aa = {(u, v): a for u, v, a in nx.adamic_adar_index(g, sorted(exp_cand))}
    assert set(got) == exp_cand
    for p in exp_cand:
        cn = len(set(g[p[0]]) & set(g[p[1]]))
        assert got[p][0] == cn, p
        assert abs(got[p][1] - jac[p]) < 1e-12, p
        assert abs(got[p][2] - aa[p]) < 1e-9, p


def test_link_prediction_zero_overlap_pair(spark):
    from deeprank_spark.operators.linkpred import link_prediction_scores

    edges = FIXTURES["two_tri"]
    e = _sdf(spark, edges)
    cand = e.sparkSession.createDataFrame([(0, 5)], "u long, v long")
    row = link_prediction_scores(e, cand).collect()[0]
    assert (row["common_neighbors"], row["jaccard"], row["adamic_adar"]) == (
        0,
        0.0,
        0.0,
    )


@pytest.mark.parametrize("name", sorted(FIXTURES))
def test_graph_summary(spark, name):
    from deeprank_spark.operators.cohesion import graph_summary

    edges = FIXTURES[name]
    g = nx.Graph(edges)
    row = graph_summary(_sdf(spark, edges)).collect()[0]
    degs = [d for _, d in g.degree()]
    assert row["n_vertices"] == g.number_of_nodes()
    assert row["n_edges"] == g.number_of_edges()
    assert abs(row["density"] - nx.density(g)) < 1e-12
    assert row["max_degree"] == max(degs)
    assert abs(row["avg_degree"] - sum(degs) / len(degs)) < 1e-12


def test_butterflies_bipartite(spark):
    from itertools import combinations

    from deeprank_spark.operators.cohesion import butterflies_bipartite

    rng = random.Random(11)
    edges = sorted({(rng.randrange(12), 100 + rng.randrange(9)) for _ in range(60)})
    # pure-python oracle: per right-pair shared-left counts -> C(k,2)
    left_of = {}
    for u, v in edges:
        left_of.setdefault(v, set()).add(u)
    exp = {v: 0 for v in left_of}
    for v1, v2 in combinations(sorted(left_of), 2):
        k = len(left_of[v1] & left_of[v2])
        c = k * (k - 1) // 2
        exp[v1] += c
        exp[v2] += c
    sdf = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["id"]: r["butterflies"]
        for r in butterflies_bipartite(sdf).collect()
    }
    assert got == exp
    assert sum(exp.values()) > 0  # fixture actually contains butterflies


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


def test_two_hop_candidates_center_cap(spark):
    """Hub center fan-out is bounded by max_center_degree (deterministic
    smallest-id neighbors); None keeps the exact set."""
    from deeprank_spark.operators.linkpred import two_hop_candidates

    # star: hub 0 adjacent to 1..20 (leaves non-adjacent, share hub)
    edges = [(0, i) for i in range(1, 21)]
    e = spark.createDataFrame(edges, "src long, dst long")
    exact = two_hop_candidates(e, max_center_degree=None).collect()
    assert len(exact) == 20 * 19 // 2
    capped = two_hop_candidates(e, max_center_degree=5).collect()
    # cap keeps neighbors 1..5 of the hub -> C(5,2) pairs
    assert sorted((r["u"], r["v"]) for r in capped) == [
        (u, v) for u in range(1, 6) for v in range(u + 1, 6)
    ]
    # under-cap graphs are exact through the default path
    dflt = two_hop_candidates(e).collect()
    assert len(dflt) == len(exact)


def test_kcore_deep_peeling_chain(spark):
    """Deep peel: a 60-vertex path ending in a triangle peels exactly one
    path vertex per round under k=2 (~60 rounds), exercising the periodic
    parquet lineage reset; result = the triangle (nx.k_core)."""
    from deeprank_spark.operators.cohesion import kcore_distributed

    n = 60
    edges = [(i, i + 1) for i in range(n - 1)] + [(n - 1, n), (n, n + 1), (n + 1, n - 1)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["core_deg"] for r in kcore_distributed(e, k=2, max_rounds=200).collect()}
    assert got == {n - 1: 2, n: 2, n + 1: 2}


def test_modularity_fallback_label_collision(spark):
    """An unlabeled vertex whose id equals another community's LABEL must
    stay a singleton (tagged fallback keys), not merge into that
    community."""
    import networkx as nx

    # community labeled 5 on {1,2,3}; vertices 5,6 UNLABELED
    edges = [(1, 2), (2, 3), (3, 1), (5, 6)]
    labels = spark.createDataFrame(
        [(1, 5), (2, 5), (3, 5)], "id long, label long"
    )
    g = nx.Graph(edges)
    exp = nx.community.modularity(g, [{1, 2, 3}, {5}, {6}])
    row = modularity(_sdf(spark, edges), labels).collect()[0]
    assert row["n_communities"] == 3
    assert abs(row["modularity"] - exp) < 1e-12, (row["modularity"], exp)


def test_ktruss_matches_networkx(spark):
    import networkx as nx

    from deeprank_spark.operators.cohesion import ktruss_distributed

    for seed, k in [(3, 3), (4, 4), (5, 5)]:
        rng = random.Random(seed)
        n = 30
        edges = sorted({(rng.randrange(n), rng.randrange(n)) for _ in range(150)})
        g = nx.Graph((a, b) for a, b in edges if a != b)
        exp = {(min(a, b), max(a, b)) for a, b in nx.k_truss(g, k).edges}
        e = spark.createDataFrame(edges, "src long, dst long")
        got = {(r["u"], r["v"]) for r in ktruss_distributed(e, k).collect()}
        assert got == exp, (seed, k)


def test_ktruss_support_and_clique(spark):
    import itertools

    from deeprank_spark.operators.cohesion import ktruss_distributed

    # K5 + a pendant path: 5-truss = the K5 exactly, every edge support 3
    edges = list(itertools.combinations(range(5), 2)) + [(4, 10), (10, 11)]
    e = spark.createDataFrame(edges, "src long, dst long")
    rows = ktruss_distributed(e, 5).collect()
    assert {(r["u"], r["v"]) for r in rows} == set(
        itertools.combinations(range(5), 2)
    )
    assert all(r["support"] == 3 for r in rows)
    # k=3 keeps only triangle-supported edges: the pendant path drops
    rows3 = {(r["u"], r["v"]) for r in ktruss_distributed(e, 3).collect()}
    assert (4, 10) not in rows3 and (10, 11) not in rows3


def test_ktruss_validates_k(spark):
    import pytest as _pytest

    from deeprank_spark.operators.cohesion import ktruss_distributed

    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    with _pytest.raises(ValueError, match="k must be >= 2"):
        ktruss_distributed(e, 1)


def test_conductance_matches_networkx(spark):
    import networkx as nx

    from deeprank_spark.operators.cohesion import conductance
    from deeprank_spark.operators.labelprop import lpa_distributed

    rng = random.Random(9)
    edges = sorted({(rng.randrange(24), rng.randrange(24)) for _ in range(70)})
    e = spark.createDataFrame(edges, "src long, dst long")
    labels = lpa_distributed(e, max_iter=10)
    got = {
        r["label"]: (r["n_vertices"], r["cut"], r["volume"], r["conductance"])
        for r in conductance(e, labels).collect()
    }
    g = nx.Graph((a, b) for a, b in edges if a != b)
    lab = {r["id"]: r["label"] for r in labels.collect()}
    comms = {}
    for v, l in lab.items():
        comms.setdefault(l, set()).add(v)
    for l, S in comms.items():
        nv, cut, vol, phi = got[l]
        assert nv == len(S)
        exp_cut = nx.cut_size(g, S)
        exp_vol = nx.volume(g, S)
        assert (cut, vol) == (exp_cut, exp_vol), l
        denom = min(exp_vol, 2 * g.number_of_edges() - exp_vol)
        if denom > 0:
            assert abs(phi - exp_cut / denom) < 1e-12, l
        else:
            assert phi is None


def test_conductance_rejects_unlabeled(spark):
    import pytest as _pytest

    from deeprank_spark.operators.cohesion import conductance

    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    labels = spark.createDataFrame([(1, 1), (2, 1)], "id long, label long")
    # match the MESSAGE, not the wrapper: when the labels side broadcasts,
    # raise_error fires on the broadcast-exchange thread and surfaces as a
    # raw Py4JJavaError; executed in a probe stage it arrives as
    # SparkRuntimeException — both carry the guard text
    with _pytest.raises(Exception, match="unlabeled"):
        conductance(e, labels).collect()
