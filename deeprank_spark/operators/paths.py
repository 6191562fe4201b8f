"""Shortest paths (unweighted BFS levels) on one giant graph.

Beyond-reference link-graph kernel on the same superstep skeleton as
components/scc: distance relaxation is a hash-MIN exchange over dist+1.
Converges in O(eccentricity(source)) rounds; each round is one shuffle on
the vertex id plus the usual eager-checkpoint + periodic parquet reset
lineage discipline (_ResetDir, measured in pagerank.py).

Semantics = nx.single_source_shortest_path_length on the undirected
simple projection (directed=False) or the directed graph (directed=True);
unreachable vertices are absent, matching networkx.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .components import _ResetDir


def sssp_distributed(
    edges: DataFrame,
    source,
    id_cols: tuple = ("src", "dst"),
    directed: bool = False,
    max_iter: int = 200,
) -> DataFrame:
    """-> (id, dist) for every vertex reachable from `source`."""
    src, dst = id_cols
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    if not directed:
        e = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    e = e.where(F.col("a") != F.col("b")).distinct().localCheckpoint(eager=True)
    spark = edges.sparkSession
    dist = spark.createDataFrame([(source, 0)], "id long, dist int").localCheckpoint(
        eager=True
    )
    # frontier-based BFS: each round relaxes only the edges leaving the
    # vertices discovered last round (unweighted => a settled vertex never
    # improves), so per-round cost is O(frontier out-degree), not O(|V|)
    frontier = dist
    kept = [dist]
    rdir = _ResetDir("sssp")
    exhausted = True
    for it in range(max_iter):
        cand = (
            frontier.join(e, frontier["id"] == e["a"])
            .groupBy(e["b"].alias("id"))
            .agg((F.min("dist") + 1).alias("dist"))
        )
        frontier = cand.join(dist, "id", "leftanti").localCheckpoint(eager=True)
        n_new = frontier.count()
        if n_new == 0:
            exhausted = False
            break
        dist = dist.union(frontier).localCheckpoint(eager=True)
        kept.append(dist)
        kept.append(frontier)
        if (it + 1) % 5 == 0:
            dist = rdir.reset(dist, it)
            kept.clear()
            kept.append(frontier)
    if exhausted:
        # refuse-to-mislabel policy (same as scc_distributed): a truncated
        # distance map is indistinguishable from "unreachable" downstream
        raise RuntimeError(
            f"sssp: frontier non-empty after {max_iter} rounds; raise max_iter"
        )
    return rdir.finalize(dist)


def wsssp_distributed(
    edges: DataFrame,
    source,
    weight_col: str = "w",
    id_cols: tuple = ("src", "dst"),
    directed: bool = False,
    delta: float | None = None,
    max_iter: int = 500,
) -> DataFrame:
    """Weighted single-source shortest paths -> (id, dist double) for every
    reachable vertex (nx.single_source_dijkstra_path_length semantics;
    parallel edges collapse to their min weight; weights must be > 0).

    Delta-stepping-style bucketed relaxation (Meyer & Sanders 2003, public):
    each outer round expands only the frontier vertices whose tentative
    distance lies in the current bucket [B, B + delta) where B = min
    tentative distance over the frontier — the Dijkstra argument makes the
    min-distance vertex final each round, so far vertices are not
    re-relaxed while near ones are still settling (the wasted-relaxation
    problem of plain distributed Bellman-Ford). Any relaxation schedule
    reaches the same fixpoint, so `delta` affects round count and wasted
    work only, never the result; `delta=None` uses the mean edge weight.

    Per round: one scalar agg (bucket bound) + one shuffle on the vertex id
    (relax) + one merge join, under the same eager-checkpoint `_ResetDir`
    lineage discipline as the other kernels. Raises (refuse-to-mislabel)
    if the frontier is still non-empty after max_iter rounds.
    """
    src, dst = id_cols
    e = edges.select(
        F.col(src).alias("a"),
        F.col(dst).alias("b"),
        F.col(weight_col).cast("double").alias("w"),
    )
    if not directed:
        e = e.union(
            e.select(F.col("b").alias("a"), F.col("a").alias("b"), "w")
        )
    e = (
        e.where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
        .localCheckpoint(eager=True)
    )
    wmin, wavg = e.agg(F.min("w"), F.avg("w")).first()
    if wmin is not None and wmin <= 0:
        raise ValueError(f"wsssp: weights must be > 0, found min weight {wmin}")
    if delta is None:
        delta = float(wavg or 1.0)
    spark = edges.sparkSession
    dist = spark.createDataFrame(
        [(source, 0.0)], "id long, dist double"
    ).localCheckpoint(eager=True)
    # frontier = vertices whose tentative dist improved since last expansion
    frontier = dist
    kept = [dist]
    # one _ResetDir per state frame: a reset dir is deleted when ITS OWN
    # next reset lands, so two frames sharing one rotation would delete
    # each other's still-referenced parquet
    rdir = _ResetDir("wsssp")
    rdir_f = _ResetDir("wsssp_frontier")
    exhausted = True
    for it in range(max_iter):
        if frontier.isEmpty():
            exhausted = False
            break
        bound = frontier.agg(F.min("dist")).first()[0] + delta
        bucket = frontier.where(F.col("dist") < bound)
        rest = frontier.where(F.col("dist") >= bound)
        relaxed = (
            bucket.join(e, bucket["id"] == e["a"])
            .groupBy(e["b"].alias("id"))
            .agg(F.min(F.col("dist") + F.col("w")).alias("nd"))
        )
        merged = dist.join(relaxed, "id", "full").select(
            "id",
            F.least(
                F.coalesce(F.col("dist"), F.lit(float("inf"))),
                F.coalesce(F.col("nd"), F.lit(float("inf"))),
            ).alias("dist"),
            (
                F.col("dist").isNull() | (F.col("nd") < F.col("dist"))
            ).alias("improved"),
        ).localCheckpoint(eager=True)
        dist = merged.select("id", "dist")
        improved = merged.where("improved").select("id")
        frontier = rest.select("id").join(
            improved, "id", "leftanti"
        ).unionByName(improved).join(dist, "id").localCheckpoint(eager=True)
        kept.append(merged)
        kept.append(frontier)
        if (it + 1) % 5 == 0:
            dist = rdir.reset(dist, it)
            frontier = rdir_f.reset(frontier, it)
            kept.clear()
            kept.append(dist)
            kept.append(frontier)
    if exhausted:
        raise RuntimeError(
            f"wsssp: frontier non-empty after {max_iter} rounds; raise max_iter"
        )
    return rdir.finalize(dist)
