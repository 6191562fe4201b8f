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
