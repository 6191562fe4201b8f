"""Hub-skew benchmark: distributed PageRank (or HITS) on a power-law
graph with one hub vertex receiving ~10% of all edges, with and without
explicit salting (two-phase (key, salt)->key aggregation).

Usage: python tools/skew_bench.py [n_edges] [pagerank|hits] — one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from deeprank_spark.graphgen import hub_graph  # noqa: E402
from deeprank_spark.operators.pagerank import pagerank_distributed  # noqa: E402
from deeprank_spark.session import get_spark  # noqa: E402


def main_hits(n_edges: int) -> None:
    from deeprank_spark.operators.hits import hits_distributed

    spark = get_spark(app_name="skew-bench-hits", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    edges = hub_graph(spark, n_edges, n_vertices=n_edges // 10).localCheckpoint(
        eager=True
    )
    m = edges.count()
    hub_in = edges.where("dst = 0").count()
    out = {"kernel": "hits", "edges": m, "hub_in_edges": hub_in,
           "hub_frac": round(hub_in / m, 4)}
    results = {}
    for salt in (0, 16):
        t0 = time.time()
        run = hits_distributed(
            edges, salt_buckets=salt, tol=0.0, max_iter=12, return_run=True
        )
        run.labels.count()
        wall = time.time() - t0
        ms = sorted(d["wall_ms"] for d in run.metrics[1:])  # drop warm-up step
        results[f"salt_{salt}"] = {
            "wall_s": round(wall, 2),
            "supersteps": run.rounds,
            "median_superstep_ms": round(ms[len(ms) // 2], 1),
            "max_superstep_ms": round(max(ms), 1),
        }
    a = {r["id"]: (r["hub"], r["auth"]) for r in
         hits_distributed(edges, salt_buckets=0, tol=0.0, max_iter=12).collect()}
    b = {r["id"]: (r["hub"], r["auth"]) for r in
         hits_distributed(edges, salt_buckets=16, tol=0.0, max_iter=12).collect()}
    out["max_value_diff"] = max(
        max(abs(a[k][0] - b[k][0]), abs(a[k][1] - b[k][1])) for k in a
    )
    out.update(results)
    print(json.dumps(out))
    spark.stop()


def main(n_edges: int) -> None:
    spark = get_spark(app_name="skew-bench", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    edges = hub_graph(spark, n_edges, n_vertices=n_edges // 10).localCheckpoint(
        eager=True
    )
    m = edges.count()
    hub_in = edges.where("dst = 0").count()
    out = {"edges": m, "hub_in_edges": hub_in, "hub_frac": round(hub_in / m, 4)}
    results = {}
    # tol tightened well below the networkx default: at n~200k the default
    # n*tol gate trips after 2 supersteps, which measures nothing — the
    # bench wants steady-state per-superstep cost under hub fan-in
    for salt in (0, 16):
        t0 = time.time()
        run = pagerank_distributed(
            edges, salt_buckets=salt, tol=1.0e-11, max_iter=100
        )
        wall = time.time() - t0
        ms = [d["wall_ms"] for d in run.deltas]
        results[f"salt_{salt}"] = {
            "wall_s": round(wall, 2),
            "supersteps": run.supersteps,
            "steps_per_sec": round(run.supersteps / wall, 3),
            "max_step_ms": round(max(ms)),
            "med_step_ms": round(sorted(ms)[len(ms) // 2]),
        }
    # cross-check: same ranks either way
    a = {r["id"]: r["rank"] for r in
         pagerank_distributed(edges, salt_buckets=0, max_iter=100).ranks.collect()}
    b = {r["id"]: r["rank"] for r in
         pagerank_distributed(edges, salt_buckets=16, max_iter=100).ranks.collect()}
    # (cross-check runs use default tol: identical schedules either way)
    out["max_rank_diff"] = max(abs(a[k] - b[k]) for k in a)
    out.update(results)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    kernel = sys.argv[2] if len(sys.argv) > 2 else "pagerank"
    (main_hits if kernel == "hits" else main)(n)
