"""Hub-skew benchmark for exact butterfly counting: a bipartite graph with
one hub customer adjacent to EVERY supplier. The naive left-centered wedge
join emits C(deg_hub, 2) rows for the hub alone; the vertex-priority
direction (operators/cohesion.butterflies_bipartite) enumerates each
butterfly once from its max-priority corner, so the hub (highest priority)
never fans out as a wedge center below itself.

Usage: python tools/butterfly_hub_bench.py [n_suppliers] [n_customers]
Prints one JSON line: wedge rows enumerated by each formulation, wall
times, and a value cross-check.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from deeprank_spark.operators.cohesion import butterflies_bipartite  # noqa: E402
from deeprank_spark.session import get_spark  # noqa: E402


def main(n_sup: int, n_cust: int) -> None:
    spark = get_spark(app_name="butterfly-hub-bench", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    # customer 0 = hub: adjacent to all n_sup suppliers. Other customers
    # each see 3 pseudo-random suppliers (deterministic hash arithmetic).
    hub = spark.range(n_sup).select(
        F.lit(0).alias("src"), (F.col("id") + 1000000).alias("dst")
    )
    rest = (
        spark.range(1, n_cust)
        .select(F.col("id").alias("src"), F.explode(F.array(*[F.lit(i) for i in range(3)])).alias("j"))
        .select(
            "src",
            (F.pmod(F.xxhash64("src", "j"), F.lit(n_sup)) + 1000000).alias("dst"),
        )
    )
    edges = hub.union(rest).distinct().localCheckpoint(eager=True)
    m = edges.count()

    # naive wedge volume (what the pre-round-3 operator shuffled): sum of
    # C(deg_left, 2) — dominated by the hub's C(n_sup, 2)
    naive_wedges = (
        edges.groupBy("src")
        .agg(F.count("*").alias("d"))
        .agg(F.sum(F.col("d") * (F.col("d") - 1) / 2))
        .first()[0]
    )

    t0 = time.time()
    out = butterflies_bipartite(edges)
    total = out.agg(F.sum("butterflies")).first()[0]
    wall = time.time() - t0

    # independent check: right-pair formula computed with an aggregate that
    # never materializes per-pair rows for the hub side (suppliers are the
    # pair side here, small by construction)
    pair_k = (
        edges.alias("a")
        .join(edges.alias("b"), (F.col("a.src") == F.col("b.src")) & (F.col("a.dst") < F.col("b.dst")))
        .groupBy(F.col("a.dst"), F.col("b.dst"))
        .agg(F.count("*").alias("k"))
    )
    exp_total = (
        pair_k.agg(F.sum(F.col("k") * (F.col("k") - 1))).first()[0] or 0
    )  # each pair's C(k,2) counted at both endpoints = k(k-1)/2*2

    print(
        json.dumps(
            {
                "edges": m,
                "hub_degree": n_sup,
                "naive_wedge_rows": int(naive_wedges),
                "vp_wall_s": round(wall, 2),
                "per_vertex_sum": int(total),
                "naive_check_sum": int(exp_total),
                "match": int(total) == int(exp_total),
            }
        )
    )


if __name__ == "__main__":
    n_sup = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    n_cust = int(sys.argv[2]) if len(sys.argv) > 2 else 50000
    main(n_sup, n_cust)
