"""Deep-DAG SCC regression bench: a directed path of n singleton SCCs (the
adversarial worst case for trim-based peeling — diameter = n, every SCC is
a singleton, no hub structure for coloring to exploit).

Measures wall time, outer rounds, and total Spark-job-ish driver steps of
scc_distributed, and value-checks the output (every vertex is its own
component). VERDICT r3 next-round #5.

Usage: python tools/scc_dag_bench.py [n_vertices] — prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from deeprank_spark.operators import scc as scc_mod  # noqa: E402
from deeprank_spark.session import get_spark  # noqa: E402


def main(n: int) -> None:
    spark = get_spark(app_name="scc-dag-bench", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    # path 0 -> 1 -> ... -> n-1, ids shuffled by a fixed affine map so the
    # path order carries no id monotonicity the kernel could luck into
    edges = spark.createDataFrame(
        [((i * 7919) % n, ((i + 1) * 7919) % n) for i in range(n - 1)],
        "src long, dst long",
    ).localCheckpoint(eager=True)
    t0 = time.time()
    out = scc_mod.scc_distributed(edges)
    rows = out.collect()
    wall = time.time() - t0
    ok = len(rows) == n and all(r["id"] == r["component"] for r in rows)
    stats = dict(getattr(scc_mod, "LAST_RUN_STATS", {}) or {})
    print(json.dumps({
        "n_vertices": n,
        "wall_s": round(wall, 2),
        "all_singletons": ok,
        **stats,
    }))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10_000)
