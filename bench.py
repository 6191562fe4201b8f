"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline set = the north-rule kernels (full-convergence distributed
PageRank with supersteps/sec, CC, LPA, triangles), the per-conversation
flagship text-graph pipeline, and one representative from each auxiliary
family (dedup, ANN, relational agg, windowed events).

`python bench.py --scaling` additionally runs the PageRank+kernel job at
two parallelism levels (local[8] vs local[32], fresh JVM each) on the SAME
input and reports throughput at both plus scaling efficiency — the sandbox
proxy for the N->4N-executor criterion (see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# headline queries drawn from the __spark_entry__ contract
HEADLINE = [
    "g_pagerank_full",
    "g_components",
    "g_lpa2",
    "g_triangles",
    "dr_summary",
    "dedup_exact",
    "minhash_sig",
    "ann_cosine_topk",
    "weighted_score",
    "window_rank",
    "ev_sessionize",
]


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.0


def run_bench() -> dict:
    import __spark_entry__ as entrymod
    from deeprank_spark.session import get_spark

    spark = get_spark(
        app_name="deeprank-bench", master=f"local[{CPUS}]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    times: dict[str, float] = {}
    extras: dict = {}
    # untimed warmup: JVM/codegen/parquet-footer costs land here, not on
    # whichever query happens to run first
    for t in ("orders", "lineitem", "documents", "embeddings", "events"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()
    qs["vote_count"](spark, SF_DIR).count()
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        n_rows = fn(spark, SF_DIR).count()
        times[name] = round(time.time() - t0, 3)
        extras.setdefault("rows", {})[name] = n_rows

    # supersteps/sec for the north-rule metric: rerun the distributed kernel
    # directly so we can read the iteration metrics off the run handle.
    from __spark_entry__ import _bipartite_edges
    from deeprank_spark.operators.pagerank import pagerank_distributed

    edges = _bipartite_edges(spark, SF_DIR).localCheckpoint(eager=True)
    n_edges = edges.count()
    t0 = time.time()
    run = pagerank_distributed(edges)
    pr_wall = time.time() - t0
    extras["pagerank_supersteps"] = run.supersteps
    extras["pagerank_supersteps_per_sec"] = round(run.supersteps / pr_wall, 4)
    extras["pagerank_edges"] = n_edges
    extras["pagerank_converged"] = run.converged

    total = round(sum(times.values()), 3)
    out = {
        "metric": "headline query wall time (sum) at sf; PageRank to 1e-6 + CC/LPA/triangles + flagship text-graph pipeline",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": _sf_from_dir(SF_DIR),
        "cpus": int(CPUS),
        "pagerank_supersteps_per_sec": extras["pagerank_supersteps_per_sec"],
        "pagerank_supersteps": extras["pagerank_supersteps"],
        "pagerank_edges": extras["pagerank_edges"],
        "rows": extras["rows"],
    }
    spark.stop()
    return out


def run_kernel_job() -> dict:
    """One full kernel job (PageRank-to-convergence + CC + LPA + triangles)
    used as the unit of work for the scaling measurement."""
    import __spark_entry__ as entrymod
    from deeprank_spark.session import get_spark

    spark = get_spark(
        app_name="deeprank-scaling", master=f"local[{CPUS}]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    t0 = time.time()
    for name in ["g_pagerank_full", "g_components", "g_lpa2", "g_triangles"]:
        qs[name](spark, SF_DIR).count()
    wall = time.time() - t0
    spark.stop()
    return {"cpus": int(CPUS), "wall_s": round(wall, 3)}


def run_scaling() -> dict:
    """local[8] vs local[32] on the same input, fresh JVM each."""
    results = {}
    for cpus in ("8", "32"):
        env = dict(os.environ, SPARK_GRAFT_CPUS=cpus, SPARK_GRAFT_SF_DIR=SF_DIR)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--kernel-job"],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])
    t8, t32 = results["8"]["wall_s"], results["32"]["wall_s"]
    speedup = t8 / t32
    return {
        "metric": "kernel-job scaling local[8] -> local[32] (N -> 4N cores)",
        "sf": _sf_from_dir(SF_DIR),
        "wall_s_8": t8,
        "wall_s_32": t32,
        "throughput_jobs_per_sec_8": round(1.0 / t8, 5),
        "throughput_jobs_per_sec_32": round(1.0 / t32, 5),
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(speedup / 4.0, 3),
    }


if __name__ == "__main__":
    if "--kernel-job" in sys.argv:
        print(json.dumps(run_kernel_job()))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
