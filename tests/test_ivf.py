"""IVF ANN: correctness of the deterministic Lloyd cells and recall on
data that actually HAS cluster structure.

The driver fixture's embeddings are near-uniform random — there, recall
can never exceed the probed fraction (measured and documented in
BASELINE.md), which says nothing about the operator. Here we plant
well-separated clusters and require nprobe=2/8 cells to recover ~all
exact neighbors — the property IVF is supposed to deliver at 100 TB on
real (clusterable) embedding corpora."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from deeprank_spark.operators.similarity import (
    ann_topk_ivf,
    cosine_topk,
    ivf_assign,
    ivf_centroids,
)


def _planted(spark, n_clusters=8, per=40, d=16, seed=3):
    rng = np.random.RandomState(seed)
    centers = rng.normal(0, 1, (n_clusters, d)) * 10.0
    rows = []
    vid = 0
    for c in range(n_clusters):
        for _ in range(per):
            v = centers[c] + rng.normal(0, 0.3, d)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ivf_recall_on_clustered_data(spark):
    emb = _planted(spark)
    queries = emb.where(F.col("vec_id") % 40 == 7).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(emb, queries, k=5).select("query_id", "vec_id")
    approx = ann_topk_ivf(
        emb, queries, k=5, k_cells=8, iters=4, nprobe=2
    ).select("query_id", "vec_id")
    n = exact.count()
    hit = exact.join(approx, ["query_id", "vec_id"], "leftsemi").count()
    assert n == 40  # 8 queries x 5
    assert hit / n >= 0.95, (hit, n)


def test_ivf_cells_recover_planted_clusters(spark):
    emb = _planted(spark)
    cent = ivf_centroids(emb, k_cells=8, iters=4)
    assign = ivf_assign(emb, cent)
    # every planted cluster should land (almost) entirely in one cell
    rows = assign.select(
        (F.col("vec_id") / 40).cast("int").alias("truth"), "cell"
    ).groupBy("truth", "cell").count().collect()
    by_truth: dict[int, int] = {}
    for r in rows:
        by_truth[r["truth"]] = max(by_truth.get(r["truth"], 0), r["count"])
    assert all(v >= 36 for v in by_truth.values()), by_truth  # >=90% purity


def test_ivf_rescore_is_exact_within_probed_cells(spark):
    """Every returned neighbor must carry the exact cosine the brute-force
    path computes for the same pair (the rescore is exact by construction)."""
    emb = _planted(spark, n_clusters=4, per=20)
    queries = emb.where(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["vec_id"]): r["cosine"]
        for r in cosine_topk(emb, queries, k=80).collect()
    }
    approx = ann_topk_ivf(emb, queries, k=5, k_cells=4, iters=3, nprobe=4)
    for r in approx.collect():
        key = (r["query_id"], r["vec_id"])
        assert key in exact
        assert abs(exact[key] - r["cosine"]) < 1e-12
