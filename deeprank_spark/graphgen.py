"""Deterministic distributed graph generators (no RNG state, no driver data).

Used by the skew and scaling benchmarks: at sandbox scale the driver
testdata graphs are overhead-dominated, so throughput/scaling measurements
need a synthetic edge table big enough that per-task compute dominates
scheduling. Everything derives from xxhash64 of the row id — identical
output for identical (n_edges, n_vertices, seed) at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hub_graph(
    spark: SparkSession,
    n_edges: int,
    n_vertices: int,
    hub_frac: float = 0.10,
    seed: int = 0,
) -> DataFrame:
    """Skewed edge table: vertex 0 receives ~hub_frac of all edges, the
    rest land uniformly. Self-loops dropped, multi-edges deduped."""
    df = spark.range(n_edges)
    h1 = F.abs(F.xxhash64("id", F.lit(seed), F.lit(1)))
    h2 = F.abs(F.xxhash64("id", F.lit(seed), F.lit(2)))
    src = (h1 % n_vertices).cast("long")
    dst = F.when(
        (F.abs(F.xxhash64("id", F.lit(seed), F.lit(3))) % 100)
        < int(hub_frac * 100),
        F.lit(0),
    ).otherwise((h2 % n_vertices).cast("long"))
    return (
        df.select(src.alias("src"), dst.alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
