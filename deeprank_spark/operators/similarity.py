"""Embedding similarity search (brute-force + LSH-bucketed ANN).

Over an `embeddings(vec_id, embedding array<float>, label)` table:

- cosine_topk: exact brute-force top-k neighbors for a set of query vectors.
  The dot product is a zip_with/aggregate Catalyst expression (JVM-side);
  queries broadcast against the corpus, so the corpus is scanned once —
  at 100 TB this is the embarrassingly parallel baseline.
- random_hyperplane_lsh / ann_topk_lsh: sign-LSH buckets from deterministic
  hyperplanes (hash-derived pseudo-random components, no RNG state), then
  exact rescoring within candidate buckets — the scale path that avoids the
  full cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    queries: (query_id, embedding). -> (query_id, vec_id, cosine, rn) with
    rn in [1..k], ties broken by vec_id; self-matches excluded when ids
    collide.
    """
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv"))
    q = queries.select(F.col("query_id"), F.col(vec_col).alias("qv"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            (
                _dot(F.col("qv"), F.col("cv"))
                / (_norm(F.col("qv")) * _norm(F.col("cv")))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
    )


def cosine_near_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (id_a < id_b) with
    cosine >= threshold. Brute-force O(n^2) baseline — the LSH-bucketed
    variant (ann_topk_lsh's bucket join) is the scale path; at 100 TB you
    block on LSH buckets first and verify with this exact score."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (
                _dot(F.col("va"), F.col("vb"))
                / (_norm(F.col("va")) * _norm(F.col("vb")))
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def _hyperplane_component(plane: int, dim_idx, seed: int) -> F.Column:
    """Deterministic pseudo-random component in [-1, 1): derived from
    xxhash64(plane, dim, seed) — reproducible across runs and engines with
    the same hash, no RNG state shipped to executors."""
    h = F.xxhash64(F.lit(plane), dim_idx.cast("long"), F.lit(seed))
    return (F.pmod(h, F.lit(2000003)).cast("double") / 1000001.5) - 1.0


def random_hyperplane_lsh(
    df: DataFrame,
    vec_col: str = "embedding",
    num_planes: int = 12,
    seed: int = 42,
    out_col: str = "bucket",
) -> DataFrame:
    """Sign-LSH bucket id from num_planes deterministic hyperplanes."""
    def sign_bit(plane: int) -> F.Column:
        # dot(v, plane) via aggregate over (value, dim index)
        prod = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.sequence(F.lit(0), F.size(F.col(vec_col)) - 1),
                lambda x, i: x.cast("double") * _hyperplane_component(plane, i, seed),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return F.when(prod >= 0, F.lit(1)).otherwise(F.lit(0))

    bucket = F.lit(0).cast("long")
    for p in range(num_planes):
        bucket = bucket * 2 + sign_bit(p)
    return df.withColumn(out_col, bucket)


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket, exact
    cosine rescoring within the bucket. Probes only the single bucket
    (multi-probe is a straightforward extension: explode neighbor buckets)."""
    c = random_hyperplane_lsh(
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv")),
        "cv", num_planes, seed,
    )
    q = random_hyperplane_lsh(
        queries.select("query_id", F.col(vec_col).alias("qv")),
        "qv", num_planes, seed,
    )
    scored = (
        q.join(c, "bucket")
        .where(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            (
                _dot(F.col("qv"), F.col("cv"))
                / (_norm(F.col("qv")) * _norm(F.col("cv")))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("vec_id"))
    return scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)
