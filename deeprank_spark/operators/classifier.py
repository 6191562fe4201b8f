"""Linear quality classifier over hashed n-gram features — the
fastText-shaped corpus filter (the "wiki-vs-crawl" discriminative
quality scoring used for GPT-3/CCNet-style pretraining mixes; Joulin et
al. 2016 architecture reduced to its logistic-regression core so the
whole thing is deterministic and differentiable-by-hand).

Training is full-batch gradient descent expressed as Spark dataflow:
each step is (1) one broadcast join of the cached (doc, bucket, count)
feature table against the B-row weight table to get per-doc margins and
residuals, and (2) one aggregation of count*residual per bucket for the
gradient. The model (B weights + bias) lives on the driver between
steps — it is O(n_buckets), independent of corpus size, which is the
standard geometry for batch GD at scale (data distributed, model tiny).
Features use the md5-hex-prefix bucket hash (engine-portable, the same
one DSIR/stratified_sample use), so a pure-python mirror reproduces the
training trajectory to float reassociation noise.

No Python UDFs anywhere: margins, sigmoids and gradients are Catalyst
expressions; the only driver traffic per step is the B-row gradient.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .lm import _bigram_pairs


def _bucket(col_w1, col_w2, n_buckets: int):
    return (
        F.conv(
            F.substring(F.md5(F.concat_ws(" ", col_w1, col_w2)), 1, 8), 16, 10
        ).cast("long")
        % n_buckets
    )


def hashed_features(
    docs: DataFrame,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, bucket, cnt): hashed-bigram count features, the fastText
    input layer. Docs with <2 tokens produce no rows (score 0 margin =
    bias only downstream)."""
    pairs = _bigram_pairs(docs, id_col, text_col)
    return (
        pairs.select(
            F.col("__id").alias(id_col),
            _bucket(F.col("w1"), F.col("w2"), n_buckets).alias("bucket"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count("*").cast("double").alias("cnt"))
    )


def train_quality_classifier(
    pos_docs: DataFrame,
    neg_docs: DataFrame,
    n_buckets: int = 1024,
    iters: int = 30,
    lr: float = 0.5,
    l2: float = 1.0e-4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Train w, b by full-batch GD on logloss (+L2 on w, not bias).
    Returns {"weights": {bucket: w}, "bias": b, "losses": [per-iter]}.

    pos_docs = the reference "high quality" sample (e.g. curated corpus),
    neg_docs = the raw pool. Deterministic: fixed init (zeros), fixed
    iteration count, engine-portable feature hash.
    """
    spark = pos_docs.sparkSession
    feats = (
        hashed_features(pos_docs, n_buckets, id_col, text_col)
        .withColumn("y", F.lit(1.0))
        .unionByName(
            hashed_features(neg_docs, n_buckets, id_col, text_col).withColumn(
                "y", F.lit(0.0)
            )
        )
        .localCheckpoint(eager=True)
    )
    # one docs frame for N and the per-doc label (docs with no features
    # still contribute through the bias gradient)
    docs_y = (
        pos_docs.select(F.col(id_col).alias("d")).withColumn("y", F.lit(1.0))
        .unionByName(
            neg_docs.select(F.col(id_col).alias("d")).withColumn("y", F.lit(0.0))
        )
        .localCheckpoint(eager=True)
    )
    n_docs = docs_y.count()
    if n_docs == 0:
        raise ValueError("train_quality_classifier: empty training input")
    w: dict[int, float] = {}
    b = 0.0
    losses: list[float] = []
    for _ in range(iters):
        wdf = spark.createDataFrame(
            list(w.items()) or [(-1, 0.0)], "bucket long, wv double"
        )
        margins = (
            feats.join(F.broadcast(wdf), "bucket", "left")
            .groupBy(id_col)
            .agg(
                F.sum(F.col("cnt") * F.coalesce(F.col("wv"), F.lit(0.0))).alias(
                    "m"
                )
            )
        )
        scored = (
            docs_y.join(margins, docs_y["d"] == margins[id_col], "left")
            .select(
                "d",
                "y",
                (
                    F.lit(1.0)
                    / (
                        F.lit(1.0)
                        + F.exp(-(F.coalesce(F.col("m"), F.lit(0.0)) + F.lit(b)))
                    )
                ).alias("p"),
            )
            .localCheckpoint(eager=True)
        )
        agg = scored.agg(
            F.sum(F.col("p") - F.col("y")).alias("gb"),
            F.sum(
                -(
                    F.col("y") * F.log(F.greatest(F.col("p"), F.lit(1e-12)))
                    + (F.lit(1.0) - F.col("y"))
                    * F.log(F.greatest(F.lit(1.0) - F.col("p"), F.lit(1e-12)))
                )
            ).alias("loss"),
        ).first()
        grad_rows = (
            # feats carries its own y copy; pulling only p from `scored`
            # keeps the join unambiguous
            feats.join(scored.select(F.col("d").alias(id_col), "p"), id_col)
            .groupBy("bucket")
            .agg(F.sum(F.col("cnt") * (F.col("p") - F.col("y"))).alias("g"))
            .collect()
        )
        losses.append(float(agg["loss"]) / n_docs)
        b -= lr * float(agg["gb"]) / n_docs
        for r in grad_rows:
            bk = int(r["bucket"])
            g = float(r["g"]) / n_docs + l2 * w.get(bk, 0.0)
            w[bk] = w.get(bk, 0.0) - lr * g
    return {"weights": w, "bias": b, "losses": losses}


def score_quality(
    docs: DataFrame,
    model: dict,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (doc_id, margin, p_quality): apply a trained model. Featureless
    docs score the bias alone."""
    spark = docs.sparkSession
    wdf = spark.createDataFrame(
        list(model["weights"].items()) or [(-1, 0.0)], "bucket long, wv double"
    )
    feats = hashed_features(docs, n_buckets, id_col, text_col)
    margins = (
        feats.join(F.broadcast(wdf), "bucket", "left")
        .groupBy(id_col)
        .agg(F.sum(F.col("cnt") * F.coalesce(F.col("wv"), F.lit(0.0))).alias("m"))
    )
    b = float(model["bias"])
    return (
        docs.select(F.col(id_col))
        .join(margins, id_col, "left")
        .select(
            F.col(id_col),
            (F.coalesce(F.col("m"), F.lit(0.0)) + F.lit(b)).alias("margin"),
            (
                F.lit(1.0)
                / (F.lit(1.0) + F.exp(-(F.coalesce(F.col("m"), F.lit(0.0)) + F.lit(b))))
            ).alias("p_quality"),
        )
    )
