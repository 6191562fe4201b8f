"""N-gram language-model perplexity scoring (CCNet-style quality filter,
Wenzek et al. 2020 — there a 5-gram KenLM; here an add-k-smoothed bigram
model, the same filter shape with a deterministic, SQL-mirrorable model so
the driver contract can value-check it cross-engine).

Beyond the reference (training-corpus curation family, like corpus.py /
textstats.py): rank documents by how "LM-like" their text is — low
perplexity under a model trained on the corpus itself (or a supplied
reference corpus) means fluent text; high perplexity flags gibberish,
boilerplate shredding, OCR noise. The standard pretraining-data use is
"drop/downweight the highest-perplexity tail".

Model: P(w2|w1) = (C(w1 w2) + k) / (C(w1) + k*V), where C(w1) is the
CONTEXT count (sum over observed bigrams starting at w1 — probabilities
normalize exactly over the V-word vocabulary) and V = |distinct tokens in
the training corpus|. Unknown words/bigrams fall back to the smoothing
mass. doc score = avg log-prob over its bigrams; perplexity = exp(-avg).

Scale shape: tokenization and bigram extraction are pure Catalyst
expressions (shared tokens_col regex — zero Python); model training is
two map-side-combined groupBy counts over the exploded pairs; scoring is
two equi-joins (bigram, context) against the model and one per-doc
aggregation. At 100 TB the model side is itself large, so the joins stay
shuffle joins (AQE handles the "of the"-style hot bigram keys via skew
split); pass broadcast_model=True only when the training corpus is known
small. The vocabulary size rides the plan as a broadcast 1-row frame —
no driver-side collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import tokens_col


def _bigram_pairs(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) — one row per adjacent token pair; docs with <2
    tokens contribute nothing (sequence(1, n) would run DESCENDING for
    n<1, hence the guard comes first)."""
    toks = docs.select(
        F.col(id_col).alias("__id"), tokens_col(F.col(text_col)).alias("t")
    ).where(F.size("t") >= 2)
    return toks.select(
        "__id",
        F.explode(
            F.expr("transform(sequence(1, size(t)-1), i -> struct(t[i-1] AS w1, t[i] AS w2))")
        ).alias("p"),
    ).select("__id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))


def lm_perplexity(
    docs: DataFrame,
    model_docs: DataFrame | None = None,
    k: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = False,
) -> DataFrame:
    """-> (doc_id, n_bigrams, avg_logp, ppl) for every input doc.

    model_docs defaults to docs (self-perplexity — the usual "rank the
    corpus against itself" screening mode); pass a curated reference
    corpus for CCNet's "perplexity under a clean-data LM" mode. Docs with
    fewer than 2 tokens get n_bigrams=0 and NULL scores (nothing to
    score — kept, not dropped, so the caller decides their fate).
    """
    if model_docs is None:
        model_docs = docs
    train = _bigram_pairs(model_docs, id_col, text_col)
    big = train.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    uni = train.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = F.broadcast(
        model_docs.select(
            F.explode(tokens_col(F.col(text_col))).alias("tok")
        ).agg(F.countDistinct("tok").alias("v"))
    )
    if broadcast_model:
        big, uni = F.broadcast(big), F.broadcast(uni)

    pairs = _bigram_pairs(docs, id_col, text_col)
    scored = (
        pairs.join(big, ["w1", "w2"], "left")
        .join(uni, "w1", "left")
        .crossJoin(vocab)
        .select(
            "__id",
            F.log(
                (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(k))
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(k) * F.col("v"))
            ).alias("lp"),
        )
        .groupBy("__id")
        .agg(F.count("*").alias("n_bigrams"), F.avg("lp").alias("avg_logp"))
    )
    return (
        docs.select(F.col(id_col).alias("__id"))
        .join(scored, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            F.col("avg_logp"),
            F.exp(-F.col("avg_logp")).alias("ppl"),
        )
    )
