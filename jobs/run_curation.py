"""spark-submit entry point: the training-corpus curation pipeline,
end to end — the composition a pretraining data job actually runs, built
entirely from the engine's corpus operators:

    documents
      -> exact dedup            (md5 text hash, keep first per group)
      -> near-dup dedup         (MinHash-LSH clusters, keep canonical)
      -> benchmark decontam     (word n-gram overlap vs a held-out set)
      -> quality gate           (fastText-style classifier trained on a
                                 high-quality sample vs the raw pool)
      -> perplexity gate        (add-k bigram LM, drop the worst tail)
      -> sequence packing       (concat-and-cut at a token budget)
      -> parquet out            (packed sequences + a per-stage audit)

Cluster launch (north-rule layout):

    python jobs/build_pyfiles.py
    spark-submit --master <cluster-or-local[N]> \
        --py-files dist/deeprank_spark.zip jobs/run_curation.py \
        --sf-dir /root/testdata/sf0.001 --out /tmp/curated \
        [--budget 512] [--ppl-quantile 0.9] [--quality-quantile 0.5]

Success marker: one `CURATION_DONE {...}` JSON line with per-stage
surviving-row counts — the audit a data engineer reads first.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--budget", type=int, default=512)
    ap.add_argument("--ppl-quantile", type=float, default=0.9,
                    help="drop docs above this self-perplexity quantile")
    ap.add_argument("--quality-quantile", type=float, default=0.5,
                    help="keep docs above this quantile of the classifier "
                         "margin (relative gate: robust to class imbalance, "
                         "where an absolute probability cut degenerates)")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    b = SparkSession.builder.appName("deeprank-curation")
    if args.shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    # imports AFTER session creation: resolve from the --py-files zip
    from deeprank_spark.operators.classifier import (
        score_quality,
        train_quality_classifier,
    )
    from deeprank_spark.operators.corpus import decontaminate, pack_sequences
    from deeprank_spark.operators.dedup import exact_duplicates, near_dup_clusters
    from deeprank_spark.operators.lm import lm_perplexity

    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    audit = {"input": docs.count()}

    # 1. exact dedup: keep the smallest doc_id of every identical-text
    # group ((text_hash, n_docs, doc_ids) rows for groups with n_docs>1)
    dupes = exact_duplicates(docs)
    losers = (
        dupes.select(
            F.array_min("doc_ids").alias("keep"),
            F.explode("doc_ids").alias("doc_id"),
        )
        .where(F.col("doc_id") != F.col("keep"))
        .select("doc_id")
    )
    docs = docs.join(losers, "doc_id", "left_anti")
    audit["after_exact_dedup"] = docs.count()

    # 2. near-dup dedup: MinHash-LSH clusters, keep each cluster's canonical
    clusters = near_dup_clusters(docs)  # (doc_id, cluster_id, is_canonical)
    near_losers = clusters.where(~F.col("is_canonical")).select("doc_id")
    docs = docs.join(near_losers, "doc_id", "left_anti")
    audit["after_near_dedup"] = docs.count()

    # 3. decontamination vs the held-out benchmark slice (doc_id % 37)
    bench = docs.where(F.col("doc_id") % 37 == 0)
    pool = docs.where(F.col("doc_id") % 37 != 0)
    contaminated = decontaminate(pool, bench, n=3).select("doc_id")
    docs = pool.join(contaminated, "doc_id", "left_anti")
    audit["after_decontam"] = docs.count()

    # 4. quality gate: classifier trained on a deterministic "curated"
    # sample (every 11th doc plays the wiki side) vs the raw pool
    pos = docs.where(F.col("doc_id") % 11 == 0)
    neg = docs.where(F.col("doc_id") % 11 != 0)
    model = train_quality_classifier(pos, neg, n_buckets=512, iters=10, lr=0.5)
    scored = score_quality(docs, model, n_buckets=512)
    # RELATIVE gate: keep the top (1-q) of the pool by classifier margin —
    # under heavy class imbalance the absolute p=0.5 cut degenerates (the
    # learned prior is the pos/neg ratio), while "keep what looks most
    # target-like" is the filter's actual pretraining use
    mcut = scored.agg(
        F.percentile_approx("margin", args.quality_quantile, 10000)
    ).first()[0]
    keep_q = scored.where(F.col("margin") >= mcut).select("doc_id")
    docs = docs.join(keep_q, "doc_id", "left_semi")
    audit["after_quality_gate"] = docs.count()

    # 5. perplexity gate: drop the worst tail under the corpus' own LM
    ppl = lm_perplexity(docs)
    cut = ppl.where(F.col("ppl").isNotNull()).agg(
        F.percentile_approx("ppl", args.ppl_quantile, 10000)
    ).first()[0]
    keep_p = ppl.where(F.col("ppl").isNull() | (F.col("ppl") <= cut)).select(
        "doc_id"
    )
    docs = docs.join(keep_p, "doc_id", "left_semi")
    audit["after_ppl_gate"] = docs.count()

    # 6. pack into fixed-budget sequences and write (pack_sequences
    # consumes per-doc token counts, not raw text)
    from deeprank_spark.operators.textstats import token_counts

    counted = docs.join(
        token_counts(docs).select("doc_id", "n_tokens"), "doc_id"
    )
    packed = pack_sequences(counted, budget=args.budget)
    packed.write.mode("overwrite").parquet(f"{args.out}/packed")
    reread = spark.read.parquet(f"{args.out}/packed")
    audit["packed_sequences"] = int(
        (reread.agg(F.max("pack_last")).first()[0] or -1) + 1
    )
    spark.createDataFrame(
        [(k, v) for k, v in audit.items()], "stage string, rows long"
    ).write.mode("overwrite").parquet(f"{args.out}/audit")

    print("CURATION_DONE", json.dumps(audit))
    spark.stop()


if __name__ == "__main__":
    main()
