"""Corpus curation operators for LLM training-data pipelines.

Three ops a 100 TB pretraining pipeline runs after dedup/quality
(dedup.py / textstats.py) and before writing the training mix:

- `decontaminate` — benchmark n-gram overlap (the standard train/test
  contamination check: flag any training document sharing a word n-gram
  with an evaluation set; n=8..13 in common practice). Pure-expression
  n-gram generation on both sides; the join key is the n-gram string.
  The benchmark side is DISTINCT n-grams and is usually small enough for
  Spark's auto-broadcast; when it isn't, the join degrades to a shuffle
  hash join on the n-gram — fan-out per n-gram is bounded by the number
  of documents containing it, which is the quantity being measured, so
  there is no incidental blow-up beyond the answer size.
- `repetition_score` — Gopher-style within-document repetition: the
  fraction of duplicate word n-grams. One projection, no shuffle; the
  n-gram list never leaves the row (size/array_distinct on an array
  column).
- `stratified_sample` — deterministic per-stratum Bernoulli sampling for
  mix shaping: keep a row iff the first 4 hex digits of md5(id) fall
  below the stratum's rate threshold. Reproducible across engines and
  runs (md5 hex is lowercase in both Spark and DuckDB), map-only (the
  rates dimension broadcasts), and exactly mirrorable in SQL — unlike
  `df.sample()`, whose RNG is partition-dependent.

All three are pure Catalyst expressions — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_ngrams(text, n: int) -> F.Column:
    """Space-joined word n-grams of `text` as array<string> (may be empty).

    Tokenization matches textstats.tokens_col (lower + split on
    non-[a-z0-9']) so corpus ops compose with quality/language stats.
    """
    from deeprank_spark.operators.textstats import tokens_col

    toks = tokens_col(text)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    # guard: sequence(1, k) DESCENDS for k < 1 instead of being empty
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def repetition_score(
    docs: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """-> (doc_id, n_ngrams, n_distinct, dup_frac).

    dup_frac = 1 - distinct/total word n-grams, and 0.0 for docs shorter
    than n tokens (no n-grams -> no repetition evidence; dropping short
    docs is the length filter's job, not this statistic's) — the Gopher
    repetition filters' core statistic.
    """
    g = word_ngrams(F.col(text_col), n)
    return docs.select(
        F.col(id_col),
        F.size(g).cast("long").alias("n_ngrams"),
        F.size(F.array_distinct(g)).cast("long").alias("n_distinct"),
        F.when(
            F.size(g) > 0,
            1.0 - F.size(F.array_distinct(g)) / F.size(g).cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_frac"),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
) -> DataFrame:
    """-> (doc_id, n_hits): training docs sharing >=1 word n-gram with the
    benchmark set; n_hits = number of DISTINCT contaminated n-grams in the
    doc. Docs with no overlap are absent (semantics: a contamination
    report, not a per-doc annotate — anti-join the ids to drop them).
    """
    bcol = bench_text_col or text_col
    bench_grams = (
        benchmark.select(
            F.explode(word_ngrams(F.col(bcol), n)).alias("g")
        ).distinct()
    )
    doc_grams = docs.select(
        F.col(id_col), F.explode(word_ngrams(F.col(text_col), n)).alias("g")
    ).distinct()
    return (
        doc_grams.join(bench_grams, "g")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_hits"))
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str,
    id_col: str,
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample of `df`.

    Keeps a row iff substr(md5(cast(id as string)), 1, 4) <
    hex(floor(rate * 16^4)), where rate comes from `rates[stratum]`
    (default_rate for unlisted strata). The threshold TRUNCATES
    (Python int(), i.e. floor for non-negative rates) — SQL mirrors must
    use floor(), not a bare CAST (round-half-to-even), or rates that are
    not exactly representable in binary (e.g. 0.1) diverge by one hash
    bucket. Thresholds are 4-char lowercase hex, so the lexicographic
    compare IS the numeric compare; rate>=1.0 maps to the sentinel 'g'
    (> every hex digit, keeps everything). The threshold dimension is
    tiny and broadcasts; the filter is map-side only — no shuffle at any
    scale.
    """

    def thr(rate: float) -> str:
        return "g" if rate >= 1.0 else f"{max(int(rate * 65536), 0):04x}"

    spark = df.sparkSession
    dim = spark.createDataFrame(
        [(k, thr(v)) for k, v in sorted(rates.items())],
        f"{stratum_col} string, thr string",
    )
    default_thr = thr(default_rate)
    return (
        df.join(F.broadcast(dim), stratum_col, "left")
        .where(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 4)
            < F.coalesce(F.col("thr"), F.lit(default_thr))
        )
        .drop("thr")
    )


def pack_sequences(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Concat-and-cut sample packing (the standard pretraining layout):
    documents are concatenated in deterministic `id_col` order and the
    token stream is cut every `budget` tokens. Returns one row per doc —
    (id, n_tokens, start_offset, pack_first, pack_last) — where
    start_offset is the doc's position in the global token stream and
    pack_first/pack_last the zero-based packs it lands in (a doc may
    straddle a cut; a zero-token doc is charged to its start pack).

    Scale design — NO global single-partition window: the global running
    sum is a two-pass parallel prefix. Pass 1 range-partitions on the id
    (range partitions are ordered by partition index, so partition p
    holds strictly smaller ids than p+1) and aggregates one total per
    partition — a frame with one row per partition, collected to the
    driver and turned into per-partition prefix offsets. Pass 2 computes
    the within-partition cumulative sum with an ordinary window keyed by
    the partition id (each task handles one range partition) and adds the
    broadcast prefix. Any range-boundary placement yields the same global
    cumsum, so the (sampled, run-varying) repartitionByRange boundaries
    never affect results — pinned by the partition-invariance test.

    `id_col` must be unique (it defines the concatenation order — ENFORCED
    with an explicit count-vs-distinct check, since a duplicate key would
    silently shift every later offset); token counts must be non-negative
    (asserted in-plan, inside a kept column so Catalyst cannot prune it).
    """
    if budget <= 0:
        raise ValueError(f"pack_sequences: budget must be > 0, got {budget}")
    spark = docs.sparkSession
    d = (
        docs.select(
            F.col(id_col),
            # the guard lives INSIDE the kept column: a separate assert
            # column would be pruned away by Catalyst and never evaluate
            F.when(
                F.col(tokens_col) >= 0, F.col(tokens_col).cast("long")
            )
            .otherwise(
                F.raise_error(F.lit("pack_sequences: negative token count"))
            )
            .alias(tokens_col),
        )
        .repartitionByRange(F.col(id_col))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)  # pin the partitioning: the totals
        # pass and the cumsum pass must see the SAME _pid assignment
    )
    chk = d.agg(
        F.count("*").alias("n"), F.count_distinct(F.col(id_col)).alias("u")
    ).first()
    if chk["n"] != chk["u"]:
        raise ValueError(
            f"pack_sequences: {id_col} must be unique "
            f"({chk['n'] - chk['u']} duplicates) — duplicate keys make the "
            "concatenation order, and therefore every offset, ambiguous"
        )
    totals = {
        r["_pid"]: r["t"]
        for r in d.groupBy("_pid").agg(F.sum(tokens_col).alias("t")).collect()
    }
    prefix, acc = {}, 0
    for pid in sorted(totals):
        prefix[pid] = acc
        acc += totals[pid]
    prefix_dim = spark.createDataFrame(
        [(pid, off) for pid, off in prefix.items()] or [(0, 0)],
        "_pid int, _prefix long",
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("_pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.col("_prefix") + F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    b = int(budget)
    return (
        d.join(F.broadcast(prefix_dim), "_pid")
        .withColumn("start_offset", start)
        .withColumn(
            "_endm1",
            F.col("start_offset") + F.greatest(F.col(tokens_col), F.lit(1)) - 1,
        )
        # `div` is exact integer division (float floor-divide would go
        # through doubles and lose exactness past 2^53-token streams)
        .select(
            id_col,
            tokens_col,
            "start_offset",
            F.expr(f"start_offset div {b}").alias("pack_first"),
            F.expr(f"_endm1 div {b}").alias("pack_last"),
        )
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (doc_id, chunk_idx, start_tok, n_chunk_tokens, chunk_text):
    each document's token stream split into windows of `chunk_tokens`
    tokens with `overlap` tokens of left context (stride = chunk_tokens -
    overlap) — the upstream of `pack_sequences` and the standard RAG /
    long-document preprocessing step. The last window may be shorter; an
    empty document yields zero chunks.

    Pure Catalyst (tokenize -> sequence of starts -> posexplode ->
    slice): zero shuffle at any scale, fan-out exactly
    ceil(n_tokens/stride) rows per doc, each bounded by chunk_tokens.
    Tokenization = textstats.tokens_col, so chunks compose with the
    quality/language/packing ops.
    """
    if chunk_tokens <= 0 or not (0 <= overlap < chunk_tokens):
        raise ValueError(
            "chunk_documents: need chunk_tokens > 0 and 0 <= overlap < "
            f"chunk_tokens, got chunk_tokens={chunk_tokens} overlap={overlap}"
        )
    from deeprank_spark.operators.textstats import tokens_col

    stride = chunk_tokens - overlap
    toks = tokens_col(F.col(text_col))
    d = (
        docs.select(F.col(id_col), toks.alias("_toks"))
        .withColumn("_n", F.size("_toks"))
        .where(F.col("_n") > 0)
        .select(
            id_col,
            "_toks",
            "_n",
            F.posexplode(
                F.sequence(F.lit(0), F.col("_n") - 1, F.lit(stride))
            ).alias("chunk_idx", "start_tok"),
        )
    )
    return d.select(
        id_col,
        "chunk_idx",
        "start_tok",
        F.least(
            F.lit(chunk_tokens), F.col("_n") - F.col("start_tok")
        ).alias("n_chunk_tokens"),
        F.concat_ws(
            " ", F.slice("_toks", F.col("start_tok") + 1, chunk_tokens)
        ).alias("chunk_text"),
    )


def dsir_logweights(
    docs: DataFrame,
    target_docs: DataFrame,
    n_buckets: int = 8192,
    k: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Data Selection with Importance Resampling (Xie et al. 2023) —
    hashed-bigram importance log-weights: per document,
    sum_b n_b(doc) * (ln p_target(b) - ln p_raw(b)), where the bucket
    distributions are add-k-smoothed hashed-bigram histograms of the
    target-domain sample vs the raw corpus. High logw = "looks like the
    target domain"; the resampling step is a caller-side Gumbel-top-k or
    threshold over logw. -> (doc_id, n_grams, logw); docs with <2 tokens
    get n_grams=0, NULL logw.

    The bucket hash is the md5-hex-prefix trick stratified_sample uses
    (identical integers in Spark and DuckDB, so the whole operator is
    SQL-mirrorable). Scale shape: bigram explode (pure expression) ->
    per-(doc,bucket) counts (map-side combined) -> ONE broadcast join
    against the n_buckets-row model table (two tiny aggs unioned) -> one
    per-doc sum. The model build is two passes over the exploded pairs;
    nothing driver-side.
    """
    from deeprank_spark.operators.lm import _bigram_pairs

    def bucket(col_w1, col_w2):
        return (
            F.conv(
                F.substring(F.md5(F.concat_ws(" ", col_w1, col_w2)), 1, 8),
                16,
                10,
            ).cast("long")
            % n_buckets
        )

    def bucketed(frame):
        return _bigram_pairs(frame, id_col, text_col).select(
            "__id", bucket(F.col("w1"), F.col("w2")).alias("b")
        )

    raw = bucketed(docs)
    tgt = bucketed(target_docs)
    # add-k-smoothed log-prob per bucket for both distributions; totals
    # ride the plan as broadcast 1-row frames
    rcnt = raw.groupBy("b").agg(F.count("*").alias("cr"))
    tcnt = tgt.groupBy("b").agg(F.count("*").alias("ct"))
    rtot = F.broadcast(raw.agg(F.count("*").alias("tr")))
    ttot = F.broadcast(tgt.agg(F.count("*").alias("tt")))
    model = (
        rcnt.join(tcnt, "b", "full")
        .crossJoin(rtot)
        .crossJoin(ttot)
        .select(
            "b",
            (
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(k))
                    / (F.col("tt") + F.lit(k) * F.lit(float(n_buckets)))
                )
                - F.log(
                    (F.coalesce(F.col("cr"), F.lit(0)) + F.lit(k))
                    / (F.col("tr") + F.lit(k) * F.lit(float(n_buckets)))
                )
            ).alias("llr"),
        )
    )
    per_doc = (
        raw.groupBy("__id", "b")
        .agg(F.count("*").alias("nb"))
        .join(F.broadcast(model), "b")
        .groupBy("__id")
        .agg(
            F.sum("nb").alias("n_grams"),
            F.sum(F.col("nb") * F.col("llr")).alias("logw"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("__id"))
        .join(per_doc, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
            F.col("logw"),
        )
    )


def dsir_resample(
    weights: DataFrame,
    n: int,
    temperature: float = 1.0,
    seed: str = "dsir",
    id_col: str = "doc_id",
    logw_col: str = "logw",
) -> DataFrame:
    """The resampling half of DSIR: draw n docs WITHOUT replacement with
    probability proportional to exp(logw / temperature), via the Gumbel
    top-k trick (key = logw/T + Gumbel noise; take the n largest keys —
    Vieira 2014). Noise is DETERMINISTIC: uniform from the md5-hex-prefix
    of (seed | doc id), so the draw reproduces across engines and runs
    (df.sample's partition-dependent RNG cannot). -> (doc_id, logw, key),
    the selected rows.

    Scale shape: map-only key computation; the selection is orderBy+limit,
    which Spark plans as TakeOrderedAndProject — a per-partition top-n
    plus a driver-side merge of n*P candidates, never a full sort shuffle.
    Rows with NULL logw (unscorable docs) are excluded.
    """
    if temperature <= 0:
        raise ValueError(f"dsir_resample: temperature must be > 0, got {temperature}")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit(seed), F.col(id_col).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(4294967297.0)  # (h+1)/(2^32+1): u strictly inside (0,1)
    key = F.col(logw_col) / F.lit(float(temperature)) - F.log(-F.log(u))
    return (
        weights.where(F.col(logw_col).isNotNull())
        .select(F.col(id_col), F.col(logw_col), key.alias("key"))
        .orderBy(F.desc("key"), F.col(id_col))
        .limit(n)
    )
