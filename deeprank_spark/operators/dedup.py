"""Deduplication operators for large-scale training-data pipelines.

Not present in the reference (which dedups only edge tuples); these are the
first-class corpus-level operators a 100 TB text pipeline needs. All are
pure Catalyst expressions — hash-based, no Python UDFs — so they scale as
ordinary shuffles:

- exact_duplicates: md5(normalized text) groupBy. One shuffle on a 32-byte
  key; at 100 TB the groupBy is the textbook map-side-combine aggregation.
- minhash_signatures / minhash_lsh_pairs: shingle -> k independent min-hashes
  (md5 with per-hash salt; min over VARCHAR hex is engine-portable and
  deterministic) -> bands -> candidate pairs via band-bucket self-join.
  The band join is the only quadratic-risk step and is bounded per bucket.
- ngram_jaccard_pairs: exact Jaccard over character shingles for candidate
  verification (explode + pair-count / union-count).
- simhash64: 64-bit SimHash from token md5 bits (bit-vote via explode +
  aggregate on bit positions) with hamming_distance helper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def normalized_text(c) -> F.Column:
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (normalized) documents.

    -> (text_hash, n_docs, doc_ids array) for groups with n_docs > 1."""
    h = F.md5(normalized_text(F.col(text_col))).alias("text_hash")
    return (
        docs.select(h, F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.count("*").alias("n_docs"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
        .where(F.col("n_docs") > 1)
    )


def char_shingles(text_col, k: int = 8) -> F.Column:
    """Distinct k-character shingles of the normalized text (array column)."""
    t = normalized_text(text_col)
    n = F.greatest(F.length(t) - F.lit(k - 1), F.lit(1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: F.substring(t, i, k))
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_k: int = 8,
) -> DataFrame:
    """-> (doc_id, sig array<string>): sig[j] = min over shingles of
    md5(j || shingle). Hex-string min is deterministic and identical across
    engines (DuckDB oracle parity)."""
    sh = docs.select(
        F.col(id_col), char_shingles(F.col(text_col), shingle_k).alias("shingles")
    )
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda j: F.array_min(
            F.transform(
                F.col("shingles"),
                lambda s: F.md5(F.concat(j.cast("string"), F.lit("|"), s)),
            )
        ),
    )
    return sh.select(id_col, sig.alias("sig"))


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 8,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) sharing >=1 LSH band.

    bands must divide num_hashes; rows_per_band = num_hashes // bands.
    """
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    sigs = minhash_signatures(docs, id_col, text_col, num_hashes, shingle_k)
    banded = sigs.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.md5(
                    F.concat_ws("|", F.slice(F.col("sig"), b * rows + 1, rows))
                ),
            )
        ).alias("band", "bucket"),
    )
    a = banded.select("band", "bucket", F.col("id").alias("id_a"))
    b = banded.select("band", "bucket", F.col("id").alias("id_b"))
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 8,
    threshold: float = 0.5,
    candidates: DataFrame | None = None,
    exact: bool = False,
) -> DataFrame:
    """Exact Jaccard similarity over char shingles, >= threshold.

    Default path is PREFIX-FILTERED (Chaudhuri et al. SSJoin / Bayardo
    All-Pairs / PPJoin Lemma 1) and LOSSLESS: order each doc's shingles by
    ascending global frequency (ties by shingle), keep only the first
    n - ceil(t*n) + 1 as the doc's prefix; any pair with J >= t MUST share
    a prefix shingle (if the prefixes were disjoint, all >= ceil(t*n)
    common shingles would have to fit in a suffix of ceil(t*n)-1 — see
    module tests for the property check). The candidate join therefore
    runs on the RAREST shingles only: a shingle in f docs contributes f^2
    join rows, and hot stop-shingles are excluded from prefixes by the
    frequency ordering, so the join is skew-resistant by construction —
    unlike the `exact=True` path, which joins on EVERY shared shingle and
    is kept solely as a small-n differential verifier.

    Verification is exact Jaccard via array_intersect on the full shingle
    arrays, so the output is identical to the brute path for any input
    (no recall parameter to tune).

    `candidates(id_a, id_b)` overrides candidate generation entirely
    (e.g. minhash_lsh_pairs output for an approximate two-stage pipeline).
    -> (id_a, id_b, jaccard).
    """
    sets = docs.select(
        F.col(id_col).alias("id"),
        char_shingles(F.col(text_col), shingle_k).alias("shingles"),
    ).withColumn("n", F.size("shingles"))

    if exact and candidates is None:
        sh = sets.select("id", "n", F.explode("shingles").alias("s"))
        a = sh.select(F.col("id").alias("id_a"), F.col("n").alias("na"), "s")
        b = sh.select(F.col("id").alias("id_b"), F.col("n").alias("nb"), "s")
        inter = (
            a.join(b, "s")
            .where(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(
                F.count("*").alias("common"),
                F.first("na").alias("na"),
                F.first("nb").alias("nb"),
            )
        )
        return inter.select(
            "id_a",
            "id_b",
            (
                F.col("common")
                / (F.col("na") + F.col("nb") - F.col("common")).cast("double")
            ).alias("jaccard"),
        ).where(F.col("jaccard") >= threshold)

    if candidates is None:
        tok = sets.select("id", "n", F.explode("shingles").alias("s"))
        freq = tok.groupBy("s").agg(F.count("*").alias("df"))
        w = Window.partitionBy("id").orderBy("df", "s")
        # alpha = ceil(t*n) under EXACT arithmetic. The float product can
        # round ABOVE the true integer (0.28*25 = 7.000000000000001 ->
        # ceil 8, not 7), which would SHORTEN the prefix and silently drop
        # qualifying pairs; biasing down by epsilon keeps alpha exact for
        # near-integer products (float error ~1e-15 rel << 1e-9 << 1/n)
        # and a too-small alpha only lengthens the prefix (extra
        # candidates, never missed ones) — losslessness preserved.
        alpha = F.ceil(F.lit(float(threshold)) * F.col("n") - F.lit(1e-9)).cast("int")
        prefix_len = F.col("n") - F.greatest(alpha, F.lit(1)) + 1
        prefixes = (
            tok.join(freq, "s")
            .withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= prefix_len)
            .select("id", "s")
        )
        pa = prefixes.select(F.col("id").alias("id_a"), "s")
        pb = prefixes.select(F.col("id").alias("id_b"), "s")
        candidates = (
            pa.join(pb, "s")
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )

    a = sets.select(
        F.col("id").alias("id_a"), F.col("shingles").alias("sa"), F.col("n").alias("na")
    )
    b = sets.select(
        F.col("id").alias("id_b"), F.col("shingles").alias("sb"), F.col("n").alias("nb")
    )
    return (
        candidates.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("sa", "sb")).alias("common"),
            "na",
            "nb",
        )
        .select(
            "id_a",
            "id_b",
            (
                F.col("common")
                / (F.col("na") + F.col("nb") - F.col("common")).cast("double")
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def simhash64(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash over whitespace tokens.

    Each token hashes to 64 bits (first 16 hex chars of md5); bit b votes
    +1/-1; the sign vector packs into a signed 64-bit fingerprint.
    -> (doc_id, simhash long)."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.split(normalized_text(F.col(text_col)), " ")
        ).alias("tok"),
    ).where(F.length("tok") > 0)
    h = toks.select(
        "id", F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long").alias("h60")
    )
    # 60 usable bits (15 hex chars avoids signed-overflow in conv); vote per bit
    bits = h.select(
        "id",
        F.explode(F.sequence(F.lit(0), F.lit(59))).alias("bit"),
        F.col("h60"),
    ).select(
        "id",
        "bit",
        F.expr("CAST(shiftright(h60, CAST(bit AS INT)) & 1 AS INT)").alias("v"),
    )
    votes = bits.groupBy("id", "bit").agg(
        F.sum(F.when(F.col("v") == 1, 1).otherwise(-1)).alias("vote")
    )
    packed = votes.groupBy("id").agg(
        F.sum(
            F.when(
                F.col("vote") > 0,
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))"),
            ).otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
    )
    return packed.select(F.col("id").alias(id_col), "simhash")


def hamming_distance(a, b) -> F.Column:
    return F.bit_count(F.col(a).bitwiseXOR(F.col(b)))


def simhash_near_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    block_bits: int = 15,
) -> DataFrame:
    """Near-duplicate pairs by SimHash: block on 4 15-bit chunks (pigeonhole:
    any pair within hamming<=3 of 60 bits shares at least one of 4 chunks),
    verify hamming distance exactly."""
    s = simhash64(docs, id_col, text_col)
    mask = (1 << block_bits) - 1
    blocks = s.select(
        F.col(id_col).alias("id"),
        F.col("simhash"),
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("chunk_idx"),
    ).select(
        "id",
        "simhash",
        "chunk_idx",
        F.expr(
            f"shiftright(simhash, CAST(chunk_idx * {block_bits} AS INT)) & {mask}"
        ).alias("chunk"),
    )
    a = blocks.select("chunk_idx", "chunk", F.col("id").alias("id_a"), F.col("simhash").alias("ha"))
    b = blocks.select("chunk_idx", "chunk", F.col("id").alias("id_b"), F.col("simhash").alias("hb"))
    return (
        a.join(b, ["chunk_idx", "chunk"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming_distance("ha", "hb").alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


def duplicated_ngram_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_count: int = 2,
    min_docs: int = 2,
) -> DataFrame:
    """Maximal duplicated-substring spans, the exact-substring dedup step of
    Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
    Better", arXiv:2107.06499) re-expressed shuffle-first: their suffix-array
    formulation is single-machine; the distributed equivalent for fixed
    granularity k is "every k-token window whose k-gram occurs >= min_count
    times corpus-wide (in >= min_docs distinct docs) is duplicated", and
    maximal duplicated spans are the k-gram hits merged by the
    gaps-and-islands rule (two hits at p1 < p2 overlap-or-touch iff
    p2 - p1 <= k).

    Plan shape at 100 TB: tokenize + windowed k-gram hashing are pure
    per-row expressions (no shuffle); the frequency table is one
    map-side-combined groupBy on a 32-byte hash; the hit join is a LEFT SEMI
    on the same hash (stop-phrase k-grams are hot keys — AQE skew-join
    splits those partitions; the semi-join carries no payload to amplify);
    the islands merge is one window per doc. Nothing is quadratic and no
    suffix array has to fit anywhere.

    -> (doc_id, start_tok, end_tok, n_kgrams): token offsets, end exclusive,
    one row per maximal duplicated span. Docs shorter than k tokens have no
    spans by construction.
    """
    toks = docs.select(
        F.col(id_col),
        F.split(normalized_text(F.col(text_col)), " ").alias("toks"),
    ).where(F.size("toks") >= k)
    # (doc, pos, kgram-hash) for every k-token window; sequence guard above
    # keeps sequence() ascending (start > stop would generate a DESCENDING
    # sequence, not an empty one).
    kg = toks.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - F.lit(k - 1)),
                lambda i: F.md5(F.concat_ws(" ", F.slice("toks", i, k))),
            )
        ).alias("pos", "g"),
    )
    dup = (
        kg.groupBy("g")
        .agg(F.count("*").alias("cnt"), F.count_distinct(id_col).alias("ndocs"))
        .where((F.col("cnt") >= min_count) & (F.col("ndocs") >= min_docs))
        .select("g")
    )
    hits = kg.join(dup, "g", "left_semi").select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    grp = F.sum(
        F.when(F.col("pos") - F.lag("pos", 1).over(w) > k, 1).otherwise(0)
    ).over(w)
    return (
        hits.withColumn("grp", grp)
        .groupBy(id_col, "grp")
        .agg(
            F.min("pos").alias("start_tok"),
            (F.max("pos") + F.lit(k)).alias("end_tok"),
            F.count("*").alias("n_kgrams"),
        )
        .select(id_col, "start_tok", "end_tok", "n_kgrams")
    )


def duplicated_span_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_count: int = 2,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document boilerplate signal: what fraction of a doc's tokens sit
    inside corpus-duplicated spans (the filter-threshold statistic of the
    exact-substring dedup pipeline). -> (doc_id, n_tokens, dup_tokens,
    dup_frac); docs with no duplicated span report 0/0.0."""
    spans = duplicated_ngram_spans(docs, id_col, text_col, k, min_count, min_docs)
    per_doc = spans.groupBy(id_col).agg(
        F.sum(F.col("end_tok") - F.col("start_tok")).alias("dup_tokens")
    )
    lens = docs.select(
        F.col(id_col),
        F.size(F.split(normalized_text(F.col(text_col)), " ")).alias("n_tokens"),
    )
    return (
        lens.join(per_doc, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
            (
                F.coalesce("dup_tokens", F.lit(0))
                / F.col("n_tokens").cast("double")
            ).alias("dup_frac"),
        )
    )


def near_dup_clusters(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_k: int = 8,
) -> DataFrame:
    """Near-duplicate CLUSTERS: MinHash-LSH candidate pairs closed under
    transitivity (connected components over the pair graph), one canonical
    document per cluster — the standard training-corpus dedup step
    (candidates -> group -> keep one). Documents with no near-dup are their
    own singleton cluster.

    -> (doc_id, cluster_id, is_canonical) with cluster_id = the smallest
    doc id in the cluster (hash-min component labels ARE min ids, so the
    canonical pick is free). Composes two already-scale-shaped pieces:
    the banded LSH self-join (no all-pairs) and the O(log n)-round
    pointer-jumping component kernel.
    """
    from .components import components_distributed

    pairs = minhash_lsh_pairs(
        docs, id_col, text_col, num_hashes=num_hashes, bands=bands,
        shingle_k=shingle_k,
    )
    comp = components_distributed(pairs, id_cols=("id_a", "id_b")).select(
        F.col("id").alias(id_col), F.col("component").alias("cluster_id")
    )
    return (
        docs.select(id_col)
        .join(comp, id_col, "left")
        .select(
            id_col,
            F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
        )
        .withColumn("is_canonical", F.col(id_col) == F.col("cluster_id"))
    )
