"""Corpus curation ops vs pure-python oracles — exact gates."""

import hashlib
import re

import pytest

from deeprank_spark.operators.corpus import (
    decontaminate,
    repetition_score,
    stratified_sample,
)

DOCS = [
    (1, "the cat sat on the mat and the cat sat again", "a"),
    (2, "the cat sat on the mat", "a"),
    (3, "completely different words entirely here now", "b"),
    (4, "short", "b"),
    (5, "", "b"),
    (6, "repeat repeat repeat repeat repeat repeat", "c"),
    (7, "The CAT sat, on the MAT!", "c"),  # case/punct-normalized overlap
]


def _toks(text):
    return [t for t in re.split(r"[^a-z0-9']+", text.lower()) if t]


def _ngrams(text, n):
    t = _toks(text)
    return [" ".join(t[i : i + n]) for i in range(len(t) - n + 1)]


def _sdf(spark, rows=DOCS):
    return spark.createDataFrame(rows, "doc_id long, text string, src string")


@pytest.mark.parametrize("n", [2, 3])
def test_repetition_score(spark, n):
    got = {
        r["doc_id"]: (r["n_ngrams"], r["n_distinct"], r["dup_frac"])
        for r in repetition_score(_sdf(spark), n=n).collect()
    }
    for doc_id, text, _ in DOCS:
        g = _ngrams(text, n)
        # docs shorter than n tokens carry no repetition evidence -> 0.0
        exp_frac = (1.0 - len(set(g)) / len(g)) if g else 0.0
        assert got[doc_id][0] == len(g), doc_id
        assert got[doc_id][1] == len(set(g)), doc_id
        assert abs(got[doc_id][2] - exp_frac) < 1e-12, doc_id


@pytest.mark.parametrize("n", [2, 3])
def test_decontaminate(spark, n):
    docs = _sdf(spark, [d for d in DOCS if d[0] % 2 == 1])
    bench = _sdf(spark, [d for d in DOCS if d[0] % 2 == 0])
    got = {
        r["doc_id"]: r["n_hits"]
        for r in decontaminate(docs, bench, n=n).collect()
    }
    bench_grams = set()
    for doc_id, text, _ in DOCS:
        if doc_id % 2 == 0:
            bench_grams.update(_ngrams(text, n))
    exp = {}
    for doc_id, text, _ in DOCS:
        if doc_id % 2 == 1:
            hits = len(set(_ngrams(text, n)) & bench_grams)
            if hits:
                exp[doc_id] = hits
    assert got == exp


def test_stratified_sample_matches_python_rule(spark):
    rates = {"a": 1.0, "b": 0.5, "c": 0.0}
    got = {
        r["doc_id"]
        for r in stratified_sample(
            _sdf(spark), rates, stratum_col="src", id_col="doc_id"
        ).collect()
    }
    exp = set()
    for doc_id, _, src in DOCS:
        rate = rates[src]
        h = hashlib.md5(str(doc_id).encode()).hexdigest()[:4]
        thr = "g" if rate >= 1.0 else f"{int(rate * 65536):04x}"
        if h < thr:
            exp.add(doc_id)
    assert got == exp
    # stratum 'a' fully kept, 'c' fully dropped
    assert all(d in got for d, _, s in DOCS if s == "a")
    assert all(d not in got for d, _, s in DOCS if s == "c")


def test_stratified_sample_default_rate(spark):
    got = stratified_sample(
        _sdf(spark), {"a": 1.0}, stratum_col="src", id_col="doc_id"
    ).collect()
    assert {r["src"] for r in got} == {"a"}


# ---------------------------------------------------------------------------
# concat-and-cut sequence packing (round 5)
# ---------------------------------------------------------------------------


def _pack_oracle(rows, budget):
    """Pure-python concat-and-cut: global token stream in id order."""
    out = {}
    acc = 0
    for doc_id, n in sorted(rows):
        endm1 = acc + max(n, 1) - 1
        out[doc_id] = (n, acc, acc // budget, endm1 // budget)
        acc += n
    return out


def test_pack_sequences_matches_oracle_and_duckdb(spark):
    import random

    import duckdb

    from deeprank_spark.operators.corpus import pack_sequences

    rng = random.Random(11)
    # zero-token docs, docs larger than the budget, budget-aligned sizes
    rows = [(i, rng.choice([0, 1, 3, 7, 8, 13, 25])) for i in range(200)]
    budget = 8
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["start_offset"], r["pack_first"], r["pack_last"]
        )
        for r in pack_sequences(df, budget).collect()
    }
    assert got == _pack_oracle(rows, budget)

    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id BIGINT, n_tokens BIGINT)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    drows = con.execute(
        """
        WITH c AS (
          SELECT doc_id, n_tokens,
                 COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS start_offset
          FROM docs)
        SELECT doc_id, n_tokens, start_offset,
               start_offset // 8 AS pack_first,
               (start_offset + GREATEST(n_tokens, 1) - 1) // 8 AS pack_last
        FROM c
        """
    ).fetchall()
    assert {r[0]: tuple(r[1:]) for r in drows} == got


def test_pack_sequences_partition_invariant(spark):
    """The two-pass parallel prefix must give the same global offsets for
    ANY incoming layout (range boundaries are sampled per run)."""
    from deeprank_spark.operators.corpus import pack_sequences

    rows = [(i, (i * 13) % 11) for i in range(300)]
    base = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    ref = None
    for parts in (1, 7, 32):
        got = sorted(
            tuple(r) for r in pack_sequences(base.repartition(parts), 16).collect()
        )
        if ref is None:
            ref = got
        assert got == ref, f"parts={parts}"
    assert ref == sorted(
        (d, n, s, pf, pl)
        for d, (n, s, pf, pl) in _pack_oracle(rows, 16).items()
    )


def test_pack_sequences_validation(spark):
    import pytest as _pytest

    from deeprank_spark.operators.corpus import pack_sequences

    df = spark.createDataFrame([(1, 5)], "doc_id long, n_tokens long")
    with _pytest.raises(ValueError, match="budget"):
        pack_sequences(df, 0)
    bad = spark.createDataFrame([(1, -2)], "doc_id long, n_tokens long")
    with _pytest.raises(Exception, match="negative token count"):
        pack_sequences(bad, 8).collect()


# ---------------------------------------------------------------------------
# token-window document chunking (round 5)
# ---------------------------------------------------------------------------


def _chunk_oracle(rows, chunk, overlap):
    """Pure-python chunker over the shared tokenization."""
    stride = chunk - overlap
    out = []
    for doc_id, text in rows:
        toks = [t for t in re.split(r"[^a-z0-9']+", text.lower()) if t]
        for idx, start in enumerate(range(0, len(toks), stride)):
            piece = toks[start:start + chunk]
            out.append((doc_id, idx, start, len(piece), " ".join(piece)))
    return sorted(out)


def test_chunk_documents_matches_oracle_and_duckdb(spark):
    import duckdb

    from deeprank_spark.operators.corpus import chunk_documents

    rows = [
        (1, "the cat sat on the mat and the cat sat again today"),
        (2, "short"),
        (3, ""),                      # empty -> zero chunks
        (4, "  ,,  !!  "),            # tokenizes empty -> zero chunks
        (5, "a b c d e f g h i j k l m n o p"),
        (6, "Tie-BREAK punct: don't stop-words 123 mix"),
    ]
    chunk, overlap = 5, 2
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["chunk_idx"], r["start_tok"],
         r["n_chunk_tokens"], r["chunk_text"])
        for r in chunk_documents(df, chunk, overlap).collect()
    )
    assert got == _chunk_oracle(rows, chunk, overlap)

    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    drows = con.execute(
        """
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'),
                             x -> length(x) > 0) AS toks
          FROM docs),
        s AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
        u AS (SELECT doc_id, toks, n,
                     unnest(range(0, n, 3)) AS start_tok
              FROM s)
        SELECT doc_id,
               CAST(start_tok / 3 AS INT) AS chunk_idx,
               start_tok,
               LEAST(5, n - start_tok) AS n_chunk_tokens,
               array_to_string(toks[start_tok + 1 : start_tok + 5], ' ')
                 AS chunk_text
        FROM u
        """
    ).fetchall()
    assert sorted(tuple(r) for r in drows) == got


def test_chunk_documents_no_overlap_covers_stream(spark):
    from deeprank_spark.operators.corpus import chunk_documents

    text = " ".join(f"w{i}" for i in range(23))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    chunks = sorted(
        (r["chunk_idx"], r["n_chunk_tokens"], r["chunk_text"])
        for r in chunk_documents(df, 8).collect()
    )
    # disjoint cover: 8 + 8 + 7 tokens, concatenation reproduces the doc
    assert [c[1] for c in chunks] == [8, 8, 7]
    assert " ".join(c[2] for c in chunks) == text


def test_chunk_documents_validation(spark):
    from deeprank_spark.operators.corpus import chunk_documents

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="chunk_tokens"):
        chunk_documents(df, 0)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, 4, overlap=4)


def test_pack_and_chunk_compose_with_token_counts(spark):
    """Real-table integration: textstats.token_counts feeds pack_sequences
    directly, and chunk token counts re-add to each doc's token count."""
    from pyspark.sql import functions as F

    from deeprank_spark.operators.corpus import chunk_documents, pack_sequences
    from deeprank_spark.operators.textstats import token_counts

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    counts = token_counts(docs).select("doc_id", "n_tokens")
    packed = pack_sequences(counts, budget=512, tokens_col="n_tokens")
    total = counts.agg(F.sum("n_tokens")).first()[0]
    assert packed.count() == counts.count()
    last = packed.agg(F.max("pack_last")).first()[0]
    assert last == (total - 1) // 512
    # offsets tile the stream exactly: sorted starts == exclusive cumsum
    rows = sorted(
        (r["start_offset"], r["n_tokens"]) for r in packed.collect()
    )
    acc = 0
    for start, n in rows:
        assert start == acc
        acc += n
    assert acc == total

    # no-overlap chunks partition every doc's tokens
    per_doc = (
        chunk_documents(docs, 64)
        .groupBy("doc_id")
        .agg(F.sum("n_chunk_tokens").alias("t"))
    )
    joined = counts.join(per_doc, "doc_id", "left").select(
        "n_tokens", F.coalesce("t", F.lit(0)).alias("t")
    )
    assert joined.where("n_tokens != t").count() == 0


def test_pack_sequences_rejects_duplicate_ids(spark):
    from deeprank_spark.operators.corpus import pack_sequences

    df = spark.createDataFrame(
        [(1, 5), (2, 3), (1, 4)], "doc_id long, n_tokens long"
    )
    with pytest.raises(ValueError, match="must be unique"):
        pack_sequences(df, 8)
