"""TF-IDF term salience and DSIR importance-weight differentials:
pure-python mirrors plus DuckDB re-derivations over the shared parquet
fixtures (same compare the folded-relational suite uses)."""

import hashlib
import math
import os
import re

import duckdb

from deeprank_spark.operators.corpus import dsir_logweights
from deeprank_spark.operators.textstats import tfidf_terms, tfidf_top_terms

SF_DIR = os.environ.get("DEEPRANK_TEST_SF_DIR", "/root/testdata/sf0.001")


def _toks(text):
    return [t for t in re.split(r"[^a-z0-9']+", text.lower()) if t]


DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the log by the dog house"),
    (3, "cat cat dog"),
    (4, ""),
    (5, "entirely novel vocabulary here"),
]
TARGET = [(10, "cat sat mat cat sat"), (11, "the cat on the mat")]


def _py_tfidf(docs):
    tf, dfreq = {}, {}
    n = len({d for d, _ in docs})
    for d, text in docs:
        for t in _toks(text):
            tf[(d, t)] = tf.get((d, t), 0) + 1
    for (d, t) in tf:
        dfreq[t] = dfreq.get(t, 0) + 1
    return {
        (d, t): (c, dfreq[t], c * math.log(n / dfreq[t]))
        for (d, t), c in tf.items()
    }


def test_tfidf_matches_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        (r["doc_id"], r["term"]): (r["tf"], r["df"], r["tfidf"])
        for r in tfidf_terms(df).collect()
    }
    exp = _py_tfidf(DOCS)
    assert set(got) == set(exp)
    for key, (tf, dfq, w) in exp.items():
        gtf, gdf, gw = got[key]
        assert (gtf, gdf) == (tf, dfq)
        assert math.isclose(gw, w, rel_tol=0, abs_tol=1e-12)


def test_tfidf_top_terms_deterministic(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = tfidf_top_terms(df, k=2).collect()
    exp = _py_tfidf(DOCS)
    by_doc = {}
    for (d, t), (tf, dfq, w) in exp.items():
        by_doc.setdefault(d, []).append((-w, t))
    for d in by_doc:
        by_doc[d] = [t for _, t in sorted(by_doc[d])[:2]]
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], {})[r["rn"]] = r["term"]
    for d, terms in by_doc.items():
        assert [got[d][i + 1] for i in range(len(terms))] == terms


def test_tfidf_matches_duckdb_on_fixture(spark):
    import pyspark.sql.functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = tfidf_terms(docs).select(
        "doc_id", "term", "tf", "df", F.round("tfidf", 6).alias("tfidf")
    )
    srows = {tuple(r) for r in out.collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    drows = set(
        con.execute(
            "WITH toks AS (SELECT doc_id, UNNEST(list_filter("
            "string_split_regex(lower(text), '[^a-z0-9'']+'), "
            "x -> length(x) > 0)) AS term FROM documents), "
            "tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks "
            "GROUP BY doc_id, term), "
            "dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term), "
            "nn AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents) "
            "SELECT t.doc_id, t.term, t.tf, d.df, "
            "ROUND(t.tf * ln(CAST((SELECT n FROM nn) AS DOUBLE) / d.df), 6) "
            "FROM tf t JOIN dfq d USING (term)"
        ).fetchall()
    )
    assert len(srows) > 1000
    assert srows == drows


def _py_dsir(docs, target, n_buckets=64, k=0.5):
    def bucket(w1, w2):
        h = hashlib.md5(f"{w1} {w2}".encode()).hexdigest()[:8]
        return int(h, 16) % n_buckets

    def counts(corpus):
        c = {}
        tot = 0
        for _, text in corpus:
            t = _toks(text)
            for a, b in zip(t, t[1:]):
                c[bucket(a, b)] = c.get(bucket(a, b), 0) + 1
                tot += 1
        return c, tot

    cr, tr = counts(docs)
    ct, tt = counts(target)
    out = {}
    for d, text in docs:
        t = _toks(text)
        pairs = list(zip(t, t[1:]))
        if not pairs:
            out[d] = (0, None)
            continue
        lw = 0.0
        for a, b in pairs:
            bb = bucket(a, b)
            lw += math.log((ct.get(bb, 0) + k) / (tt + k * n_buckets)) - math.log(
                (cr.get(bb, 0) + k) / (tr + k * n_buckets)
            )
        out[d] = (len(pairs), lw)
    return out


def test_dsir_matches_python(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_grams"], r["logw"])
        for r in dsir_logweights(docs, tgt, n_buckets=64).collect()
    }
    exp = _py_dsir(DOCS, TARGET, n_buckets=64)
    assert set(got) == set(exp)
    for d, (n, lw) in exp.items():
        assert got[d][0] == n
        if lw is None:
            assert got[d][1] is None
        else:
            assert math.isclose(got[d][1], lw, rel_tol=0, abs_tol=1e-9)
    # target-like doc 1 ("the cat sat on the mat") must outrank the
    # out-of-domain doc 5
    assert got[1][1] > got[5][1]


def test_dsir_matches_duckdb_on_fixture(spark):
    import pyspark.sql.functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    tgt = docs.where(F.col("doc_id") % 7 == 0)
    out = dsir_logweights(docs, tgt, n_buckets=256).select(
        "doc_id", "n_grams", F.round("logw", 6).alias("logw")
    )
    srows = {tuple(r) for r in out.collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    toks = (
        "list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'), "
        "x -> length(x) > 0)"
    )
    B = 256
    # target = doc_id % 7 = 0, mirroring the Spark call above
    sql = (
        f"WITH toksd AS (SELECT doc_id, {toks} AS t FROM documents), "
        "pw AS (SELECT doc_id, "
        f"('0x' || substr(md5(t[i] || ' ' || t[i+1]), 1, 8))::BIGINT % {B} AS b "
        "FROM toksd, UNNEST(range(1, len(t))) AS r(i) WHERE len(t) >= 2), "
        "tw AS (SELECT * FROM pw WHERE doc_id % 7 = 0), "
        "rcnt AS (SELECT b, COUNT(*) AS cr FROM pw GROUP BY b), "
        "tcnt AS (SELECT b, COUNT(*) AS ct FROM tw GROUP BY b), "
        "rtot AS (SELECT COUNT(*) AS tr FROM pw), "
        "ttot AS (SELECT COUNT(*) AS tt FROM tw), "
        "model AS (SELECT COALESCE(r.b, t.b) AS b, "
        f"ln((COALESCE(t.ct, 0) + 0.5) / ((SELECT tt FROM ttot) + 0.5 * {B}.0)) - "
        f"ln((COALESCE(r.cr, 0) + 0.5) / ((SELECT tr FROM rtot) + 0.5 * {B}.0)) AS llr "
        "FROM rcnt r FULL JOIN tcnt t ON r.b = t.b), "
        "perdoc AS (SELECT p.doc_id, COUNT(*) AS n_grams, "
        "SUM(m.llr) AS logw FROM pw p JOIN model m ON p.b = m.b "
        "GROUP BY p.doc_id) "
        "SELECT d.doc_id, COALESCE(p.n_grams, 0), ROUND(p.logw, 6) "
        "FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id"
    )
    drows = set(con.execute(sql).fetchall())
    assert len(srows) == 500
    assert srows == drows


def _py_gumbel_key(doc_id, logw, temperature, seed="dsir"):
    h = int(hashlib.md5(f"{seed}|{doc_id}".encode()).hexdigest()[:8], 16)
    u = (h + 1) / 4294967297.0
    return logw / temperature - math.log(-math.log(u))


def test_dsir_resample_matches_python(spark):
    from deeprank_spark.operators.corpus import dsir_resample

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    w = dsir_logweights(docs, tgt, n_buckets=64)
    got = dsir_resample(w, n=3).collect()
    exp = _py_dsir(DOCS, TARGET, n_buckets=64)
    keys = sorted(
        (
            (-_py_gumbel_key(d, lw, 1.0), d)
            for d, (nn, lw) in exp.items()
            if lw is not None
        )
    )
    exp_ids = [d for _, d in keys[:3]]
    assert [r["doc_id"] for r in got] == exp_ids
    for r in got:
        assert math.isclose(
            r["key"],
            _py_gumbel_key(r["doc_id"], exp[r["doc_id"]][1], 1.0),
            rel_tol=0,
            abs_tol=1e-9,
        )


def test_dsir_resample_low_temperature_is_argmax(spark):
    from deeprank_spark.operators.corpus import dsir_resample

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    w = dsir_logweights(docs, tgt, n_buckets=64)
    exp = _py_dsir(DOCS, TARGET, n_buckets=64)
    best = max(
        (d for d, (_, lw) in exp.items() if lw is not None),
        key=lambda d: exp[d][1],
    )
    got = dsir_resample(w, n=1, temperature=1e-6).collect()
    assert got[0]["doc_id"] == best

    import pytest as _pytest

    with _pytest.raises(ValueError, match="temperature"):
        dsir_resample(w, n=1, temperature=0.0)


def test_approx_corpus_stats_bounds(spark):
    """Sketch accuracy vs exact aggregates on the fixture corpus: HLL++
    within 3*rsd of exact distinct; GK quantiles within rank error."""
    from deeprank_spark.operators.textstats import approx_corpus_stats

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    row = approx_corpus_stats(docs, rsd=0.02).collect()[0]

    import pyspark.sql.functions as F

    from deeprank_spark.operators.textstats import tokens_col

    exact_vocab = (
        docs.select(F.explode(tokens_col(F.col("text"))).alias("t"))
        .agg(F.countDistinct("t"))
        .collect()[0][0]
    )
    lens = sorted(
        r[0]
        for r in docs.select(F.size(tokens_col(F.col("text")))).collect()
    )
    assert row["n_docs"] == len(lens)
    assert row["total_tokens"] == sum(lens)
    assert abs(row["approx_distinct_tokens"] - exact_vocab) <= 0.06 * exact_vocab
    n = len(lens)
    for q, got in zip((0.5, 0.9, 0.99), row["len_quantiles"]):
        lo = lens[max(0, int((q - 0.01) * n) - 2)]
        hi = lens[min(n - 1, int((q + 0.01) * n) + 2)]
        assert lo <= got <= hi, (q, got, lo, hi)


def _py_winnow(text, k=5, w=4):
    t = _toks(text)
    hs = [
        int(hashlib.md5(" ".join(t[i : i + k]).encode()).hexdigest()[:15], 16)
        for i in range(len(t) - k + 1)
    ]
    if not hs:
        return set()
    wl = min(w, len(hs))
    sel = set()
    for j in range(len(hs) - wl + 1):
        wnd = hs[j : j + wl]
        mn = min(wnd)
        rpos = wl - 1 - wnd[::-1].index(mn)
        sel.add((j + rpos + 1, mn))
    return sel


def test_winnowing_matches_python(spark):
    import random as _random

    from deeprank_spark.operators.textstats import winnowing_fingerprints

    rng = _random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    docs = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 40))))
            for i in range(12)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = winnowing_fingerprints(df, k=3, w=4).collect()
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["h"]))
    for d, text in docs:
        assert got.get(d, set()) == _py_winnow(text, k=3, w=4), d


def test_winnowing_containment_guarantee(spark):
    # any shared run of >= w+k-1 tokens must share a selected hash
    from deeprank_spark.operators.textstats import winnowing_fingerprints

    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens = w+k-1 for k=3,w=4
    docs = [
        (1, "one two three " + shared + " four five"),
        (2, shared + " completely different tail here"),
        (3, "no overlap with anything else at all"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fp = {}
    for r in winnowing_fingerprints(df, k=3, w=4).collect():
        fp.setdefault(r["doc_id"], set()).add(r["h"])
    assert fp[1] & fp[2], "guaranteed shared fingerprint missing"
    assert not (fp[1] & fp[3])


def test_winnowing_matches_duckdb(spark):
    from deeprank_spark.operators.textstats import winnowing_fingerprints

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    srows = {tuple(r) for r in winnowing_fingerprints(docs, k=4, w=5).collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    toks = (
        "list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'), "
        "x -> length(x) > 0)"
    )
    sql = (
        f"WITH t AS (SELECT doc_id, {toks} AS tk FROM documents), "
        "hs AS (SELECT doc_id, CASE WHEN len(tk) >= 4 THEN "
        "list_transform(range(1, len(tk) - 2), i -> "
        "('0x' || substr(md5(array_to_string(list_slice(tk, i, i + 3), ' ')), 1, 15))::BIGINT) "
        "ELSE [] END AS h FROM t), "
        "sel AS (SELECT doc_id, list_transform("
        "range(1, len(h) - LEAST(5, len(h)) + 2), j -> {"
        "'pos': j + LEAST(5, len(h)) - list_position(list_reverse("
        "list_slice(h, j, j + LEAST(5, len(h)) - 1)), "
        "list_min(list_slice(h, j, j + LEAST(5, len(h)) - 1))), "
        "'h': list_min(list_slice(h, j, j + LEAST(5, len(h)) - 1))}) AS fps "
        "FROM hs WHERE len(h) > 0) "
        # DuckDB list_distinct can't take struct elements; dedup after
        # the unnest instead (same multiset as Spark's array_distinct)
        "SELECT DISTINCT doc_id, CAST(f.pos AS INT), f.h "
        "FROM sel, UNNEST(fps) AS u(f)"
    )
    drows = set(con.execute(sql).fetchall())
    assert len(srows) > 1000
    assert srows == drows
