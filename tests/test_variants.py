"""F9 word-variant generation vs a direct pure-python port of the
reference's enumeration (qpro.pro:287-317): lexical variants {W, lower,
Capitalized, stem(lower)} + for len>4 all single-char deletions and
adjacent transpositions of W and lower(W)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deeprank_spark.functions.variants import word_variants_col


def _stem_py(w: str) -> str:
    if w.endswith("sses"):
        return w[:-2]
    if w.endswith("ies"):
        return w[:-2]
    if w.endswith("ing") and len(w) > 5:
        return w[:-3]
    if w.endswith("ed") and len(w) > 4:
        return w[:-2]
    if w.endswith("s") and not w.endswith("ss") and len(w) > 3:
        return w[:-1]
    return w


def _variants_py(w: str) -> list[str]:
    low = w.lower()
    cap = w[:1].upper() + w[1:]
    out = {w, low, cap, _stem_py(low)}
    if len(w) >= 5:
        for v in (w, low):
            for i in range(len(v)):
                out.add(v[:i] + v[i + 1:])
            for i in range(len(v) - 1):
                out.add(v[:i] + v[i + 1] + v[i] + v[i + 2:])
    return sorted(out)


WORDS = [
    "spark", "Sparks", "a", "ab", "data", "Query", "running",
    "processed", "cluster", "miXedCase", "stress", "ss", "parties",
]


def test_word_variants_match_reference_port(spark):
    df = spark.createDataFrame([(w,) for w in WORDS], "word string")
    got = {
        r["word"]: r["vs"]
        for r in df.select(
            "word", word_variants_col(F.col("word")).alias("vs")
        ).collect()
    }
    for w in WORDS:
        assert got[w] == _variants_py(w), w


def test_misspellings_only_for_long_words(spark):
    df = spark.createDataFrame([("dog",), ("dogs",)], "word string")
    got = {
        r["word"]: r["vs"]
        for r in df.select(
            "word", word_variants_col(F.col("word")).alias("vs")
        ).collect()
    }
    # len < 5: lexical variants only
    assert got["dog"] == sorted({"dog", "Dog"})
    assert got["dogs"] == sorted({"dogs", "Dogs", "dog"})


# ---------------------------------------------------------------------------
# Porter stemmer (round 3 — real stemmer behind F9's snowball slot)
# ---------------------------------------------------------------------------

# the 1980 paper's per-step example set (+ the canonical implementation's
# documented LOGI->LOG departure)
PORTER_VECTORS = {
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing",
    "conflated": "conflat", "troubled": "troubl", "sized": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall", "hissing": "hiss",
    "fizzed": "fizz", "failing": "fail", "filing": "file",
    "happy": "happi", "sky": "sky",
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic", "differentli": "differ",
    "vileli": "vile", "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit", "sensibiliti": "sensibl",
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good", "revival": "reviv", "allowance": "allow",
    "inference": "infer", "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust", "dependent": "depend",
    "adoption": "adopt", "homologou": "homolog", "communism": "commun",
    "activate": "activ", "angulariti": "angular", "homologi": "homolog",
    "effective": "effect", "bowdlerize": "bowdler", "probate": "probat",
    "rate": "rate", "cease": "ceas", "controll": "control", "roll": "roll",
}


def test_porter_paper_vectors():
    from deeprank_spark.functions.porter import porter_stem

    bad = {
        w: (porter_stem(w), e)
        for w, e in PORTER_VECTORS.items()
        if porter_stem(w) != e
    }
    assert not bad, bad


def test_porter_idempotent_and_safe():
    from deeprank_spark.functions.porter import porter_stem

    for w in PORTER_VECTORS:
        s = porter_stem(w)
        assert porter_stem(s) == porter_stem(porter_stem(s))  # stable
        assert s  # never empties a word
    for w in ("a", "be", "it", ""):
        assert porter_stem(w) == w  # short words unchanged


def test_porter_stems_query(spark):
    # The contract row uses Porter2 (the exact snowball-english algorithm
    # the reference calls) since round 5 — see tests/test_porter2.py for
    # the rule-branch vectors.
    import __spark_entry__ as e
    from deeprank_spark.functions.porter2 import porter2_stem

    rows = e.q_porter_stems(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 20  # sf0.001's 5 sampled docs have a small vocabulary
    for r in rows:
        assert r["stem"] == porter2_stem(r["word"].lower()), r


# ---------------------------------------------------------------------------
# Snowball-slot variants (round 5 — reference-exact stem dimension table)
# ---------------------------------------------------------------------------


def _variants_snowball_py(w: str) -> list[str]:
    """qpro.pro:287-317 with the REAL snowball slot (Porter2)."""
    from deeprank_spark.functions.porter2 import porter2_stem

    low = w.lower()
    cap = w[:1].upper() + w[1:]
    out = {w, low, cap, porter2_stem(low)}
    if len(w) >= 5:
        for v in (w, low):
            for i in range(len(v)):
                out.add(v[:i] + v[i + 1:])
            for i in range(len(v) - 1):
                out.add(v[:i] + v[i + 1] + v[i] + v[i + 2:])
    return sorted(out)


def test_word_variants_snowball_matches_reference_port(spark):
    from deeprank_spark.functions.variants import word_variants_snowball

    # include words where Porter2 differs from both the light stripper
    # and classic Porter (generate, dying, skies), plus duplicates to
    # prove the dimension-table join preserves input multiplicity
    words = WORDS + ["generate", "Dying", "skies", "communism", "spark"]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = (
        word_variants_snowball(df)
        .groupBy("word")
        .agg(F.sort_array(F.collect_set("variant")).alias("vs"))
        .collect()
    )
    by_word = {r["word"]: r["vs"] for r in got}
    for w in set(words):
        assert by_word[w] == _variants_snowball_py(w), w
    # multiplicity: 'spark' appears twice in the input, so its exploded
    # variants appear twice each
    n = (
        word_variants_snowball(df)
        .where(F.col("word") == "spark")
        .count()
    )
    assert n == 2 * len(_variants_snowball_py("spark"))


def test_word_variants_snowball_keeps_null_rows(spark):
    """Regression (round-5 review): the stem dimension join is null-safe —
    a NULL word keeps its row in both stem-slot modes."""
    from deeprank_spark.functions.variants import (
        word_variants,
        word_variants_snowball,
    )

    df = spark.createDataFrame([("spark",), (None,)], "word string")
    assert word_variants_snowball(df).count() == word_variants(df).count()
    null_rows = (
        word_variants_snowball(df).where(F.col("word").isNull()).collect()
    )
    assert len(null_rows) == 1 and null_rows[0]["variant"] is None
