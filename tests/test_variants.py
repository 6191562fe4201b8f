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
