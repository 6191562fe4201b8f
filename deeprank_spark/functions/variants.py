"""Word-variant generation (F9, reference qpro.pro:287-317).

`word_variant_of(W,V)` in the reference enumerates, per word:

- lexical variants (qpro.pro:296-306): W itself, lowercase(W),
  Capitalized(W), and the snowball stem of lowercase(W), sorted distinct;
- misspellings (qpro.pro:308-315), only for words longer than 4 chars:
  every single-character deletion and every adjacent-letter transposition,
  applied to W and (via the top-level disjunction, qpro.pro:288-293) to
  lowercase(W).

This module re-expresses the enumeration as ONE Catalyst array expression
(`word_variants_col`): higher-order `transform` over a position sequence
generates deletions/transpositions JVM-side — no UDF, no explode until the
caller wants one. Divergence (documented, SURVEY §2.8): the container has
no snowball library, so the stem slot uses the same deterministic suffix
stripper the tagger/lemmatizer family uses (`_stem_col`, a Porter-step-1
style rule chain); on a cluster the stem slot is swappable for a real
snowball dimension table without touching the enumeration.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MIN_MISSPELL_LEN = 5  # "only for long enough words", qpro.pro:310 (Len>4)


def _stem_col(w: Column) -> Column:
    """Deterministic light stemmer (Porter step-1 flavored), applied to a
    lowercase word: sses->ss, ies->i, trailing s (not ss), ing/ed with
    length guards mirroring nlp/simple_parser.lemma_of."""
    return (
        F.when(w.endswith("sses"), F.substring(w, 1, F.length(w) - 2))
        .when(w.endswith("ies"), F.substring(w, 1, F.length(w) - 2))
        .when(
            w.endswith("ing") & (F.length(w) > 5),
            F.substring(w, 1, F.length(w) - 3),
        )
        .when(
            w.endswith("ed") & (F.length(w) > 4),
            F.substring(w, 1, F.length(w) - 2),
        )
        .when(
            w.endswith("s") & ~w.endswith("ss") & (F.length(w) > 3),
            F.substring(w, 1, F.length(w) - 1),
        )
        .otherwise(w)
    )


def _deletions(w: Column) -> Column:
    """All single-character deletions of w (array<string>)."""
    return F.transform(
        F.sequence(F.lit(1), F.length(w)),
        lambda i: F.concat(
            F.substring(w, F.lit(1), i - 1),
            F.substr(w, i + 1, F.length(w)),
        ),
    )


def _transpositions(w: Column) -> Column:
    """All adjacent-letter transpositions of w (array<string>)."""
    return F.transform(
        F.sequence(F.lit(1), F.length(w) - 1),
        lambda i: F.concat(
            F.substring(w, F.lit(1), i - 1),
            F.substr(w, i + 1, F.lit(1)),
            F.substr(w, i, F.lit(1)),
            F.substr(w, i + 2, F.length(w)),
        ),
    )


def word_variants_col(w: Column) -> Column:
    """word_variant_of/2 as one array expression: sorted distinct variants
    (the Prolog `sort/2` on the lexical slice + set semantics overall)."""
    low = F.lower(w)
    # Capitalized = upper(first char of W) + rest of W UNCHANGED
    # (qpro.pro:300-302 operates on W's codes, not LowerW's)
    cap = F.concat(F.upper(F.substring(w, 1, 1)), F.substring(w, 2, 1 << 30))
    lex = F.array(w, low, cap, _stem_col(low))
    missp = F.when(
        F.length(w) >= MIN_MISSPELL_LEN,
        F.concat(
            _deletions(w), _transpositions(w), _deletions(low), _transpositions(low)
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_sort(F.array_distinct(F.concat(lex, missp)))


def word_variants(df: DataFrame, word_col: str = "word") -> DataFrame:
    """-> input columns + `variant` (exploded, distinct per word row)."""
    return df.withColumn(
        "variant", F.explode(word_variants_col(F.col(word_col)))
    )
