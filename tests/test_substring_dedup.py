"""Exact substring-duplication spans (Lee et al. 2021 ExactSubstr, fixed
granularity k) — differential tests vs a pure-python suffix-scan oracle."""

import random
import re
from collections import defaultdict

from deeprank_spark.operators.dedup import (
    duplicated_ngram_spans,
    duplicated_span_stats,
)


def _norm(t):
    return re.sub(r"\s+", " ", t).strip().lower()


def _oracle_spans(rows, k, min_count=2, min_docs=2):
    toks = {d: _norm(t).split(" ") for d, t in rows}
    occ = defaultdict(list)
    for d, ts in toks.items():
        if len(ts) < k:
            continue
        for i in range(len(ts) - k + 1):
            occ[tuple(ts[i : i + k])].append((d, i))
    hits = defaultdict(list)
    for g, lst in occ.items():
        if len(lst) >= min_count and len({d for d, _ in lst}) >= min_docs:
            for d, p in lst:
                hits[d].append(p)
    spans = []
    for d, ps in hits.items():
        ps.sort()
        start = prev = ps[0]
        n = 1
        for p in ps[1:]:
            if p - prev > k:
                spans.append((d, start, prev + k, n))
                start, n = p, 0
            prev = p
            n += 1
        spans.append((d, start, prev + k, n))
    return sorted(spans)


def _spark_spans(spark, rows, k, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = duplicated_ngram_spans(df, k=k, **kw).collect()
    return sorted((r.doc_id, r.start_tok, r.end_tok, r.n_kgrams) for r in out)


def test_handbuilt_merge_and_split(spark):
    # docs 1 and 2 share an 8-token sentence (spans merge across overlapping
    # k-gram hits); doc 3 shares only the first 5 tokens of it, then
    # diverges; doc 4 is all-unique.
    shared = "alpha bravo charlie delta echo foxtrot golf hotel"
    rows = [
        (1, f"one two {shared} three four"),
        (2, f"{shared} nine ten eleven twelve"),
        (3, "alpha bravo charlie delta echo zulu yankee xray whiskey"),
        (4, "uno dos tres cuatro cinco seis siete ocho nueve"),
    ]
    k = 5
    got = _spark_spans(spark, rows, k)
    assert got == _oracle_spans(rows, k)
    # doc 4 has no duplicated span at all
    assert not any(d == 4 for d, *_ in got)
    # doc 1's span covers exactly the shared sentence's k-gram hits:
    # tokens 2..9 inclusive -> [2, 10), merged from 4 overlapping 5-grams
    assert (1, 2, 10, 4) in got


def test_gap_splits_spans(spark):
    # the same 5 duplicated tokens appear twice in doc 1, separated by a
    # unique stretch longer than k -> TWO maximal spans, not one.
    dup = "red orange yellow green blue"
    rows = [
        (1, f"{dup} q1 q2 q3 q4 q5 q6 q7 {dup}"),
        (2, f"start {dup} end padder words here now"),
    ]
    k = 5
    got = _spark_spans(spark, rows, k, min_docs=1)
    assert got == _oracle_spans(rows, k, min_docs=1)
    assert len([s for s in got if s[0] == 1]) == 2


def test_min_docs_gates_within_doc_repetition(spark):
    # a phrase repeated only WITHIN one doc: counted when min_docs=1,
    # invisible when min_docs=2.
    rep = "la la la la la"
    rows = [
        (1, f"{rep} unique middle tokens here {rep}"),
        (2, "completely different words that never repeat at all okay"),
    ]
    k = 5
    assert _spark_spans(spark, rows, k, min_docs=1) == _oracle_spans(
        rows, k, min_docs=1
    )
    assert _spark_spans(spark, rows, k, min_docs=2) == []


def test_randomized_differential(spark):
    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(30)]
    boiler = " ".join(rng.choice(vocab) for _ in range(12))
    rows = []
    for d in range(40):
        words = [rng.choice(vocab) for _ in range(rng.randint(3, 60))]
        if d % 3 == 0:  # a third of docs carry the boilerplate block
            at = rng.randint(0, len(words))
            words[at:at] = boiler.split(" ")
        rows.append((d, " ".join(words)))
    for k in (3, 5):
        assert _spark_spans(spark, rows, k) == _oracle_spans(rows, k)


def test_span_stats(spark):
    shared = "alpha bravo charlie delta echo foxtrot"
    rows = [
        (1, f"{shared} tail1 tail2 tail3 tail4"),
        (2, f"head1 head2 {shared}"),
        (3, "nothing shared in this document at all whatsoever"),
    ]
    k = 5
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.dup_tokens, r.dup_frac)
        for r in duplicated_span_stats(df, k=k).collect()
    }
    # doc 1: 10 tokens, shared block = tokens 0..5 -> 6 dup tokens
    assert got[1] == (10, 6, 0.6)
    assert got[2] == (8, 6, 0.75)
    assert got[3] == (8, 0, 0.0)


def test_short_docs_have_no_spans(spark):
    rows = [(1, "a b c"), (2, "a b c"), (3, "a b c d e f"), (4, "a b c d e f")]
    # k=5: docs 1-2 are shorter than k and must be silently span-free even
    # though they are exact duplicates of each other; docs 3-4 share a
    # full-doc span.
    got = _spark_spans(spark, rows, 5)
    assert got == _oracle_spans(rows, 5)
    assert {d for d, *_ in got} == {3, 4}
