"""The three PINNED reference divergences (SURVEY §7 "reference quirks";
VERDICT r3 next-round #9: one explicit test per divergence so the declared
deltas stay declared through refactors). Each test simulates the REFERENCE
code's literal behavior in pure python next to our corrected operator, so
a regression in either direction fails loudly.

1. W5 short-yield  — bestWords (deepRank.py:504-516) increments its
   counter on EVERY scanned candidate, eligible or not, so ineligible
   high-rank candidates consume the k budget and it can yield < k words.
   Ours filters then limits: exactly min(k, #eligible).
2. W7 stop-at-gap  — runPagerank's length-adjust loop (deepRank.py:546-556)
   only advances its sentence index INSIDE `if i in d`, so the first
   sentence id missing from the rank dict freezes the index and no later
   sentence is ever adjusted. Ours joins by sent_id and adjusts every
   present sentence.
3. last-rel-wins   — the nx graph build (deepRank.py:373-386) stores rel
   as an edge attribute, later insertions overwriting earlier ones
   (insertion-order dependent). Our kernel projection drops rel entirely
   (graph_edges) — the kernels never read it — while the fact-DB edge
   table keeps ALL distinct (src, rel, dst) 5-tuples (edges_table),
   matching the reference's pre-graph edge SET (deepRank.py:368-370).
"""

import math

from pyspark.sql import functions as F

from deeprank_spark.operators.edges import edges_table, graph_edges
from deeprank_spark.operators.extract import adjusted_ranks, keywords


def test_w5_short_yield_divergence(spark):
    ranks = spark.createDataFrame(
        [
            ("c1", "W", "the", 0.9),    # stopword: ineligible
            ("c1", "W", "walk", 0.8),   # no noun part: ineligible
            ("c1", "W", "cat", 0.7),
            ("c1", "W", "mat", 0.6),
            ("c1", "W", "dog", 0.5),
        ],
        "conv_id string, kind string, key string, rank double",
    )
    noun_set = spark.createDataFrame(
        [("c1", "cat", 0), ("c1", "mat", 0), ("c1", "dog", 1)],
        "conv_id string, lemma string, first_sent int",
    )
    k = 3
    ours = [r["keyword"] for r in
            keywords(ranks, noun_set, k=k).orderBy(F.desc("rank")).collect()]
    assert ours == ["cat", "mat", "dog"], "corrected: exactly k eligible words"

    # reference simulation (deepRank.py:504-516): counter on every candidate
    nouns = {"cat", "mat", "dog"}
    stops = {"the"}
    ref_yield = []
    c = 0
    for w in ["the", "walk", "cat", "mat", "dog"]:  # rank-desc candidates
        if c >= k:
            break
        if w not in stops and w in nouns:
            ref_yield.append(w)
        c += 1
    assert ref_yield == ["cat"], "reference short-yields (1 < k=3) here"
    assert len(ours) == k > len(ref_yield), "divergence is real and declared"


def test_w7_stop_at_gap_divergence(spark):
    parsed = spark.createDataFrame(
        [
            ("c1", 0, ["a", "b", "c"]),
            ("c1", 1, ["d", "e"]),
            ("c1", 2, ["f", "g", "h", "i"]),
            ("c1", 3, ["j", "k", "l", "m", "n", "o"]),
        ],
        "conv_id string, sent_id int, words array<string>",
    )
    # sentence 2 absent from ranks (no edges reached it)
    ranks = spark.createDataFrame(
        [
            ("c1", "S", "0", 0.4),
            ("c1", "S", "1", 0.3),
            ("c1", "S", "3", 0.2),
            ("c1", "W", "cat", 0.1),
        ],
        "conv_id string, kind string, key string, rank double",
    )
    got = {
        (r["kind"], r["key"]): r["rank"]
        for r in adjusted_ranks(ranks, parsed).collect()
    }
    avg = (3 + 2 + 4 + 6) / 4.0

    def adj(r, length):
        return r / (1.0 + math.log(1.0 + abs(length - avg)))

    # ours adjusts EVERY present sentence, including the one past the gap
    assert abs(got[("S", "0")] - adj(0.4, 3)) < 1e-12
    assert abs(got[("S", "1")] - adj(0.3, 2)) < 1e-12
    assert abs(got[("S", "3")] - adj(0.2, 6)) < 1e-12
    assert got[("W", "cat")] == 0.1  # words untouched

    # reference simulation (deepRank.py:546-556): index freezes at the gap
    d = {0: 0.4, 1: 0.3, 3: 0.2}
    lens = [3, 2, 4, 6]
    i = 0
    for length in lens:
        if i in d:
            d[i] = adj(d[i], length)
            i += 1
    assert d[3] == 0.2, "reference leaves the post-gap sentence UNadjusted"
    assert abs(got[("S", "3")] - d[3]) > 1e-3, "divergence is real and declared"


def test_last_rel_wins_divergence(spark):
    multi = spark.createDataFrame(
        [
            ("c1", "W", "cat", "nsubj", "W", "sits", "NN", "VBZ", 0),
            ("c1", "W", "cat", "amod", "W", "sits", "NN", "VBZ", 1),
            ("c1", "W", "cat", "nsubj", "W", "sits", "NN", "VBZ", 1),
        ],
        "conv_id string, src_kind string, src string, rel string, "
        "dst_kind string, dst string, src_tag string, dst_tag string, "
        "sent_id int",
    )
    # fact-DB layer: BOTH distinct rels survive (reference's edge SET,
    # deepRank.py:368-370 — before the nx attribute overwrite)
    ed = edges_table(multi)
    rels = sorted(r["rel"] for r in ed.collect())
    assert rels == ["amod", "nsubj"]
    # kernel projection: rel dropped entirely, ONE graph edge — the
    # reference's insertion-order-dependent "last rel wins" attribute has
    # no counterpart because no kernel reads rel (declared delta)
    ge = graph_edges(ed)
    assert ge.count() == 1
    assert "rel" not in ge.columns
