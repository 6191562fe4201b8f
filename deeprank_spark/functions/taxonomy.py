"""Deterministic mini-taxonomy: the WordNet dimension table.

The reference expands top SVO relations with WordNet holonym/meronym/
hypernym/hyponym links (extend_with_wn_links, /root/reference/textcrafts/
deepRank.py:602-629; query-side deep_talk/qpro.py:278-311), keeping only
related lemmas that occur in the document — "both ends occur in the
document" disambiguation (pdfs/logrank.txt:313-319).

WordNet isn't available here, so the engine ships a small deterministic
taxonomy over the synthetic-corpus vocabulary as a broadcast dimension
table `wn_rel(lemma, rel_type, related)` with rel_type ∈ {hyper, hypo,
holo, mero}. On a real cluster this table is precomputed once from WordNet
(or any KB) and broadcast — the join logic is identical, which is the
point: the expansion is a DIMENSION JOIN, not a per-row library call.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# lemma -> hypernym (is_a parent)
_HYPER = {
    "cat": "animal", "dog": "animal",
    "car": "vehicle",
    "engine": "machine", "cluster": "machine",
    "river": "waterway",
    "city": "place", "road": "place", "house": "place",
    "book": "document", "paper": "document",
    "noun": "word", "verb": "word", "keyword": "word", "token": "word",
    "sentence": "text", "summary": "text", "question": "text",
    "answer": "text", "document": "text",
    "query": "plan", "join": "plan",
    "vertex": "node", "edge": "link",
    "table": "furniture", "mat": "furniture",
    "spark": "system", "driver": "system", "executor": "system",
}

# part -> whole (part_of); a lemma may carry multiple holonyms, so this is
# a tuple list, not a dict (a dict silently dropped node->graph behind
# node->cluster).
_HOLO = [
    ("wheel", "car"), ("door", "house"), ("seat", "car"),
    ("edge", "graph"), ("vertex", "graph"), ("node", "graph"),
    ("word", "sentence"), ("sentence", "document"), ("turn", "document"),
    ("partition", "table"), ("column", "table"), ("row", "table"),
    ("executor", "cluster"), ("node", "cluster"),
    ("battery", "car"), ("screen", "car"),
    ("key", "map"), ("value", "map"),
]
assert len(set(_HOLO)) == len(_HOLO), "duplicate (part, whole) pair in _HOLO"


def taxonomy_rows() -> list[tuple[str, str, str]]:
    rows = []
    for child, parent in sorted(_HYPER.items()):
        rows.append((child, "hyper", parent))   # child is_a parent
        rows.append((parent, "hypo", child))    # parent has-kind child
    for part, whole in sorted(_HOLO):
        rows.append((part, "holo", whole))      # part part_of whole
        rows.append((whole, "mero", part))      # whole has-part part
    assert len(set(rows)) == len(rows), "taxonomy_rows dropped an entry"
    return rows


def wn_rel_table(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        taxonomy_rows(), "lemma string, rel_type string, related string"
    )
