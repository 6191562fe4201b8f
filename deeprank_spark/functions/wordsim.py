"""wup + overlap word-similarity scorer (the reference's sim.py).

Reference: /root/reference/textcrafts/sim.py:9-54 — `is_similar(u,Pu,v,Pv)`
averages two scores and thresholds at 0.7:

- sim2 (wup): max Wu-Palmer similarity over synset pairs,
  wup = 2*depth(lcs) / (depth(a) + depth(b));
- sim1 (overlap): sigmoid(|N(u) ∩ M(v)|) where N(u) = synsets(u) ∪
  hypernyms ∪ hyponyms and M(v) = synsets(v) ∪ hypernyms ONLY (the
  reference comments out v's hyponyms at sim.py:46 — the asymmetry is
  preserved here deliberately), 0 when the overlap is empty.

Consumed by the query-side expansion (deep_talk/qpro.py:264-274
sims_to_prolog -> qpro.pro:91-95: expanded term rank = R_query * rank(W)).

WordNet is unavailable in this environment, so the scorer runs over the
shipped deterministic taxonomy (functions/taxonomy.py): each lemma is its
own single-node "synset", hypernyms/hyponyms come from the _HYPER tree,
and an implicit root above all tree roots plays WordNet's simulated root
so the LCS always exists. On a real cluster the same table is precomputed
once from WordNet and broadcast — the engine-side consumption (a broadcast
dimension join, never a per-row library call) is identical, which is the
architectural point.
"""

from __future__ import annotations

import math
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession

from .taxonomy import _HYPER

_ROOT = "\x00root"  # implicit WordNet-style simulated root (depth 1)

SIM_THRESHOLD = 0.7  # sim.py:16


def sigmoid(x: float) -> float:
    return 1.0 / (1.0 + math.exp(-x))


def _parents(lemma: str) -> list[str]:
    p = _HYPER.get(lemma)
    return [p] if p is not None else []


@lru_cache(maxsize=None)
def _children(lemma: str) -> tuple:
    return tuple(sorted(c for c, p in _HYPER.items() if p == lemma))


@lru_cache(maxsize=None)
def _ancestor_chain(lemma: str) -> tuple:
    """lemma -> ... -> tree root -> implicit root (inclusive of lemma)."""
    chain = [lemma]
    cur = lemma
    seen = {lemma}
    while True:
        ps = _parents(cur)
        if not ps or ps[0] in seen:
            break
        cur = ps[0]
        seen.add(cur)
        chain.append(cur)
    chain.append(_ROOT)
    return tuple(chain)


def depth(lemma: str) -> int:
    """Root depth, root itself = 1 (nltk counts the simulated root)."""
    return len(_ancestor_chain(lemma))


def wup(u: str, v: str) -> float:
    """sim2 (sim.py:22-28): 2*depth(lcs)/(depth(u)+depth(v)); single
    synset per lemma here, so the max over synset pairs is one term."""
    cu, cv = _ancestor_chain(u), _ancestor_chain(v)
    sv = set(cv)
    lcs = next((a for a in cu if a in sv), _ROOT)
    d_lcs = len(_ancestor_chain(lcs)) if lcs != _ROOT else 1
    return 2.0 * d_lcs / (len(cu) + len(cv))


def overlap_sim(u: str, v: str) -> float:
    """sim1 (sim.py:31-54): sigmoid of the neighborhood overlap; the u
    side includes hyponyms, the v side does NOT (reference's commented-out
    line preserved)."""
    nu = {u} | set(_parents(u)) | set(_children(u))
    nv = {v} | set(_parents(v))
    cs = nu & nv
    return sigmoid(len(cs)) if cs else 0.0


def combined_sim(u: str, v: str) -> float:
    return (wup(u, v) + overlap_sim(u, v)) / 2.0


def is_similar(u: str, v: str) -> bool:
    """sim.py:9-19: average of the two scores strictly above 0.7."""
    return combined_sim(u, v) > SIM_THRESHOLD


def _vocab() -> list[str]:
    return sorted(set(_HYPER.keys()) | set(_HYPER.values()))


def sim_pairs() -> list[tuple[str, str, float]]:
    """All ordered (a, b, sim) vocabulary pairs passing the 0.7 bar,
    a != b (the reference only scores ql != cl, qpro.py:268)."""
    vs = _vocab()
    out = []
    for a in vs:
        for b in vs:
            if a == b:
                continue
            s = combined_sim(a, b)
            if s > SIM_THRESHOLD:
                out.append((a, b, s))
    return out


def word_sim_table(spark: SparkSession) -> DataFrame:
    """Broadcast dimension table (lemma_a, lemma_b, sim). Small by
    construction (vocabulary pairs above threshold); at cluster scale the
    WordNet-derived equivalent is a few MB — still broadcast territory."""
    return spark.createDataFrame(
        sim_pairs(), "lemma_a string, lemma_b string, sim double"
    )
