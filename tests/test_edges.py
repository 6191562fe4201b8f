"""Differential test: Catalyst edge pipeline vs the pure-Python oracle
(reference edgesInSent semantics, deepRank.py:292-361)."""

import pytest

from deeprank_spark.config import CraftParams
from deeprank_spark.engine import digest as spark_digest
from deeprank_spark.oracle import textgraph as oracle
from deeprank_spark.transcripts import small_transcripts, tiny_transcripts, transcripts_sdf

SENT = "SENT"


def _oracle_edges(pdf, params):
    """Run the oracle per conversation; edges with sentence node normalized
    to the Spark encoding (kind, key-as-string)."""
    out_edges = {}
    out_multi = {}
    out_svo = {}
    out_nouns = {}
    for conv, grp in pdf.groupby("conv_id"):
        sents = list(grp.sort_values("turn_idx")["text"])
        dg = oracle.digest(sents, params)
        def enc(x, tag):
            if isinstance(x, int):
                return ("S", str(x), tag)
            return ("W", x, tag)
        es = set()
        for (f, tf, r, t, tt) in dg.edges:
            fk, fkey, ftag = enc(f, tf)
            tk, tkey, ttag = enc(t, tt)
            es.add((fk, fkey, ftag, r, tk, tkey, ttag))
        out_edges[conv] = es
        ms = []
        for (f, tf, r, t, tt, k) in dg.multi_edges:
            fk, fkey, ftag = enc(f, tf)
            tk, tkey, ttag = enc(t, tt)
            ms.append((fk, fkey, ftag, r, tk, tkey, ttag, k))
        out_multi[conv] = sorted(ms)
        out_svo[conv] = sorted(dg.svos)
        out_nouns[conv] = dict(dg.noun_set)
    return out_edges, out_multi, out_svo, out_nouns


@pytest.mark.parametrize("fixture", ["tiny", "small"])
def test_edges_match_oracle(spark, fixture):
    pdf = tiny_transcripts() if fixture == "tiny" else small_transcripts(n_convs=12)
    params = CraftParams()
    d = spark_digest(transcripts_sdf(spark, pdf), params)

    exp_edges, exp_multi, exp_svo, exp_nouns = _oracle_edges(pdf, params)

    got_edges = {}
    for r in d.edges.collect():
        got_edges.setdefault(r["conv_id"], set()).add(
            (r["src_kind"], r["src"], r["src_tag"], r["rel"],
             r["dst_kind"], r["dst"], r["dst_tag"])
        )
    assert set(got_edges) == set(exp_edges)
    for conv in exp_edges:
        assert got_edges[conv] == exp_edges[conv], f"edge set mismatch in {conv}"

    got_multi = {}
    for r in d.multi_edges.collect():
        got_multi.setdefault(r["conv_id"], []).append(
            (r["src_kind"], r["src"], r["src_tag"], r["rel"],
             r["dst_kind"], r["dst"], r["dst_tag"], r["sent_id"])
        )
    for conv in exp_multi:
        assert sorted(got_multi.get(conv, [])) == exp_multi[conv], conv

    got_svo = {}
    for r in d.svo.collect():
        got_svo.setdefault(r["conv_id"], []).append(
            (r["subj"], r["verb"], r["obj"], r["sent_id"])
        )
    for conv, exp in exp_svo.items():
        assert sorted(got_svo.get(conv, [])) == exp, f"svo mismatch in {conv}"
    for conv in got_svo:
        assert conv in exp_svo

    got_nouns = {}
    for r in d.noun_set.collect():
        got_nouns.setdefault(r["conv_id"], {})[r["lemma"]] = r["first_sent"]
    for conv, exp in exp_nouns.items():
        assert got_nouns.get(conv, {}) == exp, f"noun_set mismatch in {conv}"


def test_edges_params_variants(spark):
    """noun_self / all_recs / noun_defs toggles follow the reference rules."""
    pdf = tiny_transcripts()
    for kwargs in (
        {"noun_self": True},
        {"all_recs": False},
        {"noun_defs": False},
        {"noun_self": True, "all_recs": False, "noun_defs": False},
    ):
        params = CraftParams(**kwargs)
        d = spark_digest(transcripts_sdf(spark, pdf), params)
        exp_edges, _, _, _ = _oracle_edges(pdf, params)
        got = {}
        for r in d.edges.collect():
            got.setdefault(r["conv_id"], set()).add(
                (r["src_kind"], r["src"], r["src_tag"], r["rel"],
                 r["dst_kind"], r["dst"], r["dst_tag"])
            )
        assert got == exp_edges, f"params={kwargs}"
