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


def test_row_local_w2l_matches_join_formulation(spark, monkeypatch):
    """The row-local lemma substitution (default) and the equi-join
    formulation (DEEPRANK_W2L_JOINS=1) must produce identical resolved
    deps — and therefore identical multi-edges and SVOs — on a corpus
    with repeated words (dict-overwrite ties) and parser-dropped tokens."""
    from deeprank_spark.operators.edges import (
        multi_edges_table,
        svo_table,
    )
    from deeprank_spark.parse import parse_transcripts
    from deeprank_spark.transcripts import gen_transcripts_df

    tr = gen_transcripts_df(spark, n_convs=30, turns_per_conv=12, partitions=4)
    parsed = parse_transcripts(tr).localCheckpoint(eager=True)

    def snap():
        multi = sorted(
            tuple(r) for r in multi_edges_table(parsed).collect()
        )
        svo = sorted(tuple(r) for r in svo_table(parsed).collect())
        return multi, svo

    monkeypatch.delenv("DEEPRANK_W2L_JOINS", raising=False)
    multi_rl, svo_rl = snap()
    assert len(multi_rl) > 100 and len(svo_rl) > 0  # non-trivial corpus

    monkeypatch.setenv("DEEPRANK_W2L_JOINS", "1")
    multi_j, svo_j = snap()

    assert multi_rl == multi_j
    assert svo_rl == svo_j
