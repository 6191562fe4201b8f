"""Extraction layer (keywords / summary / SVO / adjusted ranks) vs oracle."""

import math

from deeprank_spark.config import CraftParams
from deeprank_spark.engine import digest as spark_digest, flagship, ranks as spark_ranks
from deeprank_spark.oracle import textgraph as otg
from deeprank_spark.transcripts import small_transcripts, tiny_transcripts, transcripts_sdf

ATOL = 1.0e-6


def _oracle_per_conv(pdf, params):
    out = {}
    for conv, grp in pdf.groupby("conv_id"):
        sents = list(grp.sort_values("turn_idx")["text"])
        dg = otg.digest(sents, params)
        r = otg.pagerank(dg, params)
        out[conv] = (dg, r)
    return out


def test_adjusted_ranks_match(spark):
    pdf = small_transcripts(n_convs=8)
    params = CraftParams()
    d = spark_digest(transcripts_sdf(spark, pdf), params)
    got = {}
    for r in spark_ranks(d, params).collect():
        node = int(r["key"]) if r["kind"] == "S" else r["key"]
        got[(r["conv_id"], r["kind"], r["key"])] = r["rank"]
    for conv, (dg, exp) in _oracle_per_conv(pdf, params).items():
        for node, er in exp.items():
            k = ("S", str(node)) if isinstance(node, int) else ("W", node)
            assert math.isclose(got[(conv, *k)], er, abs_tol=ATOL), (conv, node)


def test_flagship_outputs_match_oracle(spark):
    pdf = small_transcripts(n_convs=8)
    params = CraftParams()
    out = flagship(transcripts_sdf(spark, pdf), params)

    kw = {}
    for r in out["keywords"].collect():
        kw.setdefault(r["conv_id"], []).append((-r["rank"], r["keyword"]))
    kw = {c: [w for _, w in sorted(v)] for c, v in kw.items()}
    summ = {}
    for r in out["summary"].collect():
        summ.setdefault(r["conv_id"], []).append(r["turn_idx"])
    svos = {}
    for r in out["relations"].collect():
        svos.setdefault(r["conv_id"], set()).add(
            (r["subj"], r["verb"], r["obj"], r["sent_id"])
        )

    for conv, (dg, ranks) in _oracle_per_conv(pdf, params).items():
        exp_kw = otg.best_words(dg, ranks, params.word_count)
        # keywords come back as a set ordered by rank; compare as ordered lists
        got_sorted = kw.get(conv, [])
        assert got_sorted == exp_kw, (conv, got_sorted, exp_kw)

        exp_summary = otg.best_sentences(dg, ranks, params.sent_count)
        assert summ.get(conv, []) == exp_summary, conv

        exp_svo = {tuple(e) for e in otg.best_svos(dg, ranks, params.rel_count)}
        assert svos.get(conv, set()) == exp_svo, conv


def test_flagship_tiny_sanity(spark):
    out = flagship(transcripts_sdf(spark, tiny_transcripts()), CraftParams())
    kw = out["keywords"].where("conv_id = 'c_cat'").collect()
    words = {r["keyword"] for r in kw}
    assert "cat" in words or "mat" in words


def test_giant_comp_gate_matches_oracle(spark):
    """CraftParams(giant_comp=True): keywords/summary restricted to the
    giant weak component when a conversation has < 4 components; SVO
    relations stay ungated (deepRank.py:398-406, 414-431, 563-599)."""
    import random as _random

    import pandas as pd

    from deeprank_spark.transcripts import _EPOCH, _rows

    rng = _random.Random(7)
    rows = []
    # 2 disjoint vocab islands -> 2 weak components -> gate active
    rows += _rows(
        "g_two",
        [
            "Cats sit on mats.",
            "Cats eat fishes.",
            "Robots build engines.",
        ],
        _EPOCH,
        rng,
    )
    # 4+ islands -> gate inactive (lc >= 4 in the reference)
    rows += _rows(
        "g_many",
        [
            "Cats sleep.",
            "Dogs bark.",
            "Birds sing.",
            "Fishes swim.",
            "Horses run.",
        ],
        _EPOCH,
        rng,
    )
    pdf = pd.DataFrame(rows)
    params = CraftParams(giant_comp=True)
    out = flagship(transcripts_sdf(spark, pdf), params)

    kw = {}
    for r in out["keywords"].collect():
        kw.setdefault(r["conv_id"], []).append((-r["rank"], r["keyword"]))
    kw = {c: [w for _, w in sorted(v)] for c, v in kw.items()}
    summ = {}
    for r in out["summary"].collect():
        summ.setdefault(r["conv_id"], []).append(r["turn_idx"])
    svos = {}
    for r in out["relations"].collect():
        svos.setdefault(r["conv_id"], set()).add(
            (r["subj"], r["verb"], r["obj"], r["sent_id"])
        )

    gate_seen_active = False
    for conv, (dg, ranks) in _oracle_per_conv(pdf, params).items():
        maxcc = otg.giant_comp_nodes(dg)
        if maxcc is not None and len(maxcc) < len(otg.nx_graph(dg)):
            gate_seen_active = True
        exp_kw = otg.best_words(dg, ranks, params.word_count, maxcc=maxcc)
        assert kw.get(conv, []) == exp_kw, (conv, kw.get(conv, []), exp_kw)
        exp_summary = otg.best_sentences(dg, ranks, params.sent_count, maxcc=maxcc)
        assert summ.get(conv, []) == exp_summary, conv
        # relations are ungated
        exp_svo = {tuple(e) for e in otg.best_svos(dg, ranks, params.rel_count)}
        assert svos.get(conv, set()) == exp_svo, conv
    assert gate_seen_active, "fixture never activated the gate"

    # default params: gate off, everything must match the ungated oracle
    out0 = flagship(transcripts_sdf(spark, pdf), CraftParams())
    kw0 = {}
    for r in out0["keywords"].collect():
        kw0.setdefault(r["conv_id"], []).append((-r["rank"], r["keyword"]))
    kw0 = {c: [w for _, w in sorted(v)] for c, v in kw0.items()}
    for conv, (dg, ranks) in _oracle_per_conv(pdf, CraftParams()).items():
        assert kw0.get(conv, []) == otg.best_words(dg, ranks, CraftParams().word_count)


def test_giant_comp_scc_gate_matches_oracle(spark):
    """CraftParams(giant_comp=True, giant_comp_scc=True): exact reference
    parity — the gate restricts to the giant STRONGLY connected component
    when a conversation has < 4 SCCs (deepRank.py:398-406 uses
    nx.strongly_connected_components)."""
    import random as _random

    import pandas as pd

    from deeprank_spark.transcripts import _EPOCH, _rows, small_transcripts

    rng = _random.Random(11)
    rows = []
    # single short sentences -> few nodes, about/first_in cycles -> few SCCs
    rows += _rows("s_one", ["Cats sit on mats."], _EPOCH, rng)
    rows += _rows("s_two", ["Dogs bark loudly.", "Dogs eat bones."], _EPOCH, rng)
    pdf = pd.concat([pd.DataFrame(rows), small_transcripts(n_convs=4)], ignore_index=True)
    params = CraftParams(giant_comp=True, giant_comp_scc=True)
    out = flagship(transcripts_sdf(spark, pdf), params)

    kw = {}
    for r in out["keywords"].collect():
        kw.setdefault(r["conv_id"], []).append((-r["rank"], r["keyword"]))
    kw = {c: [w for _, w in sorted(v)] for c, v in kw.items()}
    summ = {}
    for r in out["summary"].collect():
        summ.setdefault(r["conv_id"], []).append(r["turn_idx"])

    gate_seen_active = False
    for conv, (dg, ranks) in _oracle_per_conv(pdf, params).items():
        maxcc = otg.giant_comp_nodes(dg, scc=True)
        if maxcc is not None and len(maxcc) < len(otg.nx_graph(dg)):
            gate_seen_active = True
        exp_kw = otg.best_words(dg, ranks, params.word_count, maxcc=maxcc)
        assert kw.get(conv, []) == exp_kw, (conv, kw.get(conv, []), exp_kw)
        exp_summary = otg.best_sentences(dg, ranks, params.sent_count, maxcc=maxcc)
        assert summ.get(conv, []) == exp_summary, conv
    assert gate_seen_active, "fixture never activated the SCC gate"
