"""Plugin-seam proof (round-3): the FULL edge/extraction differential suite
must hold under a SECOND parser backend, showing the pipeline is
backend-agnostic and the oracle pins only semantics downstream of the
parse, never the default backend's specifics.

The reference's parser is an exchangeable adapter (parser_api.py:5-30,
realized twice: corenlp_api.py and stanfordnlp_api.py); the engine's seam
is nlp/backends.py, exercised here with the 'window' backend (suffix-hash
tagger, last-verb root, backward modifiers, left-headed compounds)."""

import math

import pytest

from deeprank_spark.config import CraftParams
from deeprank_spark.engine import digest as spark_digest, ranks as spark_ranks
from deeprank_spark.nlp import backends
from deeprank_spark.oracle import textgraph as otg
from deeprank_spark.transcripts import small_transcripts, transcripts_sdf

from tests.test_edges import _oracle_edges

BACKENDS = sorted(backends._MODULES)


def test_backends_differ():
    """The two backends must actually produce different parses, or the
    seam test proves nothing."""
    sent = "The big cat sits on the old mat."
    a = backends.get_parse_sentence("simple")(sent)
    b = backends.get_parse_sentence("window")(sent)
    assert a.words == b.words  # same tokenization contract
    assert (a.tags, sorted(a.deps)) != (b.tags, sorted(b.deps))


@pytest.mark.parametrize("backend", BACKENDS)
def test_edges_match_oracle_per_backend(spark, backend):
    """Spark edge cascade == pure-python reference-semantics oracle when
    BOTH run on the same pluggable parse."""
    pdf = small_transcripts(n_convs=6)
    params = CraftParams(parser_backend=backend)
    d = spark_digest(transcripts_sdf(spark, pdf), params)
    exp_edges, exp_multi, exp_svo, _ = _oracle_edges(pdf, params)

    got_edges = {}
    for r in d.edges.collect():
        got_edges.setdefault(r["conv_id"], set()).add(
            (r["src_kind"], r["src"], r["src_tag"], r["rel"],
             r["dst_kind"], r["dst"], r["dst_tag"])
        )
    assert set(got_edges) == set(exp_edges)
    for conv in exp_edges:
        assert got_edges[conv] == exp_edges[conv], (backend, conv)

    got_svo = {}
    for r in d.svo.collect():
        got_svo.setdefault(r["conv_id"], []).append(
            (r["subj"], r["verb"], r["obj"], r["sent_id"])
        )
    for conv, exp in exp_svo.items():
        assert sorted(got_svo.get(conv, [])) == exp, (backend, conv)


def test_ranks_match_oracle_on_second_backend(spark):
    """PageRank + length adjustment stay oracle-exact on the non-default
    backend's graph (the kernel doesn't care where edges came from)."""
    pdf = small_transcripts(n_convs=4)
    params = CraftParams(parser_backend="window")
    d = spark_digest(transcripts_sdf(spark, pdf), params)
    got = {}
    for r in spark_ranks(d, params).collect():
        got[(r["conv_id"], r["kind"], r["key"])] = r["rank"]
    for conv, grp in pdf.groupby("conv_id"):
        sents = list(grp.sort_values("turn_idx")["text"])
        dg = otg.digest(sents, params)
        exp = otg.pagerank(dg, params)
        for node, er in exp.items():
            k = ("S", str(node)) if isinstance(node, int) else ("W", node)
            assert math.isclose(got[(conv, *k)], er, abs_tol=1e-6), (conv, node)


def test_unknown_backend_rejected():
    with pytest.raises(ValueError):
        backends.resolve("corenlp-http")


def test_digest_rejects_unknown_materialize_mode(spark):
    """A typo'd materialize mode must fail loudly, not silently fall back
    to 'checkpoint' (engine.py digest mode validation)."""
    import pandas as pd
    import pytest

    from deeprank_spark.engine import digest as spark_digest

    pdf = pd.DataFrame(
        {"conv_id": ["c1"], "turn_idx": [0], "role": ["user"],
         "text": ["The cat sits on the mat."], "tool": [None],
         "ts": pd.to_datetime(["2024-01-01"])}
    )
    with pytest.raises(ValueError, match="materialize mode"):
        spark_digest(transcripts_sdf(spark, pdf), materialize="presist")
