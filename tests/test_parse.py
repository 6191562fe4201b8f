"""Parser + generator determinism and schema tests (SURVEY §7 M0/M1)."""

import pandas as pd

from deeprank_spark.nlp.simple_parser import parse_sentence, split_sentences
from deeprank_spark.parse import PARSED_SCHEMA, parse_transcripts
from deeprank_spark.transcripts import (
    TRANSCRIPTS_SCHEMA,
    gen_transcripts_df,
    small_transcripts,
    tiny_transcripts,
    transcripts_sdf,
)


def test_parser_deterministic():
    s = "The cat sits on the mat."
    a, b = parse_sentence(s), parse_sentence(s)
    assert a.words == b.words == ["The", "cat", "sits", "on", "the", "mat", "."]
    assert a.deps == b.deps
    # core structure: verb root with subject and nmod-through-preposition
    rels = {(f[0], r, t[0]) for (f, r, t) in a.deps}
    assert ("sits", "nsubj", "cat") in rels
    assert ("sits", "nmod", "mat") in rels
    assert ("mat", "case", "on") in rels
    assert ("sits", "punct", ".") in rels


def test_split_sentences():
    assert split_sentences("The cat walks. The dog barks.") == [
        "The cat walks.",
        "The dog barks.",
    ]


def test_generators_deterministic():
    a, b = small_transcripts(), small_transcripts()
    pd.testing.assert_frame_equal(a, b)
    assert set(a.columns) == {"conv_id", "turn_idx", "role", "text", "tool", "ts"}
    # dense 0-based turn_idx per conv
    g = a.groupby("conv_id")["turn_idx"]
    assert (g.min() == 0).all()
    assert (g.max() + 1 == g.count()).all()


def test_distributed_generator(spark):
    df = gen_transcripts_df(spark, n_convs=20, turns_per_conv=10, seed=7)
    assert [f.name for f in df.schema.fields] == [f.name for f in TRANSCRIPTS_SCHEMA.fields]
    pdf = df.toPandas()
    assert len(pdf) == 20 * 10 + 7 * 10
    # determinism
    pdf2 = gen_transcripts_df(spark, n_convs=20, turns_per_conv=10, seed=7).toPandas()
    pd.testing.assert_frame_equal(
        pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
        pdf2.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
    )
    # hub conversation is 8x longer
    counts = pdf.groupby("conv_id").size()
    assert counts["c00000000"] == 80


def test_parse_transcripts_matches_local(spark):
    tiny = tiny_transcripts()
    sdf = transcripts_sdf(spark, tiny)
    parsed = parse_transcripts(sdf)
    assert parsed.schema == PARSED_SCHEMA
    rows = {(r["conv_id"], r["sent_id"]): r for r in parsed.collect()}
    for _, t in tiny.iterrows():
        ps = parse_sentence(t["text"])
        r = rows[(t["conv_id"], t["turn_idx"])]
        assert list(r["words"]) == ps.words
        assert list(r["lemmas"]) == ps.lemmas
        assert list(r["tags"]) == ps.tags
        got = [
            ((d["fw"], d["ftag"]), d["rel"], (d["tw"], d["ttag"])) for d in r["deps"]
        ]
        assert got == ps.deps


def test_per_turn_text_equality(spark):
    """input_hint invariant: text column is passed through unmutated under
    stable (conv_id, turn_idx) ordering."""
    pdf = small_transcripts(n_convs=10)
    sdf = transcripts_sdf(spark, pdf)
    back = (
        sdf.select("conv_id", "turn_idx", "text")
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    exp = (
        pdf[["conv_id", "turn_idx", "text"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(back, exp, check_dtype=False)
