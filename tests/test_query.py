"""Query engine (entry point C) vs oracle: personalized rerank + matching."""

from deeprank_spark.config import CraftParams, TalkParams
from deeprank_spark.engine import digest as spark_digest
from deeprank_spark.operators.query import answer_queries, personalization_vectors
from deeprank_spark.oracle import textgraph as otg
from deeprank_spark.transcripts import small_transcripts, tiny_transcripts, transcripts_sdf


def test_personalization_vectors_match_oracle(spark):
    queries = spark.createDataFrame(
        [("c_mixed", 0, "Who builds the graph engine?")],
        "conv_id string, q_idx int, text string",
    )
    params = CraftParams()
    got = {
        (r["kind"], r["key"]): r["weight"]
        for r in personalization_vectors(queries, params).collect()
    }
    qdg = otg.digest(["Who builds the graph engine?"], params)
    qranks = otg.pagerank(qdg, params)
    # NOTE: oracle pers_dict uses post-adjustment ranks; the engine uses the
    # same pagerank_per_conv + adjustment path via personalization_vectors?
    exp = otg.pers_dict(qdg, qranks)
    assert set(got) == {("W", k) for k in exp}


def test_answers_match_oracle(spark):
    pdf = small_transcripts(n_convs=6)
    params, talk = CraftParams(), TalkParams()
    d = spark_digest(transcripts_sdf(spark, pdf), params)

    convs = sorted(pdf["conv_id"].unique())[:4]
    qrows = []
    texts = {}
    for i, conv in enumerate(convs):
        grp = pdf[pdf["conv_id"] == conv].sort_values("turn_idx")
        texts[conv] = list(grp["text"])
        # query built from words of the conv's first sentence
        qrows.append((conv, 0, "What " + texts[conv][0].rstrip(".").lower() + "?"))
    queries = spark.createDataFrame(qrows, "conv_id string, q_idx int, text string")

    ans = answer_queries(d.parsed, d.multi_edges, d.gedges, queries, params, talk)
    got = {}
    for r in ans.collect():
        got.setdefault((r["conv_id"], r["q_idx"]), []).append(r["turn_idx"])
    for k in got:
        got[k] = sorted(got[k])

    for (conv, qi, qtext) in qrows:
        doc = otg.digest(texts[conv], params)
        exp = otg.query_answers(doc, qtext, params, talk.max_answers)
        assert got.get((conv, qi), []) == exp, (conv, qtext, got.get((conv, qi)), exp)
