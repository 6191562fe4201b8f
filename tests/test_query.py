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


def test_expand_quest_memory_window(spark):
    """process_quest (qpro.py:125-134): newest-first concat of the last K
    distinct questions, re-asked question moves to the most-recent slot;
    K=1 (reference default) is the identity."""
    from deeprank_spark.config import TalkParams
    from deeprank_spark.operators.query import expand_quest_memory

    qs = spark.createDataFrame(
        [
            ("c1", 0, "where is the cat?"),
            ("c1", 1, "who feeds it?"),
            ("c1", 2, "where is the cat?"),  # re-ask of q0
            ("c1", 3, "does the dog bark?"),
            ("c2", 0, "hello?"),
        ],
        "conv_id string, q_idx int, text string",
    )
    out1 = expand_quest_memory(qs, TalkParams(quest_memory=1))
    assert out1 is qs  # identity, no plan change

    got = {
        (r["conv_id"], r["q_idx"]): r["text"]
        for r in expand_quest_memory(qs, TalkParams(quest_memory=2)).collect()
    }
    assert got[("c1", 0)] == "where is the cat? "
    assert got[("c1", 1)] == "who feeds it? where is the cat? "
    # re-ask: 'where is the cat?' moved to newest; previous = q1
    assert got[("c1", 2)] == "where is the cat? who feeds it? "
    assert got[("c1", 3)] == "does the dog bark? where is the cat? "
    assert got[("c2", 0)] == "hello? "
    assert len(got) == 5


def test_quest_memory_changes_answers(spark):
    """With memory on, a follow-up question inherits the previous
    question's terms and can resolve an otherwise unanswerable query."""
    from deeprank_spark.config import TalkParams
    from deeprank_spark.engine import digest as spark_digest
    from deeprank_spark.operators.query import answer_queries
    from deeprank_spark.transcripts import tiny_transcripts, transcripts_sdf

    d = spark_digest(transcripts_sdf(spark, tiny_transcripts()))
    qs = spark.createDataFrame(
        [
            ("c_mixed", 0, "Who builds the graph engine?"),
            ("c_mixed", 1, "What ranks?"),
        ],
        "conv_id string, q_idx int, text string",
    )
    def answers_for(t):
        rows = answer_queries(d.parsed, d.multi_edges, d.gedges, qs, talk=t).collect()
        out = {}
        for r in rows:
            out.setdefault((r["conv_id"], r["q_idx"]), set()).add(r["sent_text"])
        return out

    a_off = answers_for(TalkParams(quest_memory=1))
    a_on = answers_for(TalkParams(quest_memory=3))
    # q0 sees the same effective text either way
    assert a_off.get(("c_mixed", 0)) == a_on.get(("c_mixed", 0))
    # q1's effective text differs; the answer set must differ too
    assert a_off.get(("c_mixed", 1)) != a_on.get(("c_mixed", 1))
