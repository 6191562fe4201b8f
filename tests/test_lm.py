"""Bigram-LM perplexity differentials: pure-python oracle over the same
tokenizer/counts/smoothing, reference-corpus mode, short-doc handling."""

import math
import re

import pytest

from deeprank_spark.operators.lm import lm_perplexity


def _toks(text):
    return [t for t in re.split(r"[^a-z0-9']+", text.lower()) if t]


def _py_lm(docs, model_docs=None, k=0.5):
    """{doc_id: (n_bigrams, avg_logp|None, ppl|None)} mirroring
    lm_perplexity's model: context counts + add-k over vocab V."""
    model_docs = docs if model_docs is None else model_docs
    big, uni, vocab = {}, {}, set()
    for _, text in model_docs:
        t = _toks(text)
        vocab.update(t)
        for a, b in zip(t, t[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
            uni[a] = uni.get(a, 0) + 1
    v = len(vocab)
    out = {}
    for doc_id, text in docs:
        t = _toks(text)
        pairs = list(zip(t, t[1:]))
        if not pairs:
            out[doc_id] = (0, None, None)
            continue
        lps = [
            math.log((big.get(p, 0) + k) / (uni.get(p[0], 0) + k * v))
            for p in pairs
        ]
        avg = sum(lps) / len(lps)
        out[doc_id] = (len(pairs), avg, math.exp(-avg))
    return out


DOCS = [
    (1, "the cat sat on the mat and the cat slept"),
    (2, "the dog sat on the log"),
    (3, "cat cat cat cat"),
    (4, "zzz"),  # 1 token: nothing to score
    (5, "completely unseen wording qq ww ee"),
    (6, ""),
]


def _run(spark, docs, **kw):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = lm_perplexity(df, **kw).collect()
    return {r["doc_id"]: (r["n_bigrams"], r["avg_logp"], r["ppl"]) for r in rows}


def test_lm_self_perplexity_matches_python(spark):
    got = _run(spark, DOCS)
    exp = _py_lm(DOCS)
    assert set(got) == set(exp)
    for d, (n, avg, ppl) in exp.items():
        gn, gavg, gppl = got[d]
        assert gn == n
        if avg is None:
            assert gavg is None and gppl is None
        else:
            assert math.isclose(gavg, avg, rel_tol=0, abs_tol=1e-12)
            assert math.isclose(gppl, ppl, rel_tol=1e-12)


def test_lm_reference_corpus_mode(spark):
    # CCNet mode: model trained on a clean corpus, scored on another.
    # Fluent-like text (seen bigrams) must score lower perplexity than
    # gibberish (all-unseen bigrams fall back to the smoothing floor).
    model = [(10, "the cat sat on the mat"), (11, "the dog sat on the log")]
    score = [(1, "the cat sat on the log"), (2, "qq ww ee rr tt yy")]
    mdf = spark.createDataFrame(model, "doc_id long, text string")
    got = _run(spark, score, model_docs=mdf)
    exp = _py_lm(score, model_docs=model)
    for d in exp:
        assert math.isclose(got[d][1], exp[d][1], rel_tol=0, abs_tol=1e-12)
    assert got[1][2] < got[2][2]


def test_lm_broadcast_hint_is_value_neutral(spark):
    a = _run(spark, DOCS)
    b = _run(spark, DOCS, broadcast_model=True)
    for d in a:
        assert a[d][0] == b[d][0]
        if a[d][1] is not None:
            assert math.isclose(a[d][1], b[d][1], rel_tol=0, abs_tol=1e-12)


@pytest.mark.parametrize("k", [0.1, 1.0])
def test_lm_smoothing_k(spark, k):
    got = _run(spark, DOCS, k=k)
    exp = _py_lm(DOCS, k=k)
    for d, (n, avg, _) in exp.items():
        if avg is not None:
            assert math.isclose(got[d][1], avg, rel_tol=0, abs_tol=1e-12)
