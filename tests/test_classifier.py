"""Quality-classifier differentials: exact pure-python GD mirror, loss
descent, held-out separation."""

import hashlib
import math
import re

from deeprank_spark.operators.classifier import (
    score_quality,
    train_quality_classifier,
)


def _toks(text):
    return [t for t in re.split(r"[^a-z0-9']+", text.lower()) if t]


def _bucket(w1, w2, B):
    return int(hashlib.md5(f"{w1} {w2}".encode()).hexdigest()[:8], 16) % B


def _feats(docs, B):
    out = {}
    for d, text in docs:
        t = _toks(text)
        f: dict = {}
        for a, b in zip(t, t[1:]):
            bk = _bucket(a, b, B)
            f[bk] = f.get(bk, 0.0) + 1.0
        out[d] = f
    return out

def _py_train(pos, neg, B, iters, lr, l2):
    feats = {**_feats(pos, B), **_feats(neg, B)}
    ys = {d: 1.0 for d, _ in pos} | {d: 0.0 for d, _ in neg}
    n = len(ys)
    w: dict = {}
    b = 0.0
    losses = []
    for _ in range(iters):
        ps = {}
        for d, y in ys.items():
            m = sum(c * w.get(bk, 0.0) for bk, c in feats[d].items()) + b
            ps[d] = 1.0 / (1.0 + math.exp(-m))
        loss = -sum(
            ys[d] * math.log(max(ps[d], 1e-12))
            + (1 - ys[d]) * math.log(max(1 - ps[d], 1e-12))
            for d in ys
        ) / n
        losses.append(loss)
        gb = sum(ps[d] - ys[d] for d in ys) / n
        g: dict = {}
        for d in ys:
            r = ps[d] - ys[d]
            for bk, c in feats[d].items():
                g[bk] = g.get(bk, 0.0) + c * r
        b -= lr * gb
        for bk, gv in g.items():
            w[bk] = w.get(bk, 0.0) - lr * (gv / n + l2 * w.get(bk, 0.0))
    return w, b, losses


POS = [
    (1, "the cat sat on the mat and purred softly"),
    (2, "a cat chased the mouse across the mat"),
    (3, "the kitten slept on the warm mat all day"),
]
NEG = [
    (10, "zx qw er ty ui op as df gh jk"),
    (11, "qq ww ee rr tt yy uu ii oo pp"),
    (12, "xj kv bn mz lp qa ws ed rf tg"),
]
B = 128


def test_training_matches_python_mirror(spark):
    pos = spark.createDataFrame(POS, "doc_id long, text string")
    neg = spark.createDataFrame(NEG, "doc_id long, text string")
    model = train_quality_classifier(pos, neg, n_buckets=B, iters=8, lr=0.5)
    w, b, losses = _py_train(POS, NEG, B, iters=8, lr=0.5, l2=1.0e-4)
    assert math.isclose(model["bias"], b, rel_tol=0, abs_tol=1e-9)
    assert set(model["weights"]) == set(w)
    for bk, wv in w.items():
        assert math.isclose(model["weights"][bk], wv, rel_tol=0, abs_tol=1e-9)
    for a, e in zip(model["losses"], losses):
        assert math.isclose(a, e, rel_tol=0, abs_tol=1e-9)
    # GD on separable data: loss strictly decreases
    assert all(l2_ < l1_ for l1_, l2_ in zip(losses, losses[1:]))


def test_scoring_separates_held_out(spark):
    pos = spark.createDataFrame(POS, "doc_id long, text string")
    neg = spark.createDataFrame(NEG, "doc_id long, text string")
    model = train_quality_classifier(pos, neg, n_buckets=B, iters=25, lr=0.5)
    held = spark.createDataFrame(
        [
            (100, "the cat sat on the mat"),  # in-domain bigrams
            (101, "zx qw er ty ui op"),       # junk bigrams
            (102, "zzz"),                     # featureless: bias only
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["p_quality"] for r in score_quality(held, model, B).collect()}
    assert got[100] > 0.5 > got[101]
    bias_p = 1.0 / (1.0 + math.exp(-model["bias"]))
    assert math.isclose(got[102], bias_p, rel_tol=0, abs_tol=1e-12)
