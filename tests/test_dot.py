"""DOT sink (S10) differential tests: Spark-rendered documents vs a
pure-python rendering oracle, toDot's both-endpoints selection property
on the real engine pipeline, and gshow's size-guard branches."""

import re

from pyspark.sql import functions as F

from deeprank_spark.config import CraftParams
from deeprank_spark.engine import digest, ranks as engine_ranks
from deeprank_spark.operators.extract import _topk
from deeprank_spark.sources.dot import (
    GSHOW_MAX_EDGES,
    GSHOW_MIN_EDGES,
    all_edges_dot,
    best_node_edges,
    render_dot,
    svo_dot_edges,
)
from deeprank_spark.transcripts import small_transcripts, transcripts_sdf

_EDGE_RE = re.compile(r'^  "((?:[^"\\]|\\.)*)" -> "((?:[^"\\]|\\.)*)"'
                      r'(?: \[label="((?:[^"\\]|\\.)*)"\])?;$')


def _unesc(s: str) -> str:
    return s.replace('\\"', '"').replace("\\\\", "\\")


def _parse_dot(doc: str):
    lines = doc.splitlines()
    assert lines[0].startswith("digraph ") and lines[-1] == "}"
    out = []
    for ln in lines[1:-1]:
        m = _EDGE_RE.match(ln)
        assert m, f"unparseable DOT line: {ln!r}"
        out.append((_unesc(m.group(1)), _unesc(m.group(2)),
                    _unesc(m.group(3) or "")))
    return out


def _py_render(name, rows):
    def esc(s):
        return s.replace("\\", "\\\\").replace('"', '\\"')

    lines = sorted(
        '  "%s" -> "%s"%s;' % (
            esc(s), esc(d),
            ' [label="%s"]' % esc(lb) if lb else "",
        )
        for s, d, lb in rows
    )
    return 'digraph "%s" {\n%s\n}\n' % (name, "\n".join(lines))


def test_render_matches_python_oracle_and_escapes(spark):
    rows = [
        ("c1", 'he said "hi"', "back\\slash", ""),
        ("c1", "plain", "words", "is_a"),
        ("c1", "a", "b", 'l"b'),
        ("c2", "x", "y", ""),
        ("c2", "y", "x", ""),
        ("c2", "x", "y", ""),  # duplicate edge occurrence kept
    ]
    df = spark.createDataFrame(rows, "conv_id string, src string, dst string, label string")
    got = {r["conv_id"]: r for r in render_dot(df, name="t").collect()}
    for cid in ("c1", "c2"):
        expect_rows = [(s, d, lb) for c, s, d, lb in rows if c == cid]
        assert got[cid]["status"] == "ok"
        assert got[cid]["dot"] == _py_render("t", expect_rows)
        # round-trip: parsed multiset equals the input multiset
        assert sorted(_parse_dot(got[cid]["dot"])) == sorted(expect_rows)
    assert got["c1"]["n_edges"] == 3 and got["c2"]["n_edges"] == 3
    assert got["c2"]["n_nodes"] == 2


def test_gshow_size_guard_branches(spark):
    rows = [("small", f"s{i}", f"t{i}", "") for i in range(2)]
    rows += [("ok", f"s{i}", f"t{i}", "") for i in range(3)]
    rows += [("big", f"s{i}", f"t{i}", "") for i in range(300)]
    df = spark.createDataFrame(rows, "conv_id string, src string, dst string, label string")
    guarded = {
        r["conv_id"]: r
        for r in render_dot(
            df, min_edges=GSHOW_MIN_EDGES, max_edges=GSHOW_MAX_EDGES
        ).collect()
    }
    assert guarded["small"]["status"] == "too_small" and guarded["small"]["dot"] is None
    assert guarded["ok"]["status"] == "ok" and guarded["ok"]["dot"]
    assert guarded["big"]["status"] == "too_big" and guarded["big"]["dot"] is None
    # toDot's showGraph path is unguarded (vis.py:7-8): default renders all
    unguarded = {r["conv_id"]: r for r in render_dot(df).collect()}
    assert all(r["status"] == "ok" and r["dot"] for r in unguarded.values())


def test_best_node_edges_property_on_engine(spark):
    p = CraftParams()
    tr = transcripts_sdf(spark, small_transcripts(n_convs=6))
    d = digest(tr, p)
    radj = engine_ranks(d, p)
    got = {
        (r["conv_id"], r["src"], r["dst"])
        for r in best_node_edges(d.gedges, radj, k=8).collect()
    }
    best = {}
    for r in _topk(radj, 8).collect():
        best.setdefault(r["conv_id"], set()).add((r["kind"], r["key"]))
    expect = set()
    for r in d.gedges.collect():
        b = best.get(r["conv_id"], set())
        if (r["src_kind"], r["src"]) in b and (r["dst_kind"], r["dst"]) in b:
            expect.add((r["conv_id"], r["src"], r["dst"]))
    assert got == expect and expect  # non-vacuous


def test_svo_and_all_edges_shapes(spark):
    svos = spark.createDataFrame(
        [("c1", "dog", "chase", "cat", 1), ("c1", "dog", "chase", "cat", 4),
         ("c1", "cat", "see", "bird", 2)],
        "conv_id string, subj string, verb string, obj string, sent_id int",
    )
    rows = svo_dot_edges(svos).collect()
    assert len(rows) == 2  # sentence-level dedup (reference's svos set)
    doc = render_dot(svo_dot_edges(svos)).collect()[0]["dot"]
    assert '  "dog" -> "cat" [label="chase"];' in doc
    me = spark.createDataFrame(
        [("c1", "W", "dog", "NN", "subj", "W", "chase", "VB", 0)],
        "conv_id string, src_kind string, src string, src_tag string, "
        "rel string, dst_kind string, dst string, dst_tag string, sent_id int",
    )
    doc2 = render_dot(all_edges_dot(me)).collect()[0]["dot"]
    assert '  "dog" -> "chase" [label="NN_subj_VB"];' in doc2


def test_render_dot_rejects_null_endpoints(spark):
    """A NULL src/dst is an upstream bug: render_dot must fail loudly
    instead of silently dropping the line from the body while counting it
    in n_edges (advisor finding, round 4)."""
    import pytest

    df = spark.createDataFrame(
        [("c1", "a", None, ""), ("c1", "a", "b", "")],
        "conv_id string, src string, dst string, label string",
    )
    with pytest.raises(Exception, match="NULL edge endpoint|ASSERT"):
        render_dot(df).collect()


def test_render_dot_escapes_backslash_in_name(spark):
    """A graph name ending in a backslash must not escape the closing
    quote (advisor finding, round 4)."""
    df = spark.createDataFrame(
        [("c1", "a", "b", "")],
        "conv_id string, src string, dst string, label string",
    )
    doc = render_dot(df, name='we"ird\\').collect()[0]["dot"]
    assert doc.splitlines()[0] == 'digraph "we\\"ird\\\\" {'


def test_render_dot_reports_zero_edge_conversations(spark):
    """With all_convs, a conversation with no edge rows surfaces as an
    (n_nodes=0, n_edges=0) row so gshow's too_small branch can report it
    (advisor finding, round 4)."""
    edges = spark.createDataFrame(
        [("c1", "a", "b", ""), ("c1", "b", "c", ""), ("c1", "c", "a", "")],
        "conv_id string, src string, dst string, label string",
    )
    convs = spark.createDataFrame([("c1",), ("c2",), ("c2",)], "conv_id string")
    got = {
        r["conv_id"]: r
        for r in render_dot(
            edges, min_edges=GSHOW_MIN_EDGES, max_edges=GSHOW_MAX_EDGES,
            all_convs=convs,
        ).collect()
    }
    assert set(got) == {"c1", "c2"}
    assert got["c1"]["status"] == "ok" and got["c1"]["n_edges"] == 3
    assert got["c2"]["status"] == "too_small"
    assert got["c2"]["n_edges"] == 0 and got["c2"]["n_nodes"] == 0
    assert got["c2"]["dot"] is None


def test_best_node_edges_applies_giant_comp_gate(spark):
    """Passing `components` must equal pre-gating ranks_adj with
    giant_component_gate (toDot giant_comp parity, advisor finding r4)."""
    from deeprank_spark.operators.extract import giant_component_gate

    gedges = spark.createDataFrame(
        [
            ("c", "W", "a", "W", "b"),
            ("c", "W", "b", "W", "c"),
            ("c", "W", "x", "W", "y"),
        ],
        "conv_id string, src_kind string, src string, dst_kind string, dst string",
    )
    ranks = spark.createDataFrame(
        [("c", "W", k, r) for k, r in
         [("a", 0.5), ("b", 0.4), ("c", 0.3), ("x", 0.9), ("y", 0.8)]],
        "conv_id string, kind string, key string, rank double",
    )
    comps = spark.createDataFrame(
        [("c", "W", k, c) for k, c in
         [("a", "A"), ("b", "A"), ("c", "A"), ("x", "X"), ("y", "X")]],
        "conv_id string, kind string, key string, component string",
    )
    via_param = best_node_edges(gedges, ranks, k=10, components=comps)
    via_pregate = best_node_edges(
        gedges, giant_component_gate(ranks, comps), k=10
    )
    a = sorted(map(tuple, via_param.collect()))
    b = sorted(map(tuple, via_pregate.collect()))
    assert a == b
    # the 2-component conversation gates to the larger component: the x->y
    # edge (higher-ranked but smaller component) must be gone
    assert all(r[1] not in ("x", "y") for r in a) and len(a) == 2


def test_all_convs_full_outer_keeps_extra_edge_convs(spark):
    """Regression (round-5 review): all_convs ADDS zero-edge conversations
    but must never DROP conversations that have edges while missing from
    the caller's frame (previously a left join silently removed them)."""
    from deeprank_spark.sources.dot import render_dot

    edges = spark.createDataFrame(
        [("c1", "a", "b", None), ("extra", "x", "y", None)],
        "conv_id string, src string, dst string, label string",
    )
    all_convs = spark.createDataFrame(
        [("c1",), ("c2",)], "conv_id string"
    )
    got = {
        r["conv_id"]: (r["n_edges"], r["n_nodes"])
        for r in render_dot(edges, all_convs=all_convs).collect()
    }
    assert set(got) == {"c1", "c2", "extra"}
    assert got["c2"] == (0, 0)       # added zero-edge conversation
    assert got["extra"] == (1, 2)    # edge-bearing conversation preserved
