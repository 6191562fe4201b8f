"""DOT-format graph sink (S10: reference toDot deepRank.py:632-648,
svoToDot :650-656, showAllEdges :844-851, gshow size guard vis.py:32-44).

The reference renders a graphviz Digraph to a .gv file; graphviz is viz
tooling, but the DOT *source text* it writes is pure string data, so the
sink lives here as a first-class export: edge selection (both endpoints
in bestNodes(k, filter), deepRank.py:638-640) is relational, and the
per-conversation serialization is a sort_array + concat_ws over a
collect_list aggregate — one shuffle, no driver loop, no Python stages.
One DOT document per conversation; billions of conversations serialize
in parallel exactly like every other per-conv operator.

gshow's size guard (vis.py:36-43: < 3 edges -> "TOO SMALL", < 300 ->
render, else -> "TOO BIG") is exposed via min_edges/max_edges; toDot's
showGraph path renders unguarded (vis.py:7-8), which is the default.

Documented divergences (same class as oracle/textgraph.py's):
- edge-line ORDER inside a document is canonicalized (sorted) rather than
  nx insertion order; the edge multiset is identical and graphviz layout
  does not depend on statement order for unstyled digraphs.
- node identity follows the reference's str() collapse (deepRank.py:641:
  `dot.edge(str(f), str(t))`): a sentence node 3 and a word node "3"
  render as the same DOT vertex, faithfully.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import CraftParams
from ..operators.extract import _topk

#: gshow's published window (vis.py:36-43).
GSHOW_MIN_EDGES = 3
GSHOW_MAX_EDGES = 300


def best_node_edges(
    gedges: DataFrame,
    ranks_adj: DataFrame,
    k: int | None = None,
    node_filter: Column | None = None,
    params: CraftParams | None = None,
    components: DataFrame | None = None,
) -> DataFrame:
    """toDot's edge selection (deepRank.py:636-641): graph edges whose
    BOTH endpoints are in bestNodes(k, filter). `node_filter` is a
    Column predicate over (kind, key) — e.g. kind == 'W' mirrors
    wordsToDot's isWord (deepRank.py:658-660); None keeps every kind.

    giant_comp parity: reference bestNodes applies the maxcc gate
    (deepRank.py:427) INSIDE node selection. Pass `components`
    (components_per_conv output) to apply giant_component_gate here, or
    pre-gate ranks_adj yourself; with neither, selection is ungated —
    toDot parity then holds only for giant_comp=False runs.

    -> (conv_id, src, dst, label) with label = '' (unlabeled edges)."""
    p = params or CraftParams()
    k = k or p.dot_count
    if components is not None:
        from ..operators.extract import giant_component_gate

        ranks_adj = giant_component_gate(ranks_adj, components)
    cand = ranks_adj if node_filter is None else ranks_adj.where(node_filter)
    best = _topk(cand, k).select("conv_id", "kind", "key")
    e = gedges.join(
        best.select(
            "conv_id",
            F.col("kind").alias("src_kind"),
            F.col("key").alias("src"),
        ),
        ["conv_id", "src_kind", "src"],
        "leftsemi",
    )
    e = e.join(
        best.select(
            "conv_id",
            F.col("kind").alias("dst_kind"),
            F.col("key").alias("dst"),
        ),
        ["conv_id", "dst_kind", "dst"],
        "leftsemi",
    )
    return e.select("conv_id", "src", "dst", F.lit("").alias("label"))


def svo_dot_edges(best_svos: DataFrame) -> DataFrame:
    """svoToDot / toDot(svo=True) edge rows (deepRank.py:642-647):
    subj -> obj labeled with the verb, deduped over sentences (the
    reference collapses (s,v,o,sent) tuples into a set first)."""
    return best_svos.select(
        "conv_id",
        F.col("subj").alias("src"),
        F.col("obj").alias("dst"),
        F.col("verb").alias("label"),
    ).distinct()


def all_edges_dot(multi_edges: DataFrame) -> DataFrame:
    """showAllEdges rows (deepRank.py:844-851): every emitted edge
    occurrence, labeled `srctag_rel_dsttag`. The reference does not dedup
    here (one dot.edge call per tuple), so neither do we — parallel
    arrows are faithful Digraph behavior."""
    return multi_edges.select(
        "conv_id",
        F.col("src").alias("src"),
        F.col("dst").alias("dst"),
        F.concat_ws(
            "_", F.col("src_tag"), F.col("rel"), F.col("dst_tag")
        ).alias("label"),
    )


def _esc(c: Column) -> Column:
    # DOT double-quoted string escaping: backslash first, then quote.
    return F.replace(
        F.replace(c, F.lit("\\"), F.lit("\\\\")), F.lit('"'), F.lit('\\"')
    )


def render_dot(
    edge_rows: DataFrame,
    name: str = "textgraph",
    min_edges: int | None = None,
    max_edges: int | None = None,
    all_convs: DataFrame | None = None,
) -> DataFrame:
    """Serialize (conv_id, src, dst, label) rows into one DOT document per
    conversation.

    -> (conv_id, n_nodes, n_edges, status, dot). status is 'ok' (dot is
    the digraph source), 'too_small' (n_edges < min_edges) or 'too_big'
    (n_edges >= max_edges) — the latter two carry a NULL dot, mirroring
    gshow's refusal branches (vis.py:36-43). Defaults render unguarded
    like toDot -> showGraph (vis.py:7-8); pass GSHOW_MIN_EDGES /
    GSHOW_MAX_EDGES for gshow parity.

    A conversation with ZERO edge rows cannot appear in a groupBy over
    edge_rows; pass `all_convs` (a conv_id frame — distinct is applied
    here) to emit those as (n_nodes=0, n_edges=0) rows so the too_small
    branch can report them (advisor finding, round 4)."""
    # A NULL endpoint would make `line` NULL, which collect_list silently
    # drops while count(*) still counts it — document and metadata would
    # disagree. Fail loudly instead: a NULL src/dst is always an upstream
    # bug, never a renderable edge (advisor finding, round 4). The guard
    # lives INSIDE the line expression (coalesce short-circuits, so
    # raise_error only evaluates on NULL) — a separate dropped guard
    # column would be pruned by Catalyst and never run.
    def _nn(c: Column) -> Column:
        return F.coalesce(
            c,
            F.raise_error(
                F.concat(
                    F.lit("render_dot: NULL edge endpoint in conv "),
                    F.col("conv_id").cast("string"),
                )
            ).cast("string"),
        )

    line = F.concat(
        F.lit('  "'),
        _esc(_nn(F.col("src"))),
        F.lit('" -> "'),
        _esc(_nn(F.col("dst"))),
        F.lit('"'),
        F.when(
            F.coalesce(F.col("label"), F.lit("")) != "",
            F.concat(F.lit(' [label="'), _esc(F.col("label")), F.lit('"]')),
        ).otherwise(F.lit("")),
        F.lit(";"),
    )
    per_conv = edge_rows.groupBy("conv_id").agg(
        F.size(
            F.array_distinct(
                F.flatten(F.collect_list(F.array("src", "dst")))
            )
        ).alias("n_nodes"),
        F.concat_ws("\n", F.sort_array(F.collect_list(line))).alias("_body"),
        # counted from the same collected lines that form the body, so
        # n_edges can never disagree with the document it describes
        F.size(F.collect_list(line)).alias("n_edges"),
    )
    if all_convs is not None:
        # FULL outer, not left: all_convs ADDS zero-edge conversations; a
        # left join would silently DROP conversations that have edges but
        # are missing from the caller's frame (e.g. edge_rows derived from
        # a wider corpus than all_convs was built from)
        per_conv = (
            all_convs.select("conv_id")
            .distinct()
            .join(per_conv, "conv_id", "full")
            .select(
                "conv_id",
                F.coalesce("n_nodes", F.lit(0)).alias("n_nodes"),
                F.coalesce("_body", F.lit("")).alias("_body"),
                F.coalesce("n_edges", F.lit(0)).alias("n_edges"),
            )
        )
    status = F.lit("ok")
    if max_edges is not None:
        status = F.when(
            F.col("n_edges") >= max_edges, F.lit("too_big")
        ).otherwise(status)
    if min_edges is not None:
        status = F.when(
            F.col("n_edges") < min_edges, F.lit("too_small")
        ).otherwise(status)
    # full DOT escaping for the graph name too: a trailing backslash
    # would otherwise escape the closing quote (advisor finding, round 4)
    escaped_name = name.replace("\\", "\\\\").replace('"', '\\"')
    doc = F.concat(
        F.lit('digraph "%s" {\n' % escaped_name),
        F.col("_body"),
        F.lit("\n}\n"),
    )
    return per_conv.select(
        "conv_id",
        "n_nodes",
        "n_edges",
        status.alias("status"),
        F.when(status == "ok", doc).alias("dot"),
    )


def write_dot_table(dot_df: DataFrame, base: str) -> None:
    """Persist rendered documents as a parquet sink table (the .gv file
    write itself is a driver-side `open(...).write(row.dot)` away, but a
    columnar table is the shape a 1000-executor run wants)."""
    dot_df.write.mode("overwrite").parquet(base)
