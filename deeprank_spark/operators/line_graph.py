"""Line-graph edge ranking (W9, reference best_edges/best_line_graph,
/root/reference/textcrafts/deepRank.py:803-822).

The reference builds nx.line_graph(G) — vertices are G's edges, connected
when consecutive — PageRanks it, and keeps the top-k word-word edges.
Here the line graph is one self-join (E1.dst == E2.src) and the ranking
REUSES pagerank_per_conv unchanged: line-graph vertices are encoded as
composite keys, which is the point — any graph-shaped derivation feeds the
same kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .pagerank import pagerank_per_conv

_ESEP = ">"


def _edge_key(src_kind, src, dst_kind, dst) -> F.Column:
    return F.concat_ws(_ESEP, F.concat(src_kind, src), F.concat(dst_kind, dst))


def line_graph_edges(gedges: DataFrame) -> DataFrame:
    """gedges(conv_id, src_kind, src, dst_kind, dst) -> line-graph edge
    list: one row per consecutive edge pair (a->b, b->c)."""
    a = gedges.select(
        "conv_id",
        _edge_key(
            F.col("src_kind"), F.col("src"), F.col("dst_kind"), F.col("dst")
        ).alias("e1"),
        F.concat(F.col("dst_kind"), F.col("dst")).alias("mid"),
    )
    b = gedges.select(
        "conv_id",
        F.concat(F.col("src_kind"), F.col("src")).alias("mid"),
        _edge_key(
            F.col("src_kind"), F.col("src"), F.col("dst_kind"), F.col("dst")
        ).alias("e2"),
    )
    return a.join(b, ["conv_id", "mid"]).where(F.col("e1") != F.col("e2")).select(
        "conv_id",
        F.lit("E").alias("src_kind"), F.col("e1").alias("src"),
        F.lit("E").alias("dst_kind"), F.col("e2").alias("dst"),
    ).distinct()


def best_word_edges(gedges: DataFrame, k: int = 16) -> DataFrame:
    """Top-k word-word edges per conversation by line-graph PageRank.

    -> (conv_id, src_word, dst_word, rank)."""
    lg = line_graph_edges(gedges)
    ranks = pagerank_per_conv(lg)
    parts = F.split(F.col("key"), _ESEP)
    decoded = ranks.select(
        "conv_id",
        F.element_at(parts, 1).alias("u"),
        F.element_at(parts, 2).alias("v"),
        "rank",
    ).where(F.col("v").isNotNull() & (F.length("v") > 0))
    words = decoded.where(
        (F.substring("u", 1, 1) == "W") & (F.substring("v", 1, 1) == "W")
    ).select(
        "conv_id",
        F.expr("substring(u, 2)").alias("src_word"),
        F.expr("substring(v, 2)").alias("dst_word"),
        "rank",
    )
    # rank ties compare at the published 8-decimal precision (see
    # extract._topk) so cross-engine top-k selection is deterministic
    w = Window.partitionBy("conv_id").orderBy(
        F.desc(F.round("rank", 8)), "src_word", "dst_word"
    )
    return words.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= k
    ).drop("rn")
