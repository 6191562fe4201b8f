"""Incremental connected components over a stream of edges.

An unbounded edge stream (new links between conversation turns, URLs,
entities) wants component labels that stay current without recomputing
over ALL edges ever seen. The classic trick: component structure is
fully captured by a SPANNING FOREST (<= V-1 edges), so each micro-batch
merges its new edges with the saved forest — never with the full edge
history — and re-labels that union:

    per batch B_t:  forest_t = spanning_forest( forest_{t-1} UNION B_t )
                    labels_t = components( forest_{t-1} UNION B_t )

Incremental cost is O(V + |B_t|) rows per batch regardless of how many
edges the stream has carried (forest compression is what Union-Find's
path compression does, expressed as data). Labels are identical to a
batch recompute over the full history — components(edges) depends only
on connectivity, which the forest preserves exactly — and the pytest
parity test pins stream-replay == batch for every prefix.

Built on foreachBatch: per-key state stores won't do here because
component merging is inherently CROSS-key (two previously unrelated
keys join when an edge arrives), which applyInPandasWithState's
key-isolated state cannot express. The forest lives as parquet next to
the checkpoint, giving restart-safety the same way the superstep
protocol does (write-then-swap via overwrite of a versioned dir).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _star_forest(labels: DataFrame) -> DataFrame:
    """One row per seen vertex: (component_min -> id). For non-root
    vertices that is a star spanning tree of the component (the dataflow
    analog of Union-Find path compression); for the root it is a
    self-loop row, kept deliberately — a component whose only member is
    its root (e.g. born from a self-loop edge) must still survive into
    the next batch's union or the vertex would vanish from later label
    tables. Self-loops are connectivity no-ops downstream."""
    return labels.select(
        F.col("component").alias("src"), F.col("id").alias("dst")
    )


def incremental_components(
    spark,
    batch_edges: DataFrame,
    state_dir: str,
) -> DataFrame:
    """Process ONE micro-batch: merge `batch_edges` (src, dst) with the
    saved forest under `state_dir`, recompute labels on the union, save
    the new forest, return (id, component). Call from foreachBatch (or
    any replay loop); idempotent per batch content.
    """
    from deeprank_spark.operators.components import components_distributed

    forest_path = os.path.join(state_dir, "forest")
    e = batch_edges.select("src", "dst")
    # only a MISSING forest means "first batch" — any other read failure
    # (corrupt file, permissions) must raise: silently restarting from an
    # empty forest would drop every previously-seen component and emit
    # wrong labels that look healthy
    if os.path.isdir(forest_path):
        prev = spark.read.parquet(forest_path)
        union = prev.unionByName(e)
    else:
        union = e
    labels = components_distributed(union).localCheckpoint(eager=True)
    new_forest = _star_forest(labels)
    # write-then-swap: land the new forest beside the old and rename via
    # overwrite — a crashed batch leaves the previous forest intact and
    # the stream's checkpoint replays the batch
    tmp = os.path.join(state_dir, "_forest_next")
    new_forest.write.mode("overwrite").parquet(tmp)
    reread = spark.read.parquet(tmp)
    reread.write.mode("overwrite").parquet(forest_path)
    return labels


def streaming_components(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    out_dir: str,
):
    """Wire incremental_components into a Structured Streaming query:
    each micro-batch's full label table is (over)written to out_dir —
    "current components as of the latest batch". Returns the started
    query (caller awaits/stops)."""

    def _batch(batch_df: DataFrame, _epoch) -> None:
        labels = incremental_components(
            batch_df.sparkSession, batch_df, state_dir
        )
        labels.write.mode("overwrite").parquet(out_dir)

    return (
        stream.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
