"""PageRank kernels (networkx-equivalent semantics, allclose 1e-6).

Semantics matched exactly to the reference's single call site
(nx.pagerank, /root/reference/textcrafts/deepRank.py:535; library defaults
alpha=0.85, tol=1e-6, max_iter=100):

- right-stochastic transition (contribution = rank/out_degree)
- dangling mass redistributed along the personalization vector
- x0 uniform; personalization restricted to graph nodes, renormalized
- L1 convergence: sum(|x' - x|) < N * tol; failure to converge raises

Two physical strategies for one logical kernel:

1. `pagerank_per_conv` — the 10^12-turn fast path. Conversations are
   independent graphs, so ONE shuffle (groupBy conv_id) moves each graph to
   one task, and the whole power iteration runs in numpy inside
   applyInPandas (Arrow batches, vectorized bincount gather-scatter =
   CSR-style SpMV; no per-row Python). 10^10 conversations stream through
   as ordinary grouped partitions — no supersteps, no driver round-trips.

2. `pagerank_distributed` — for one giant graph (cross-conversation link
   graph) that cannot sit in a single task: driver-side superstep loop over
   a DataFrame SpMV (join + partial-agg), optional explicit salting for
   hub-vertex fan-in on top of AQE skew handling, per-superstep
   localCheckpoint to truncate lineage, optional durable checkpoints with a
   per-partition lineage table, and resume from the latest complete
   superstep.
"""

from __future__ import annotations

import json
import os
import tempfile
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

PER_CONV_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("key", StringType(), False),
        StructField("rank", DoubleType(), False),
    ]
)

_SEP = ""  # kind is a single char; token = kind + key parses positionally


def _power_iteration(
    src_idx: np.ndarray,
    dst_idx: np.ndarray,
    n: int,
    p: np.ndarray,
    alpha: float,
    tol: float,
    max_iter: int,
) -> np.ndarray:
    outdeg = np.bincount(src_idx, minlength=n).astype(np.float64)
    dangling = outdeg == 0.0
    safe_deg = np.where(dangling, 1.0, outdeg)
    x = np.full(n, 1.0 / n, dtype=np.float64)
    for _ in range(max_iter):
        xlast = x
        contrib = np.bincount(
            dst_idx, weights=xlast[src_idx] / safe_deg[src_idx], minlength=n
        )
        dm = xlast[dangling].sum()
        x = alpha * (contrib + dm * p) + (1.0 - alpha) * p
        if np.abs(x - xlast).sum() < n * tol:
            return x
    raise RuntimeError(f"pagerank failed to converge in {max_iter} iterations")


def _conv_pagerank_pdf(
    edges_pdf: pd.DataFrame,
    pers_pdf: pd.DataFrame | None,
    alpha: float,
    tol: float,
    max_iter: int,
) -> pd.DataFrame:
    if len(edges_pdf) == 0:
        return pd.DataFrame({"conv_id": [], "kind": [], "key": [], "rank": []})
    conv = edges_pdf["conv_id"].iloc[0]
    skey = edges_pdf["src_kind"].astype(str) + edges_pdf["src"].astype(str)
    dkey = edges_pdf["dst_kind"].astype(str) + edges_pdf["dst"].astype(str)
    nodes, inv = np.unique(
        np.concatenate([skey.to_numpy(), dkey.to_numpy()]), return_inverse=True
    )
    m = len(edges_pdf)
    src_idx, dst_idx = inv[:m], inv[m:]
    n = len(nodes)

    p = np.full(n, 1.0 / n, dtype=np.float64)
    if pers_pdf is not None and len(pers_pdf) > 0:
        pk = (pers_pdf["kind"].astype(str) + pers_pdf["key"].astype(str)).to_numpy()
        pos = np.searchsorted(nodes, pk)
        ok = (pos < n) & (nodes[np.minimum(pos, n - 1)] == pk)
        w = pers_pdf["weight"].to_numpy(dtype=np.float64)
        pv = np.zeros(n, dtype=np.float64)
        np.add.at(pv, pos[ok], w[ok])
        if pv.sum() > 0:
            p = pv / pv.sum()

    x = _power_iteration(src_idx, dst_idx, n, p, alpha, tol, max_iter)
    kinds = np.array([s[0] for s in nodes])
    keys = np.array([s[1:] for s in nodes])
    return pd.DataFrame(
        {"conv_id": conv, "kind": kinds, "key": keys, "rank": x}
    )


def pagerank_per_conv(
    gedges: DataFrame,
    pers: DataFrame | None = None,
    alpha: float = 0.85,
    tol: float = 1.0e-6,
    max_iter: int = 100,
) -> DataFrame:
    """ranks(conv_id, kind, key, rank) for every conversation graph.

    gedges: (conv_id, src_kind, src, dst_kind, dst) distinct edge pairs.
    pers:   optional (conv_id, kind, key, weight) personalization rows.
    """

    if pers is None:

        def run(pdf: pd.DataFrame) -> pd.DataFrame:
            return _conv_pagerank_pdf(pdf, None, alpha, tol, max_iter)

        return gedges.groupBy("conv_id").applyInPandas(run, PER_CONV_SCHEMA)

    def run2(_key, edges_pdf: pd.DataFrame, pers_pdf: pd.DataFrame) -> pd.DataFrame:
        return _conv_pagerank_pdf(edges_pdf, pers_pdf, alpha, tol, max_iter)

    return (
        gedges.groupBy("conv_id")
        .cogroup(pers.groupBy("conv_id"))
        .applyInPandas(run2, PER_CONV_SCHEMA)
    )


# ---------------------------------------------------------------------------
# Distributed superstep kernel (single giant graph)
# ---------------------------------------------------------------------------


def _lineage_rows(state: DataFrame, superstep: int, wall_ms: float) -> DataFrame:
    return (
        state.select(
            F.spark_partition_id().alias("partition_id"),
            F.xxhash64("id", F.format_number("rank", 12)).alias("h"),
        )
        .groupBy("partition_id")
        .agg(F.count("*").alias("rows"), F.expr("bit_xor(h)").alias("checksum"))
        .select(
            F.lit(superstep).alias("superstep"),
            "partition_id",
            "rows",
            "checksum",
            F.lit(float(wall_ms)).alias("wall_ms"),
        )
    )


class PageRankRun:
    """Result handle: final ranks + iteration metrics."""

    def __init__(self, ranks: DataFrame, supersteps: int, deltas: list,
                 wall_s: float, converged: bool):
        self.ranks = ranks
        self.supersteps = supersteps
        self.deltas = deltas
        self.wall_s = wall_s
        self.converged = converged


def pagerank_distributed(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    id_cols: tuple = ("src", "dst"),
    alpha: float = 0.85,
    tol: float = 1.0e-6,
    max_iter: int = 100,
    pers: DataFrame | None = None,
    salt_buckets: int = 0,
    checkpoint_dir: str | None = None,
    run_id: str = "pr",
    checkpoint_interval: int = 5,
    resume: bool = False,
    num_partitions: int | None = None,
) -> PageRankRun:
    """Superstep SpMV PageRank on one (possibly giant) graph.

    edges: DataFrame with long/str columns id_cols=(src, dst); multi-edges
    should be pre-deduped by the caller for DiGraph semantics.
    pers: optional (id, weight).

    Scale design: `edges_deg` (edges ⋈ out-degree) is materialized once,
    hash-partitioned on src and cached — every superstep reuses that
    partitioning for the gather join. Contributions aggregate with Spark's
    partial (map-side) aggregation; `salt_buckets > 0` adds an explicit
    two-phase (dst, salt)->dst aggregation for power-law fan-in hubs.
    One driver action per superstep reads back (L1 delta, dangling mass).
    `checkpoint_dir` makes state durable every `checkpoint_interval`
    supersteps plus a per-partition lineage table; `resume=True` restarts
    from the latest complete superstep and reproduces the identical final
    state (same floating-point schedule).
    """
    spark = edges.sparkSession
    t0 = time.time()
    src, dst = id_cols
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    if vertices is None:
        vertices = (
            e.select(F.col("src").alias("id"))
            .union(e.select(F.col("dst").alias("id")))
            .distinct()
        )
    verts = vertices.select("id").repartition(P, "id").cache()
    n = verts.count()
    if n == 0:
        return PageRankRun(
            verts.withColumn("rank", F.lit(0.0)), 0, [], 0.0, True
        )

    outdeg = e.groupBy("src").agg(F.count("*").alias("deg"))
    edges_deg = (
        e.join(outdeg, "src")
        .select("src", "dst", F.col("deg").cast("double").alias("deg"))
        .repartition(P, "src")
        .localCheckpoint(eager=True)  # sever lineage: static for all supersteps
    )

    # personalization vector (restricted to vertices, renormalized)
    if pers is not None:
        pv = verts.join(pers.select("id", "weight"), "id", "left").select(
            "id", F.coalesce(F.col("weight"), F.lit(0.0)).alias("w")
        )
        tot = pv.agg(F.sum("w")).first()[0] or 0.0
        if tot > 0:
            pvec = pv.select("id", (F.col("w") / F.lit(float(tot))).alias("p"))
        else:
            pvec = verts.select("id", F.lit(1.0 / n).alias("p"))
    else:
        pvec = verts.select("id", F.lit(1.0 / n).alias("p"))

    base = (
        pvec.join(outdeg.select(F.col("src").alias("id"), "deg"), "id", "left")
        .select("id", "p", F.col("deg").isNull().alias("dangling"))
        .repartition(P, "id")
        .localCheckpoint(eager=True)
    )

    # Superstep state MUST be round-tripped through parquet periodically:
    # localCheckpoint truncates the plan but the resulting LogicalRDD
    # inherits the parent plan's sizeInBytes estimate, and with the state
    # referenced twice per superstep that estimate compounds exponentially
    # (Catalyst's size-only stats visitor ends up multiplying thousand-digit
    # BigInts and the driver melts). Re-reading the written checkpoint
    # resets stats to the real file size — so the durable checkpoint IS the
    # stats/lineage reset, which is why it's always on (tempdir if the
    # caller gave no checkpoint_dir).
    durable = checkpoint_dir is not None
    ckpt_base = os.path.join(checkpoint_dir or tempfile.mkdtemp(prefix="deeprank_pr_"), run_id)
    os.makedirs(ckpt_base, exist_ok=True)
    start_step = 0
    state = None
    if resume and durable:
        done = _completed_supersteps(ckpt_base)
        if done:
            start_step = max(done)
            state = spark.read.parquet(
                os.path.join(ckpt_base, f"superstep={start_step}")
            ).repartition(P, "id")

    if state is None:
        state = base.select("id", F.lit(1.0 / n).alias("rank"))

    # dangling mass of the current state
    dm = (
        state.join(base.where("dangling").select("id"), "id")
        .agg(F.sum("rank"))
        .first()[0]
        or 0.0
    )

    deltas = []
    converged = False
    step = start_step
    while step < max_iter:
        step += 1
        it0 = time.time()
        joined = state.join(edges_deg, state["id"] == edges_deg["src"])
        contribs = joined.select(
            edges_deg["dst"].alias("id"),
            edges_deg["src"].alias("esrc"),
            (F.col("rank") / F.col("deg")).alias("c"),
        )
        if salt_buckets > 1:
            # explicit two-phase aggregation: pre-aggregate hub fan-in on
            # (dst, hash(src) % B) before the final per-dst combine, so a
            # power-law hub's contributions spread over B reducers.
            contribs = (
                contribs.withColumn(
                    "salt", F.pmod(F.xxhash64("esrc"), F.lit(salt_buckets))
                )
                .groupBy("id", "salt")
                .agg(F.sum("c").alias("c"))
            )
        summed = contribs.groupBy("id").agg(F.sum("c").alias("c"))

        new_state = (
            base.join(summed, "id", "left")
            .join(state.withColumnRenamed("rank", "prev"), "id")
            .select(
                "id",
                (
                    F.lit(alpha)
                    * (F.coalesce(F.col("c"), F.lit(0.0)) + F.lit(float(dm)) * F.col("p"))
                    + F.lit(1.0 - alpha) * F.col("p")
                ).alias("rank"),
                F.col("prev"),
                F.col("dangling"),
            )
            .localCheckpoint(eager=True)
        )
        row = new_state.agg(
            F.sum(F.abs(F.col("rank") - F.col("prev"))).alias("err"),
            F.sum(F.when(F.col("dangling"), F.col("rank")).otherwise(0.0)).alias("dm"),
        ).first()
        err, dm = float(row["err"]), float(row["dm"] or 0.0)
        state = new_state.select("id", "rank")
        wall_ms = (time.time() - it0) * 1000.0
        deltas.append({"superstep": step, "l1_delta": err, "wall_ms": wall_ms})

        if step % checkpoint_interval == 0 or err < n * tol:
            state = _write_superstep(
                state, ckpt_base, step, wall_ms, P, durable=durable
            )
        if err < n * tol:
            converged = True
            break

    if not converged:
        raise RuntimeError(f"pagerank_distributed: no convergence in {max_iter} supersteps")
    return PageRankRun(state, step, deltas, time.time() - t0, converged)


def _write_superstep(
    state: DataFrame,
    ckpt_base: str,
    step: int,
    wall_ms: float,
    num_partitions: int,
    durable: bool,
) -> DataFrame:
    """Write superstep state to parquet and return the re-read DataFrame
    (fresh lineage + realistic stats). Durable runs also append the
    per-partition lineage table and a _DONE marker."""
    path = os.path.join(ckpt_base, f"superstep={step}")
    state.write.mode("overwrite").parquet(path)
    if durable:
        _lineage_rows(state, step, wall_ms).write.mode("append").parquet(
            os.path.join(ckpt_base, "lineage")
        )
        with open(os.path.join(ckpt_base, f"_DONE_{step}"), "w") as f:
            json.dump({"superstep": step, "wall_ms": wall_ms}, f)
    return (
        state.sparkSession.read.parquet(path).repartition(num_partitions, "id")
    )


def _completed_supersteps(ckpt_base: str) -> list:
    """Local-FS marker scan; on a cluster this would go through the Hadoop
    FileSystem API — the marker protocol is identical."""
    out = []
    if not os.path.isdir(ckpt_base):
        return out
    for name in os.listdir(ckpt_base):
        if name.startswith("_DONE_"):
            out.append(int(name.split("_DONE_")[1]))
    return sorted(out)


def read_lineage(spark: SparkSession, checkpoint_dir: str, run_id: str) -> DataFrame:
    return spark.read.parquet(os.path.join(checkpoint_dir, run_id, "lineage"))
