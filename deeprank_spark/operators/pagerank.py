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

import atexit
import json
import os
import shutil
import tempfile
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Observation, SparkSession
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


def _dedup_pairs(src_idx: np.ndarray, dst_idx: np.ndarray, n: int):
    """DiGraph semantics: parallel edges collapse. Accepting multi-edges
    here lets callers feed the raw edge cascade straight into the kernel's
    conv_id shuffle — the per-conv dedup is a local np.unique instead of a
    full distinct shuffle over the corpus-wide edge table. Also pins the
    bincount summation order to sorted (src, dst), independent of shuffle
    arrival order."""
    pairs = src_idx.astype(np.int64) * n + dst_idx.astype(np.int64)
    uniq = np.unique(pairs)
    return uniq // n, uniq % n


def _power_iteration(
    src_idx: np.ndarray,
    dst_idx: np.ndarray,
    n: int,
    p: np.ndarray,
    alpha: float,
    tol: float,
    max_iter: int,
) -> np.ndarray:
    src_idx, dst_idx = _dedup_pairs(src_idx, dst_idx, n)
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


def _batched_partition_pagerank(
    batches, alpha: float, tol: float, max_iter: int
):
    """mapInPandas body: run the per-conv kernel for EVERY conversation in
    the partition out of two whole-partition numpy string arrays, emitting
    one output frame per partition. Identical float schedule to
    _conv_pagerank_pdf — same np.unique node order, same bincount SpMV per
    conversation — but the pandas-DataFrame + Arrow round-trip is paid once
    per PARTITION instead of once per (tiny) conversation group, which is
    the difference between ~5 ms/conv of framework overhead and ~0.3 ms/conv
    of numpy at 30-turn conversation sizes."""
    chunks = [p for p in batches if len(p)]
    if not chunks:
        return
    pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
    conv = pdf["conv_id"].to_numpy()
    # stable sort: groups conversations while preserving within-conv arrival
    # order (the same summation-order equivalence class as the grouped path;
    # group arrival order was never deterministic to begin with)
    order = np.argsort(conv, kind="stable")
    conv = conv[order]
    skey = (pdf["src_kind"].astype(str) + pdf["src"].astype(str)).to_numpy()[order]
    dkey = (pdf["dst_kind"].astype(str) + pdf["dst"].astype(str)).to_numpy()[order]
    uniq, starts = np.unique(conv, return_index=True)
    bounds = np.append(starts, len(conv))
    out_conv, out_kind, out_key, out_rank = [], [], [], []
    for i in range(len(uniq)):
        a, b = bounds[i], bounds[i + 1]
        m = b - a
        nodes, inv = np.unique(
            np.concatenate([skey[a:b], dkey[a:b]]), return_inverse=True
        )
        n = len(nodes)
        p = np.full(n, 1.0 / n, dtype=np.float64)
        x = _power_iteration(inv[:m], inv[m:], n, p, alpha, tol, max_iter)
        out_conv.append(np.full(n, uniq[i], dtype=object))
        out_kind.append(np.array([s[0] for s in nodes], dtype=object))
        out_key.append(np.array([s[1:] for s in nodes], dtype=object))
        out_rank.append(x)
    yield pd.DataFrame(
        {
            "conv_id": np.concatenate(out_conv),
            "kind": np.concatenate(out_kind),
            "key": np.concatenate(out_key),
            "rank": np.concatenate(out_rank),
        }
    )


def pagerank_per_conv(
    gedges: DataFrame,
    pers: DataFrame | None = None,
    alpha: float = 0.85,
    tol: float = 1.0e-6,
    max_iter: int = 100,
    batched: bool | None = None,
) -> DataFrame:
    """ranks(conv_id, kind, key, rank) for every conversation graph.

    gedges: (conv_id, src_kind, src, dst_kind, dst) edge pairs — duplicates
    allowed (DiGraph collapse happens inside the kernel via a per-conv
    np.unique, so callers can feed the raw multi-edge cascade without
    paying a corpus-wide distinct shuffle first).
    pers:   optional (conv_id, kind, key, weight) personalization rows.

    batched (default True when pers is None; env DEEPRANK_PR_BATCHED=0
    forces the grouped path): hash-repartition by conv_id + mapInPandas,
    processing every conversation in a partition from two whole-partition
    numpy arrays. Same shuffle count (one), same per-conv float schedule;
    it exists because applyInPandas pays its pandas/Arrow framework cost
    per GROUP, which dominates when groups are 30-turn conversations
    (measured ~2.4x on the 30k-conv flagship stage). The personalization
    path keeps the cogroup formulation."""
    if batched is None:
        batched = pers is None and os.environ.get(
            "DEEPRANK_PR_BATCHED", "1"
        ) != "0"

    if pers is None:
        if batched:
            P = int(
                gedges.sparkSession.conf.get("spark.sql.shuffle.partitions")
            )

            def run_parts(batches):
                yield from _batched_partition_pagerank(
                    batches, alpha, tol, max_iter
                )

            return gedges.repartition(P, "conv_id").mapInPandas(
                run_parts, PER_CONV_SCHEMA
            )

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
    checkpoint_interval: int = 8,
    resume: bool = False,
    num_partitions: int | None = None,
    verbose: bool = False,
    weight_col: str | None = None,
) -> PageRankRun:
    """Superstep SpMV PageRank on one (possibly giant) graph.

    edges: DataFrame with long/str columns id_cols=(src, dst); multi-edges
    should be pre-deduped by the caller for DiGraph semantics.
    pers: optional (id, weight).
    weight_col: optional POSITIVE edge-weight column — nx weighted
    semantics (contribution rank*w / sum of out-weights, the stochastic
    normalization nx.pagerank's weight= applies). One divergence,
    documented: a vertex whose out-weights sum to 0 is treated as
    DANGLING (nx propagates nan); weights must be >= 0. When None the
    plan is expression-identical to the unweighted kernel (count-based
    degree), so the flagship path is untouched.

    Scale design: `edges_deg` (edges ⋈ out-degree) is materialized once,
    hash-partitioned on src and cached — every superstep reuses that
    partitioning for the gather join. Contributions aggregate with Spark's
    partial (map-side) aggregation; `salt_buckets > 0` adds an explicit
    two-phase (dst, salt)->dst aggregation for power-law fan-in hubs.
    One driver action per superstep (the eager state checkpoint); the
    (L1 delta, dangling mass) read rides it as observed metrics.
    `checkpoint_dir` makes state durable every `checkpoint_interval`
    supersteps plus a per-partition lineage table; `resume=True` restarts
    from the latest complete superstep and reproduces the identical final
    state (same floating-point schedule).

    NOT re-entrant on a shared SparkSession: the loop pins
    spark.sql.shuffle.partitions to P and disables AQE partition
    coalescing for its duration (restored in finally) so superstep
    co-partitioning survives; a concurrent query on the SAME session would
    run under those settings. Kernel jobs own their session (spark-submit
    per job, jobs/run_flagship.py); give concurrent interactive work its
    own session or serialize kernel calls.
    """
    spark = edges.sparkSession
    t0 = time.time()
    src, dst = id_cols
    if weight_col is not None:
        e = edges.select(
            F.col(src).alias("src"),
            F.col(dst).alias("dst"),
            F.col(weight_col).cast("double").alias("w"),
        )
    else:
        e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))

    if vertices is None:
        vertices = (
            e.select(F.col("src").alias("id"))
            .union(e.select(F.col("dst").alias("id")))
            .distinct()
        )
    verts = vertices.select("id").cache()
    n = verts.count()
    if n == 0:
        return PageRankRun(
            verts.withColumn("rank", F.lit(0.0)), 0, [], 0.0, True
        )

    # Partition count scales with graph size (at 10^12 edges the caller sets
    # it explicitly; small graphs shouldn't pay 100-task supersteps). All
    # superstep shuffles use P so state/contribs/base stay co-partitioned on
    # the vertex id and the per-superstep joins are shuffle-free — the only
    # shuffle each superstep is the contribution gather (groupBy id).
    # P follows EDGES as well as vertices: the gather join and the
    # contribution shuffle move one row per edge, so a dense graph (sf0.1
    # bipartite: 16k vertices / 587k edges) was running P=4 supersteps on
    # a 32-core host. Interleaved min-of-3 on that graph: P=4 8.78 s,
    # P=8 8.41 s, edge-derived auto P=9 8.57 s (includes the m-count's
    # ~0.15 s), P=32 WORSE at 12.7 s — per-task overhead dominates at
    # this size, so the cap stays. The m-count is one extra pass over the
    # input; callers at real scale pass num_partitions and skip it.
    default_P = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if num_partitions:
        P = num_partitions
    else:
        m = e.count()
        P = max(4, min(default_P, max(n // 50_000, m // 100_000) + 4))
    saved_conf = {
        "spark.sql.shuffle.partitions": spark.conf.get("spark.sql.shuffle.partitions"),
        # AQE coalescing would change shuffle partition counts mid-loop and
        # defeat co-partitioning reuse across supersteps
        "spark.sql.adaptive.coalescePartitions.enabled": spark.conf.get(
            "spark.sql.adaptive.coalescePartitions.enabled"
        ),
    }
    spark.conf.set("spark.sql.shuffle.partitions", str(P))
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

    if weight_col is not None:
        # stochastic normalization over out-WEIGHT sums; an all-zero
        # out-weight vertex drops out of outdeg and is dangling (see doc)
        outdeg = (
            e.groupBy("src").agg(F.sum("w").alias("deg")).where(F.col("deg") > 0)
        )
    else:
        outdeg = e.groupBy("src").agg(F.count("*").alias("deg"))
    # renamed e_* columns: the superstep state's lineage contains this
    # frame, so later joins against it are self-joins — name-based
    # resolution on unique names sidesteps attribute-id ambiguity
    ecols = [
        F.col("src").alias("e_src"),
        F.col("dst").alias("e_dst"),
        F.col("deg").cast("double").alias("e_deg"),
    ] + ([F.col("w").alias("e_w")] if weight_col is not None else [])
    edges_deg = (
        e.join(outdeg, "src").select(*ecols).repartition(P, "e_src").persist()
    )
    edges_deg.count()  # materialize once; cached stats are then accurate

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
        .persist()
    )
    base.count()

    # Superstep state management (measured, not guessed — see git history):
    # each step eager-localCheckpoints the new state (constant logical-plan
    # depth), BUT Spark's local checkpoint keeps the full RDD lineage as its
    # recovery path — if the driver GC drops an old step's DataFrame, the
    # ContextCleaner evicts its blocks and every later step silently
    # recomputes a doubly-referenced chain (wall time doubles per step).
    # So (a) strong references to every checkpointed state are held in
    # `kept` between resets, and (b) every checkpoint_interval steps the
    # state is round-tripped through parquet, which genuinely truncates
    # lineage and lets the old blocks be freed. Non-durable runs round-trip
    # through a tempdir; durable runs additionally write the per-partition
    # lineage table + _DONE markers for resume.
    durable = checkpoint_dir is not None
    if not durable:
        # RAM-backed tempdir when available: the non-durable round-trip is
        # only a lineage truncation point, it doesn't need to survive
        tmp_parent = "/dev/shm" if os.path.isdir("/dev/shm") else None
        checkpoint_dir = tempfile.mkdtemp(prefix="deeprank_pr_", dir=tmp_parent)
    ckpt_base = os.path.join(checkpoint_dir, run_id)
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
    kept = []  # strong refs: keep checkpoint blocks alive between resets
    prev_ckpt = None  # non-durable: last superstep dir kept on tmpfs
    try:
        while step < max_iter:
            step += 1
            it0 = time.time()
            joined = state.select(
                F.col("id").alias("sid"), "rank"
            ).join(edges_deg, F.col("sid") == F.col("e_src"))
            cexpr = (
                F.col("rank") * F.col("e_w") / F.col("e_deg")
                if weight_col is not None
                else F.col("rank") / F.col("e_deg")
            )
            contribs = joined.select(
                F.col("e_dst").alias("id"),
                F.col("e_src").alias("esrc"),
                cexpr.alias("c"),
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

            # convergence metrics ride the checkpoint job itself
            # (CollectMetrics above the select, harvested by the eager
            # materialization) — one driver action per superstep, not two
            obs = Observation(f"pr_step_{run_id}_{step}")
            new_state = (
                base.join(summed, "id", "left")
                .join(state.select("id", F.col("rank").alias("prev")), "id")
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
                .observe(
                    obs,
                    F.sum(F.abs(F.col("rank") - F.col("prev"))).alias("err"),
                    F.sum(
                        F.when(F.col("dangling"), F.col("rank")).otherwise(0.0)
                    ).alias("dm"),
                )
                # EAGER local checkpoint: truncates logical plan AND rdd
                # lineage at materialization (Spark 4 LogicalRDD stats
                # don't compound, so no parquet round-trip needed). Eager
                # matters: a lazy localCheckpoint materialized through a
                # downstream action does NOT truncate lineage, so when the
                # driver GC drops old step DataFrames their blocks vanish
                # and later steps cascade-recompute from scratch.
                .localCheckpoint(eager=True)
            )
            row = obs.get
            err, dm = float(row["err"]), float(row["dm"] or 0.0)
            kept.append(new_state)
            state = new_state.select("id", "rank")
            wall_ms = (time.time() - it0) * 1000.0
            deltas.append({"superstep": step, "l1_delta": err, "wall_ms": wall_ms})
            if verbose:
                print(f"[pagerank] step={step} l1={err:.3e} wall_ms={wall_ms:.0f}", flush=True)

            if step % checkpoint_interval == 0 or (tol > 0 and err < n * tol):
                state = _write_superstep(
                    state, ckpt_base, step, wall_ms, P, durable=durable
                )
                kept.clear()  # parquet re-read is lineage-free: old blocks can go
                if not durable:
                    # non-durable runs are lineage resets, not recovery
                    # points: once the new round-trip exists the previous
                    # superstep dir on tmpfs is dead weight — delete it
                    if prev_ckpt is not None:
                        shutil.rmtree(prev_ckpt, ignore_errors=True)
                    prev_ckpt = os.path.join(ckpt_base, f"superstep={step}")
            if tol > 0 and err < n * tol:
                converged = True
                break
    finally:
        for k, v in saved_conf.items():
            spark.conf.set(k, v)
        edges_deg.unpersist()
        base.unpersist()
        verts.unpersist()

    if tol <= 0:
        # fixed-iteration mode: exactly max_iter supersteps, deterministic
        # superstep count (what a SQL-unrolled differential oracle needs)
        converged = True
    if not converged:
        if not durable:
            shutil.rmtree(checkpoint_dir, ignore_errors=True)
        raise RuntimeError(f"pagerank_distributed: no convergence in {max_iter} supersteps")
    if not durable:
        # pin the final state into block storage; the last superstep dir
        # stays on tmpfs until interpreter exit (atexit) because it is the
        # checkpoint's lineage recovery path — deleting it eagerly would
        # make run.ranks unrecoverable after executor block loss. Earlier
        # superstep dirs were already deleted incrementally in the loop.
        state = state.localCheckpoint(eager=True)
        atexit.register(shutil.rmtree, checkpoint_dir, ignore_errors=True)
    return PageRankRun(state, step, deltas, time.time() - t0, converged)


def _write_superstep(
    state: DataFrame,
    ckpt_base: str,
    step: int,
    wall_ms: float,
    num_partitions: int,
    durable: bool,
) -> DataFrame:
    """Parquet round-trip: the real lineage truncation point. Durable runs
    also append the per-partition lineage table and a _DONE marker (resume
    scans the markers). Durable state lands SORTED on id within each
    (hash) partition file, so row-group min/max stats let a point lookup
    of one vertex's rank at a checkpointed superstep prune to ~one row
    group per file. Deliberately NOT repartitionByRange: the range
    partitioner samples boundaries with an RDD-id-seeded RNG, so its
    layout varies between runs of identical data and demotes the
    cross-run bitwise-resume guarantee to ~1e-18 float wiggle (measured);
    hash partitioning + in-file sort is fully value-determined."""
    path = os.path.join(ckpt_base, f"superstep={step}")
    if durable:
        state.sortWithinPartitions("id").write.mode("overwrite").parquet(path)
    else:
        # non-durable resets are pure lineage truncation on tmpfs: skip
        # the sort, nothing ever point-reads these
        state.write.mode("overwrite").parquet(path)
    if durable:
        _lineage_rows(state, step, wall_ms).write.mode("append").parquet(
            os.path.join(ckpt_base, "lineage")
        )
        with open(os.path.join(ckpt_base, f"_DONE_{step}"), "w") as f:
            json.dump({"superstep": step, "wall_ms": wall_ms}, f)
    return state.sparkSession.read.parquet(path).repartition(
        num_partitions, "id"
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
