"""Shortest paths (unweighted BFS levels) on one giant graph.

Beyond-reference link-graph kernel on the same superstep skeleton as
components/scc: distance relaxation is a hash-MIN exchange over dist+1.
Converges in O(eccentricity(source)) rounds; each round is one shuffle on
the vertex id plus the usual eager-checkpoint + periodic parquet reset
lineage discipline (_ResetDir, measured in pagerank.py).

Semantics = nx.single_source_shortest_path_length on the undirected
simple projection (directed=False) or the directed graph (directed=True);
unreachable vertices are absent, matching networkx.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .components import _ResetDir
from .superstep import KernelRun, SuperstepCheckpointer


def _frontier_state(dist: DataFrame, frontier: DataFrame) -> DataFrame:
    """One durable frame for a (dist map, frontier) pair: (id, dist,
    frontier bool). The frontier is always a subset of the dist map with
    the map's own dist values, so the pair round-trips losslessly."""
    return dist.join(
        frontier.select("id", F.lit(True).alias("frontier")), "id", "left"
    ).select("id", "dist", F.coalesce("frontier", F.lit(False)).alias("frontier"))


def sssp_distributed(
    edges: DataFrame,
    source,
    id_cols: tuple = ("src", "dst"),
    directed: bool = False,
    max_iter: int = 200,
    checkpoint_dir: str | None = None,
    run_id: str = "sssp",
    checkpoint_interval: int = 5,
    resume: bool = False,
    return_run: bool = False,
) -> DataFrame:
    """-> (id, dist) for every vertex reachable from `source`.

    Durable runs: `checkpoint_dir` persists the (dist, frontier) state as
    (id, dist, frontier) every `checkpoint_interval` rounds and on
    convergence — the shared superstep protocol (operators/superstep.py).
    Budget exhaustion still RAISES (refuse-to-mislabel), but a durable run
    persists the final frontier state first, so `resume=True` with a
    larger max_iter CONTINUES the search instead of restarting; rounds are
    pure functions of (dist, frontier), so the resumed distances equal the
    uninterrupted run's exactly.
    """
    src, dst = id_cols
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    if not directed:
        e = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    e = e.where(F.col("a") != F.col("b")).distinct().localCheckpoint(eager=True)
    spark = edges.sparkSession
    t0 = time.time()

    durable = checkpoint_dir is not None
    ckpt = (
        SuperstepCheckpointer(checkpoint_dir, run_id, ("id", "dist", "frontier"))
        if durable
        else None
    )
    rounds = 0
    converged = False
    metrics = []
    dist = frontier = None
    if durable and resume:
        st, done_rounds, was_converged = ckpt.resume(spark)
        if st is not None:
            dist = st.select("id", "dist")
            frontier = st.where("frontier").select("id", "dist")
            rounds = done_rounds
            converged = was_converged
    if dist is None:
        dist = spark.createDataFrame(
            [(source, 0)], "id long, dist int"
        ).localCheckpoint(eager=True)
        # frontier-based BFS: each round relaxes only the edges leaving the
        # vertices discovered last round (unweighted => a settled vertex
        # never improves), so per-round cost is O(frontier out-degree),
        # not O(|V|)
        frontier = dist

    kept = [dist]
    rdir = _ResetDir("sssp")
    last_written = rounds if durable and resume else -1
    n_new = None
    while not converged and rounds < max_iter:
        it0 = time.time()
        cand = (
            frontier.join(e, frontier["id"] == e["a"])
            .groupBy(e["b"].alias("id"))
            .agg((F.min("dist") + 1).alias("dist"))
        )
        frontier = cand.join(dist, "id", "leftanti").localCheckpoint(eager=True)
        n_new = frontier.count()
        if n_new > 0:
            dist = dist.union(frontier).localCheckpoint(eager=True)
            kept.append(dist)
            kept.append(frontier)
        rounds += 1
        wall_ms = (time.time() - it0) * 1000.0
        converged = n_new == 0
        metrics.append({"round": rounds, "new": int(n_new), "wall_ms": wall_ms})
        if durable and (rounds % checkpoint_interval == 0 or converged):
            st = ckpt.write(
                _frontier_state(dist, frontier), rounds, wall_ms, n_new, converged
            )
            dist = st.select("id", "dist")
            frontier = st.where("frontier").select("id", "dist")
            last_written = rounds
            kept.clear()
        elif (rounds % 5) == 0:
            dist = rdir.reset(dist, rounds)
            kept.clear()
            kept.append(frontier)
    if not converged:
        if durable and rounds > last_written:
            # persist the in-flight frontier so a resume with a larger
            # budget continues the search instead of restarting
            ckpt.write(
                _frontier_state(dist, frontier),
                rounds,
                metrics[-1]["wall_ms"] if metrics else 0.0,
                n_new if n_new is not None else -1,
                False,
            )
        # refuse-to-mislabel policy (same as scc_distributed): a truncated
        # distance map is indistinguishable from "unreachable" downstream
        raise RuntimeError(
            f"sssp: frontier non-empty after {max_iter} rounds; raise max_iter"
        )
    out = dist if durable else rdir.finalize(dist)
    if return_run:
        return KernelRun(out, rounds, metrics, time.time() - t0, converged)
    return out


def wsssp_distributed(
    edges: DataFrame,
    source,
    weight_col: str = "w",
    id_cols: tuple = ("src", "dst"),
    directed: bool = False,
    delta: float | None = None,
    max_iter: int = 500,
    checkpoint_dir: str | None = None,
    run_id: str = "wsssp",
    checkpoint_interval: int = 5,
    resume: bool = False,
    return_run: bool = False,
) -> DataFrame:
    """Weighted single-source shortest paths -> (id, dist double) for every
    reachable vertex (nx.single_source_dijkstra_path_length semantics;
    parallel edges collapse to their min weight; weights must be > 0).

    Delta-stepping-style bucketed relaxation (Meyer & Sanders 2003, public):
    each outer round expands only the frontier vertices whose tentative
    distance lies in the current bucket [B, B + delta) where B = min
    tentative distance over the frontier — the Dijkstra argument makes the
    min-distance vertex final each round, so far vertices are not
    re-relaxed while near ones are still settling (the wasted-relaxation
    problem of plain distributed Bellman-Ford). Any relaxation schedule
    reaches the same fixpoint, so `delta` affects round count and wasted
    work only, never the result; `delta=None` uses the mean edge weight.

    Per round: one scalar agg (bucket bound) + one shuffle on the vertex id
    (relax) + one merge join, under the same eager-checkpoint `_ResetDir`
    lineage discipline as the other kernels. Raises (refuse-to-mislabel)
    if the frontier is still non-empty after max_iter rounds.

    Durable runs: same protocol as sssp_distributed — (id, dist, frontier)
    persisted every `checkpoint_interval` rounds and before the budget
    raise, `resume=True` continues from the newest complete round. The
    fixpoint is delta-invariant (property-tested), so even a resume with a
    different `delta` reaches the same exact distances; the same delta
    reproduces the same round schedule.
    """
    src, dst = id_cols
    e = edges.select(
        F.col(src).alias("a"),
        F.col(dst).alias("b"),
        F.col(weight_col).cast("double").alias("w"),
    )
    if not directed:
        e = e.union(
            e.select(F.col("b").alias("a"), F.col("a").alias("b"), "w")
        )
    e = (
        e.where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
        .localCheckpoint(eager=True)
    )
    wmin, wavg = e.agg(F.min("w"), F.avg("w")).first()
    if wmin is not None and wmin <= 0:
        raise ValueError(f"wsssp: weights must be > 0, found min weight {wmin}")
    if delta is None:
        delta = float(wavg or 1.0)
    spark = edges.sparkSession
    t0 = time.time()

    durable = checkpoint_dir is not None
    ckpt = (
        SuperstepCheckpointer(checkpoint_dir, run_id, ("id", "dist", "frontier"))
        if durable
        else None
    )
    rounds = 0
    converged = False
    metrics = []
    dist = frontier = None
    if durable and resume:
        st, done_rounds, was_converged = ckpt.resume(spark)
        if st is not None:
            dist = st.select("id", "dist")
            frontier = st.where("frontier").select("id", "dist")
            rounds = done_rounds
            converged = was_converged
    if dist is None:
        dist = spark.createDataFrame(
            [(source, 0.0)], "id long, dist double"
        ).localCheckpoint(eager=True)
        # frontier = vertices whose tentative dist improved since last
        # expansion
        frontier = dist

    kept = [dist]
    # one _ResetDir per state frame: a reset dir is deleted when ITS OWN
    # next reset lands, so two frames sharing one rotation would delete
    # each other's still-referenced parquet
    rdir = _ResetDir("wsssp")
    rdir_f = _ResetDir("wsssp_frontier")
    last_written = rounds if durable and resume else -1
    n_front = None
    while not converged and rounds < max_iter:
        it0 = time.time()
        bound_row = frontier.agg(F.min("dist")).first()[0]
        if bound_row is None:  # resumed state with an empty frontier
            converged = True
            break
        bound = bound_row + delta
        bucket = frontier.where(F.col("dist") < bound)
        rest = frontier.where(F.col("dist") >= bound)
        relaxed = (
            bucket.join(e, bucket["id"] == e["a"])
            .groupBy(e["b"].alias("id"))
            .agg(F.min(F.col("dist") + F.col("w")).alias("nd"))
        )
        merged = dist.join(relaxed, "id", "full").select(
            "id",
            F.least(
                F.coalesce(F.col("dist"), F.lit(float("inf"))),
                F.coalesce(F.col("nd"), F.lit(float("inf"))),
            ).alias("dist"),
            (
                F.col("dist").isNull() | (F.col("nd") < F.col("dist"))
            ).alias("improved"),
        ).localCheckpoint(eager=True)
        dist = merged.select("id", "dist")
        improved = merged.where("improved").select("id")
        frontier = rest.select("id").join(
            improved, "id", "leftanti"
        ).unionByName(improved).join(dist, "id").localCheckpoint(eager=True)
        n_front = frontier.count()
        kept.append(merged)
        kept.append(frontier)
        rounds += 1
        wall_ms = (time.time() - it0) * 1000.0
        converged = n_front == 0
        metrics.append({"round": rounds, "frontier": int(n_front), "wall_ms": wall_ms})
        if durable and (rounds % checkpoint_interval == 0 or converged):
            st = ckpt.write(
                _frontier_state(dist, frontier), rounds, wall_ms, n_front, converged
            )
            dist = st.select("id", "dist")
            frontier = st.where("frontier").select("id", "dist")
            last_written = rounds
            kept.clear()
        elif (rounds % 5) == 0:
            dist = rdir.reset(dist, rounds)
            frontier = rdir_f.reset(frontier, rounds)
            kept.clear()
            kept.append(dist)
            kept.append(frontier)
    if not converged:
        if durable and rounds > last_written:
            ckpt.write(
                _frontier_state(dist, frontier),
                rounds,
                metrics[-1]["wall_ms"] if metrics else 0.0,
                n_front if n_front is not None else -1,
                False,
            )
        raise RuntimeError(
            f"wsssp: frontier non-empty after {max_iter} rounds; raise max_iter"
        )
    out = dist if durable else rdir.finalize(dist)
    if return_run:
        return KernelRun(out, rounds, metrics, time.time() - t0, converged)
    return out


def diameter_double_sweep(
    edges: DataFrame,
    id_cols: tuple = ("src", "dst"),
    max_iter: int = 200,
) -> dict:
    """Double-sweep diameter LOWER bound on the undirected projection
    (Magnien-Latapy-Habib 2009): BFS from the smallest vertex id, then
    BFS from the farthest vertex found (deterministic (dist, id)
    tie-break); the second eccentricity is the bound — exact on trees,
    tight in practice on real graphs. The exact diameter needs all-pairs
    (O(V) BFS rounds), the documented non-goal; the bound is what scale
    practice uses. Two sssp_distributed runs (frontier BFS, per-round
    cost = frontier out-degree); disconnected graphs bound the START
    vertex's component, the standard behavior. Returns
    {"lower_bound", "start", "far_vertex"}."""
    src, dst = id_cols
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).where(
        F.col("a") != F.col("b")
    )
    start = e.select(F.least("a", "b").alias("v")).agg(F.min("v")).first()[0]
    if start is None:
        return {"lower_bound": 0, "start": None, "far_vertex": None}
    d1 = sssp_distributed(e, source=start, id_cols=("a", "b"), max_iter=max_iter)
    far = d1.orderBy(F.desc("dist"), F.col("id")).first()
    d2 = sssp_distributed(
        e, source=far["id"], id_cols=("a", "b"), max_iter=max_iter
    )
    ecc = d2.agg(F.max("dist")).first()[0]
    return {"lower_bound": int(ecc), "start": start, "far_vertex": far["id"]}


def temporal_reachability(
    edges: DataFrame,
    source,
    ts_col: str = "ts",
    id_cols: tuple = ("src", "dst"),
    start_ts: int | None = None,
    max_iter: int = 200,
    checkpoint_dir: str | None = None,
    run_id: str = "treach",
    checkpoint_interval: int = 5,
    resume: bool = False,
    return_run: bool = False,
) -> DataFrame:
    """Earliest-arrival time-respecting reachability on a TEMPORAL edge
    table (src, dst, ts): a path is valid only if successive edge
    timestamps are non-decreasing — the right reachability notion for
    transcript/interaction graphs, where plain reachability overstates
    influence (an edge in the past cannot carry information that arrives
    later). -> (id, arrival) with arrival = the earliest long timestamp
    at which `source`'s influence can reach id (the source row carries
    start_ts); unreachable vertices are absent.

    start_ts: the moment the source starts (edges before it are
    unusable); default = min edge ts (source can take any edge).

    Frontier relaxation like sssp, with one structural difference:
    arrival times can improve MORE than once (a later-found earlier
    arrival at u re-opens u's out-edges), so this is Bellman-Ford-shaped
    — the frontier is "vertices whose arrival improved last round" and
    convergence is an empty improvement set. Non-decreasing chains inside
    one timestamp resolve across rounds (the >= comparison). Durable
    checkpoint/resume via the shared superstep protocol; budget
    exhaustion raises after persisting the in-flight state, like the
    other frontier kernels.
    """
    src, dst = id_cols
    e = (
        edges.select(
            F.col(src).alias("a"),
            F.col(dst).alias("b"),
            F.col(ts_col).cast("long").alias("t"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    spark = edges.sparkSession
    t0 = time.time()
    if start_ts is None:
        start_ts = e.agg(F.min("t")).first()[0]
        if start_ts is None:
            out = spark.createDataFrame([(source, 0)], "id long, arrival long").limit(0)
            return (
                KernelRun(out, 0, [], time.time() - t0, True) if return_run else out
            )

    durable = checkpoint_dir is not None
    ckpt = (
        SuperstepCheckpointer(checkpoint_dir, run_id, ("id", "arrival", "frontier"))
        if durable
        else None
    )
    rounds = 0
    converged = False
    metrics = []
    arr = frontier = None
    if durable and resume:
        st, done_rounds, was_converged = ckpt.resume(spark)
        if st is not None:
            arr = st.select("id", "arrival")
            frontier = st.where("frontier").select("id", "arrival")
            rounds = done_rounds
            converged = was_converged
    if arr is None:
        arr = spark.createDataFrame(
            [(source, int(start_ts))], "id long, arrival long"
        ).localCheckpoint(eager=True)
        frontier = arr

    kept = [arr]
    rdir = _ResetDir("treach")
    last_written = rounds if durable and resume else -1
    n_imp = None
    while not converged and rounds < max_iter:
        it0 = time.time()
        cand = (
            frontier.join(e, frontier["id"] == e["a"])
            .where(F.col("t") >= F.col("arrival"))
            .groupBy(e["b"].alias("id"))
            .agg(F.min("t").alias("cand"))
        )
        improved = (
            cand.join(arr, "id", "left")
            .where(F.col("arrival").isNull() | (F.col("cand") < F.col("arrival")))
            .select("id", F.col("cand").alias("arrival"))
            .localCheckpoint(eager=True)
        )
        n_imp = improved.count()
        if n_imp > 0:
            arr = (
                arr.join(improved.select("id"), "id", "left_anti")
                .union(improved)
                .localCheckpoint(eager=True)
            )
            kept.append(arr)
            kept.append(improved)
        frontier = improved
        rounds += 1
        wall_ms = (time.time() - it0) * 1000.0
        converged = n_imp == 0
        metrics.append({"round": rounds, "improved": int(n_imp), "wall_ms": wall_ms})
        if durable and (rounds % checkpoint_interval == 0 or converged):
            st = ckpt.write(
                arr.join(
                    frontier.select("id", F.lit(True).alias("frontier")),
                    "id",
                    "left",
                ).select(
                    "id", "arrival", F.coalesce("frontier", F.lit(False)).alias("frontier")
                ),
                rounds,
                wall_ms,
                n_imp,
                converged,
            )
            arr = st.select("id", "arrival")
            frontier = st.where("frontier").select("id", "arrival")
            last_written = rounds
            kept.clear()
        elif (rounds % 5) == 0:
            arr = rdir.reset(arr, rounds)
            kept.clear()
            kept.append(frontier)
    if not converged:
        if durable and rounds > last_written:
            ckpt.write(
                arr.join(
                    frontier.select("id", F.lit(True).alias("frontier")),
                    "id",
                    "left",
                ).select(
                    "id", "arrival", F.coalesce("frontier", F.lit(False)).alias("frontier")
                ),
                rounds,
                metrics[-1]["wall_ms"] if metrics else 0.0,
                n_imp if n_imp is not None else -1,
                False,
            )
        raise RuntimeError(
            f"temporal_reachability: improvements after {max_iter} rounds; "
            "raise max_iter"
        )
    out = arr if durable else rdir.finalize(arr)
    if return_run:
        return KernelRun(out, rounds, metrics, time.time() - t0, converged)
    return out
