"""Embedding similarity search (brute-force + LSH-bucketed ANN).

Over an `embeddings(vec_id, embedding array<float>, label)` table:

- cosine_topk: exact brute-force top-k neighbors for a set of query vectors.
  The dot product is a zip_with/aggregate Catalyst expression (JVM-side);
  queries broadcast against the corpus, so the corpus is scanned once —
  at 100 TB this is the embarrassingly parallel baseline.
- cosine_near_pairs: all-pairs above a cosine threshold. Default path is
  BLOCKED: multi-table sign-LSH candidate generation + exact rescoring
  (no cartesian in the plan); `exact=True` keeps the O(n^2) crossJoin as a
  small-n verifier. LSH recall is threshold-dependent — see
  lsh_tables_for_recall for the standard (1-(1-p1^P)^T) sizing formula.
- random_hyperplane_lsh / ann_topk_lsh: sign-LSH buckets from deterministic
  md5-derived hyperplanes (engine-portable: the identical bucket ids are
  computable in ANSI-SQL/DuckDB, which is how the driver oracles
  ann_lsh_topk), multi-probe over hamming-1 neighbor buckets for recall,
  then exact rescoring within candidate buckets.

All hyperplanes are hash-derived (md5 of "plane|dim|seed") — reproducible
across runs, engines and languages; no RNG state is shipped to executors.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    queries: (query_id, embedding). -> (query_id, vec_id, cosine, rn) with
    rn in [1..k], ties broken by vec_id; self-matches excluded when ids
    collide.
    """
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv"))
    q = queries.select(F.col("query_id"), F.col(vec_col).alias("qv"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            (
                _dot(F.col("qv"), F.col("cv"))
                / (_norm(F.col("qv")) * _norm(F.col("cv")))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
    )


def _hyperplane_component(plane: int, dim_idx, seed: int) -> F.Column:
    """Deterministic pseudo-random component in [-1, 1): derived from
    md5("plane|dim|seed"). md5 (unlike xxhash64) exists in every engine,
    so the DuckDB oracle recomputes bit-identical hyperplanes:
    (CAST('0x'||substr(md5(p||'|'||i||'|'||seed),1,15) AS UBIGINT)
     % 2000003) / 1000001.5 - 1."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.lit(str(plane)),
                    dim_idx.cast("long").cast("string"),
                    F.lit(str(seed)),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    return (F.pmod(h, F.lit(2000003)).cast("double") / 1000001.5) - 1.0


def _sign_bit(vec_col: str, plane: int, seed: int) -> F.Column:
    """1 iff dot(v, hyperplane(plane)) >= 0 (scale-invariant)."""
    prod = F.aggregate(
        F.zip_with(
            F.col(vec_col),
            F.sequence(F.lit(0), F.size(F.col(vec_col)) - 1),
            lambda x, i: x.cast("double") * _hyperplane_component(plane, i, seed),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.when(prod >= 0, F.lit(1)).otherwise(F.lit(0))


def random_hyperplane_lsh(
    df: DataFrame,
    vec_col: str = "embedding",
    num_planes: int = 12,
    seed: int = 42,
    out_col: str = "bucket",
    plane_offset: int = 0,
) -> DataFrame:
    """Sign-LSH bucket id from num_planes deterministic hyperplanes.
    Bit p (global plane index plane_offset+p) has weight 2^(num_planes-1-p)."""
    bucket = F.lit(0).cast("long")
    for p in range(num_planes):
        bucket = bucket * 2 + _sign_bit(vec_col, plane_offset + p, seed)
    return df.withColumn(out_col, bucket)


def lsh_tables_for_recall(
    threshold: float, planes_per_table: int, target_recall: float = 0.999
) -> int:
    """Standard multi-table sign-LSH sizing: a pair at cosine=threshold
    collides per plane with p1 = 1 - acos(threshold)/pi, per table with
    p1^P; T tables give recall 1-(1-p1^P)^T. Returns the smallest T
    reaching target_recall AT the threshold (higher-cosine pairs do
    better). Low thresholds (e.g. 0.4) need many tables and prune little —
    that is a property of the problem, not the implementation; near-dup
    thresholds (>=0.9) prune hard with few tables."""
    p1 = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    p_table = p1 ** planes_per_table
    if p_table >= 1.0:
        return 1
    return max(1, math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - p_table)))


def multitable_lsh_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_tables: int = 20,
    planes_per_table: int = 2,
    seed: int = 42,
) -> DataFrame:
    """-> narrow (id, tbl, bucket): one row per (vector, table). Table t
    uses global planes [t*P, (t+1)*P). Only (id, bucket) leave the scan —
    vectors are NOT carried through the T-way explosion, so the shuffle
    payload is O(n*T*16 bytes) regardless of dimension."""
    per_table = []
    for t in range(num_tables):
        b = F.lit(0).cast("long")
        for p in range(planes_per_table):
            b = b * 2 + _sign_bit(vec_col, t * planes_per_table + p, seed)
        per_table.append(b)
    return df.select(
        F.col(id_col).alias("id"), F.posexplode(F.array(*per_table)).alias("tbl", "bucket")
    )


def cosine_near_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
    num_tables: int | None = None,
    planes_per_table: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (id_a < id_b) with
    cosine >= threshold.

    Default path is BLOCKED: multi-table sign-LSH candidates (narrow
    bucket self-join, no cartesian) -> distinct pairs -> exact cosine
    rescore -> threshold filter. num_tables defaults to
    lsh_tables_for_recall(threshold, planes_per_table) so recall at the
    threshold is >=0.999 by the standard collision bound; the rescore is
    exact, so false positives are impossible. `exact=True` is the O(n^2)
    crossJoin verifier for small n / recall audits.
    """
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    score = (
        _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    ).alias("cosine")
    if exact:
        return (
            a.join(b, F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", score)
            .where(F.col("cosine") >= threshold)
        )
    if num_tables is None:
        num_tables = lsh_tables_for_recall(threshold, planes_per_table)
    bk = multitable_lsh_buckets(
        df, id_col, vec_col, num_tables, planes_per_table, seed
    )
    cand = (
        bk.alias("x")
        .join(bk.alias("y"), ["tbl", "bucket"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", score)
        .where(F.col("cosine") >= threshold)
    )


def _combined_bucket(vec_col: str, table: int, planes: int, seed: int) -> F.Column:
    """Bucket of table `table` (global planes table*planes..+planes-1)
    offset into its own keyspace: table * 2^planes + bucket bits. One long
    key encodes (table, bucket), so the candidate join is a single-key
    equi-join and hamming probes (XOR on the low bits) stay in-table."""
    b = F.lit(0).cast("long")
    for p in range(planes):
        b = b * 2 + _sign_bit(vec_col, table * planes + p, seed)
    return b + F.lit(table * (1 << planes)).cast("long")


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    seed: int = 42,
    probe_radius: int = 1,
    num_tables: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates share any of the query's probe
    buckets, exact cosine rescoring within the candidate set. Two recall
    levers compose:

    - multi-probe (probe_radius=1): each table also probes the num_planes
      hamming-1 neighbor buckets, recovering near-boundary sign flips;
    - multi-table (num_tables>1): independent hyperplane sets; a neighbor
      at per-plane collision prob p1 is found with 1-(1-p1^P)^T — the
      lever that reaches high recall on WEAKLY similar neighbors (low
      cosine => p1 near 0.5), where single-table multi-probe saturates.

    Per-query probe cost: num_tables * (1 + probe_radius*num_planes)
    bucket lookups; measured recall@5 vs the exact top-k is reported as
    ann_lsh_recall_at_5 in bench.py output."""
    comb = [
        _combined_bucket("cv", t, num_planes, seed) for t in range(num_tables)
    ]
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv")
    ).select("vec_id", "cv", F.explode(F.array(*comb)).alias("bucket"))
    qcomb = []
    for t in range(num_tables):
        base = _combined_bucket("qv", t, num_planes, seed)
        qcomb.append(base)
        if probe_radius >= 1:
            qcomb += [base.bitwiseXOR(F.lit(1 << j)) for j in range(num_planes)]
    q = queries.select(
        "query_id", F.col(vec_col).alias("qv")
    ).select("query_id", "qv", F.explode(F.array(*qcomb)).alias("bucket"))
    cand = (
        q.join(c, "bucket")
        .where(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "qv", "vec_id", "cv")
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = cand.select(
        "query_id",
        "vec_id",
        (
            _dot(F.col("qv"), F.col("cv"))
            / (_norm(F.col("qv")) * _norm(F.col("cv")))
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("vec_id"))
    return scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: deterministic Lloyd cells + nprobe search
# ---------------------------------------------------------------------------


def _dist2(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def ivf_centroids(
    corpus: DataFrame,
    k_cells: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic Lloyd k-means -> (cell, cv array<double>).

    Init is k_cells vectors STRIDE-SPACED in id order (ranks 1, 1+s,
    1+2s, ... with s = floor(n/k)) — deterministic (no RNG, so the DuckDB
    oracle reproduces the identical schedule) and spread across the
    corpus, unlike a first-k init which lands every seed in whatever
    cluster owns the smallest ids; each of the FIXED `iters` rounds is
    a broadcast argmin-assignment join + a per-dimension mean (posexplode →
    map-side-combined avg → re-assembled array). Ties in the argmin break
    on the cell index. Cells that lose all members drop out (both engines
    agree: a mean over zero rows is no row). The driver loop is over
    k_cells-sized DataFrames only — corpus passes are one broadcast join
    per round, embarrassingly parallel at 100 TB."""
    # The global row_number here is the init step only (k rows kept); at
    # cluster scale swap it for a deterministic id-stride or sample —
    # the iteration loop below never needs a global sort.
    n = corpus.count()
    stride = max(1, n // k_cells)
    w0 = Window.orderBy(id_col)
    cent = (
        corpus.select(id_col, vec_col)
        .withColumn("rk", F.row_number().over(w0) - 1)
        .where(F.col("rk") % stride == 0)
        .where(F.col("rk") < stride * k_cells)
        .select(
            (F.col("rk") / stride).cast("int").alias("cell"),
            F.col(vec_col).cast("array<double>").alias("cv"),
        )
        .localCheckpoint(eager=True)
    )
    vecs = corpus.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("v")
    )
    for _ in range(iters):
        wa = Window.partitionBy("vid").orderBy("d2", "cell")
        assigned = (
            vecs.crossJoin(F.broadcast(cent))
            .select(
                "vid", "v", "cell", _dist2(F.col("v"), F.col("cv")).alias("d2")
            )
            .withColumn("rn", F.row_number().over(wa))
            .where(F.col("rn") == 1)
        )
        dims = assigned.select(
            "cell", F.posexplode(F.col("v").cast("array<double>")).alias("pos", "x")
        )
        # ROUND(avg, 12): F.avg's summation order is shuffle-dependent
        # (~1e-16 relative noise) and DuckDB's AVG sums in its own order;
        # rounding the centroid coordinates makes the argmin assignment —
        # and so the whole candidate set — run- and engine-deterministic
        # whenever true mean differences exceed 1e-12 (data is O(1))
        means = dims.groupBy("cell", "pos").agg(F.round(F.avg("x"), 12).alias("m"))
        cent = (
            means.groupBy("cell")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("cv")
            )
            .localCheckpoint(eager=True)
        )
    return cent


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (vec_id, cell): nearest-centroid cell per vector."""
    wa = Window.partitionBy(id_col).orderBy("d2", "cell")
    return (
        corpus.select(id_col, vec_col)
        .crossJoin(F.broadcast(centroids))
        .select(
            id_col,
            "cell",
            _dist2(F.col(vec_col), F.col("cv")).alias("d2"),
        )
        .withColumn("rn", F.row_number().over(wa))
        .where(F.col("rn") == 1)
        .select(id_col, "cell")
    )


def ann_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k_cells: int = 16,
    iters: int = 3,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: probe the nprobe nearest cells per query, exact cosine
    rescore within them — the inverted-file alternative to the sign-LSH
    path (same output shape as ann_topk_lsh). The cell assignment is the
    100 TB partitioning lever: vectors co-partition by cell, a query
    touches nprobe/k_cells of the corpus."""
    cent = ivf_centroids(corpus, k_cells=k_cells, iters=iters,
                         id_col=id_col, vec_col=vec_col)
    assign = ivf_assign(corpus, cent, id_col=id_col, vec_col=vec_col)
    wq = Window.partitionBy("query_id").orderBy("d2", "cell")
    probes = (
        queries.select("query_id", vec_col)
        .crossJoin(F.broadcast(cent))
        .select(
            "query_id", "cell", _dist2(F.col(vec_col), F.col("cv")).alias("d2")
        )
        .withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= nprobe)
        .select("query_id", "cell")
    )
    cand = probes.join(assign, "cell").select("query_id", id_col).where(
        F.col("query_id") != F.col(id_col)
    )
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("cv2"))
    q = queries.select("query_id", F.col(vec_col).alias("qv"))
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(c, id_col)
        .select(
            "query_id",
            id_col,
            (
                _dot(F.col("qv"), F.col("cv2"))
                / (_norm(F.col("qv")) * _norm(F.col("cv2")))
            ).alias("cosine"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col(id_col))
    return scored.withColumn("rn", F.row_number().over(wr)).where(F.col("rn") <= k)


# ---------------------------------------------------------------------------
# SemDeDup: semantic (embedding-space) deduplication
# ---------------------------------------------------------------------------


def _subcell_means(seeded: DataFrame) -> DataFrame:
    """(cell_key, sub, v) -> (cell_key, sub, cv): per-(cell, subcell)
    centroid, same distributed posexplode->avg->reassemble shape (and the
    same ROUND 12 determinism contract) as ivf_centroids."""
    dims = seeded.select(
        "cell_key", "sub",
        F.posexplode(F.col("v").cast("array<double>")).alias("pos", "x"),
    )
    means = dims.groupBy("cell_key", "sub", "pos").agg(
        F.round(F.avg("x"), 12).alias("m")
    )
    return means.groupBy("cell_key", "sub").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "m"))),
            lambda s: s["m"],
        ).alias("cv")
    )


def _subcell_assign(hot_rows: DataFrame, subcent: DataFrame, id_col: str) -> DataFrame:
    """Argmin re-assignment of hot-cell rows to their cell's subcentroids
    (broadcast join — subcent is #hot_cells x split_factor rows). Ties
    break on the subcell index, like ivf_assign."""
    wa = Window.partitionBy("cell_key", id_col).orderBy("d2", "sub")
    return (
        hot_rows.join(F.broadcast(subcent), "cell_key")
        .select(
            "cell_key", id_col, "cell", "v", "sub",
            _dist2(F.col("v"), F.col("cv")).alias("d2"),
        )
        .withColumn("rn", F.row_number().over(wa))
        .where(F.col("rn") == 1)
        .drop("rn", "d2")
    )


def _split_hot_cells(
    rows: DataFrame,
    cents: DataFrame,
    cell_cap: int,
    split_factor: int,
    split_iters: int,
    max_split_rounds: int,
    id_col: str,
) -> tuple[DataFrame, DataFrame]:
    """Recursively re-cluster cells larger than `cell_cap` (SemDeDup's own
    prescription for runaway cells, arXiv:2303.09540 §3): each round, every
    hot cell is k-means'd into `split_factor` subcells IN ONE distributed
    pass over all hot cells at once (no per-cell driver loop) — init is a
    deterministic hash partition of the ids (no RNG, no per-cell sort),
    refined by `split_iters` Lloyd rounds. Subcells that are still hot
    split again next round; `max_split_rounds` bounds the recursion (a
    cell of byte-identical vectors is unsplittable by construction — its
    members MUST be pairwise compared, so the cap is best-effort there).

    rows: (id, v, cell, cell_key) / cents: (cell_key, cv) — cell_key is the
    refinement path ("3", "3.1", "3.1.0", ...); `cell` keeps the top-level
    IVF cell for the published output schema."""
    for _ in range(max_split_rounds):
        hot = (
            rows.groupBy("cell_key")
            .agg(F.count("*").alias("n"))
            .where(F.col("n") > cell_cap)
            .select("cell_key")
            .localCheckpoint(eager=True)
        )
        if hot.isEmpty():  # metadata-only driver action, split path only
            break
        # split path only: this round references `rows` many times
        # (cold_rows, hot_rows -> seeded/subcent x split_iters/final) and
        # the next round's rows frame references it twice more — without
        # truncation the plan and every action's replay of the
        # corpus->assign subtree double per round
        rows = rows.localCheckpoint(eager=True)
        hot_rows = rows.join(F.broadcast(hot), "cell_key")
        cold_rows = rows.join(F.broadcast(hot), "cell_key", "left_anti")
        # init = deterministic hash partition of (id, cell_key): salting
        # with the refinement path makes each depth's initial split
        # different, so a re-split of the same rows cannot deterministically
        # reproduce a collapsed round
        seeded = hot_rows.withColumn(
            "sub",
            F.pmod(
                F.xxhash64(F.col(id_col), F.col("cell_key")),
                F.lit(split_factor),
            ).cast("int"),
        )
        subcent = _subcell_means(seeded).localCheckpoint(eager=True)
        for _ in range(split_iters):
            assigned = _subcell_assign(hot_rows, subcent, id_col)
            subcent = _subcell_means(assigned).localCheckpoint(eager=True)
        final = _subcell_assign(hot_rows, subcent, id_col)
        new_key = F.concat_ws(
            ".", F.col("cell_key"), F.col("sub").cast("string")
        )
        rows = cold_rows.unionByName(
            final.select(
                new_key.alias("cell_key"), id_col, F.col("cell"), F.col("v")
            ).select("cell_key", id_col, "cell", "v")
        )
        cents = (
            cents.join(F.broadcast(hot), "cell_key", "left_anti")
            .unionByName(
                subcent.select(
                    F.concat_ws(
                        ".", F.col("cell_key"), F.col("sub").cast("string")
                    ).alias("cell_key"),
                    "cv",
                )
            )
            .localCheckpoint(eager=True)
        )
    return rows, cents


def semdedup(
    corpus: DataFrame,
    threshold: float = 0.95,
    k_cells: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_cap: int | None = None,
    split_factor: int = 4,
    split_iters: int = 2,
    max_split_rounds: int = 4,
    expose_cell_key: bool = False,
) -> DataFrame:
    """Semantic dedup over an embedding column (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication", arXiv:2303.09540): k-means the embeddings, then within
    each cluster drop any item whose cosine to a MORE CENTRAL cluster-mate
    (higher similarity to the centroid; ties by smaller id) exceeds
    `threshold` — the released screening rule, which keeps the least
    centroid-similar representative of each duplicate neighborhood. Like
    that reference implementation, an item is dropped if ANY more-central
    item is near it, kept or not (the strictly-greedy "compare only against
    kept" variant is sequential per cluster and prunes slightly less).

    Scale shape: reuses the deterministic IVF pieces — centroids are a
    k_cells-row broadcast, assignment is one broadcast argmin pass — and
    the only superlinear step is the within-cell self-join, O(sum of
    cell_size^2), which is exactly the cost the clustering exists to bound.
    `cell_cap` bounds it HARD: cells above the cap are recursively
    re-clustered (_split_hot_cells — the paper's prescription for runaway
    cells) before the self-join, so the max task is O(cap^2) regardless of
    how skewed the embedding distribution is; comparisons then happen
    within the refined subcells (a deliberate approximation — the paper's
    cluster granularity is itself the screening radius). Default
    cell_cap=None preserves the exact single-level semantics.

    -> (vec_id, cell, centroid_sim, is_kept); `cell` is the top-level IVF
    cell; centroid_sim is vs the FINEST cell the item landed in.
    Keep rate is data-dependent; every dropped row has a more-central
    witness within `threshold` in its (refined) cell.
    """
    cent = ivf_centroids(corpus, k_cells=k_cells, iters=iters,
                         id_col=id_col, vec_col=vec_col)
    assign = ivf_assign(corpus, cent, id_col=id_col, vec_col=vec_col)
    rows = (
        corpus.select(id_col, F.col(vec_col).alias("v"))
        .join(assign, id_col)
        .withColumn("cell_key", F.col("cell").cast("string"))
        .select("cell_key", id_col, "cell", "v")
    )
    cents = cent.select(F.col("cell").cast("string").alias("cell_key"), "cv")
    if cell_cap is not None:
        rows, cents = _split_hot_cells(
            rows, cents, cell_cap, split_factor, split_iters,
            max_split_rounds, id_col,
        )
    ranked = (
        rows.join(F.broadcast(cents), "cell_key")
        .select(
            id_col,
            "cell",
            "cell_key",
            "v",
            F.round(
                _dot(F.col("v"), F.col("cv"))
                / (_norm(F.col("v")) * _norm(F.col("cv"))),
                12,
            ).alias("centroid_sim"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("cell_key").orderBy(
                    F.desc("centroid_sim"), F.col(id_col)
                )
            ),
        )
    )
    a = ranked.select(
        "cell_key", F.col("rk").alias("rk_a"), F.col("v").alias("va")
    )
    b = ranked.select(
        "cell_key", F.col("rk").alias("rk_b"), F.col(id_col).alias("id_b"),
        F.col("v").alias("vb"),
    )
    dropped = (
        a.join(b, "cell_key")
        .where(F.col("rk_a") < F.col("rk_b"))
        .where(
            _dot(F.col("va"), F.col("vb"))
            / (_norm(F.col("va")) * _norm(F.col("vb")))
            >= threshold
        )
        .select(F.col("id_b").alias(id_col))
        .distinct()
        .withColumn("_dropped", F.lit(True))
    )
    out_cols = [id_col, "cell", "centroid_sim"]
    if expose_cell_key:
        out_cols.append("cell_key")
    return (
        ranked.join(dropped, id_col, "left")
        .select(
            *out_cols,
            F.coalesce(~F.col("_dropped"), F.lit(True)).alias("is_kept"),
        )
    )
