"""SemDeDup (Abbas et al. 2023) — the pruning rule is verified in pure
python GIVEN the Spark-produced cell assignment (the deterministic k-means
itself is differentially tested in test_ivf.py); plus planted-duplicate
properties."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from deeprank_spark.operators.similarity import (
    ivf_assign,
    ivf_centroids,
    semdedup,
)


def _corpus_with_dups(spark, seed=7, n_clusters=4, per=20, d=12, dup_every=5):
    """Planted clusters; every dup_every-th vector is an exact copy of its
    cluster predecessor (a guaranteed cosine-1.0 near-dup pair)."""
    rng = np.random.RandomState(seed)
    centers = rng.normal(0, 1, (n_clusters, d)) * 10.0
    rows = []
    vid = 0
    for c in range(n_clusters):
        prev = None
        for i in range(per):
            if prev is not None and i % dup_every == 0:
                v = prev
            else:
                v = centers[c] + rng.normal(0, 0.3, d)
            rows.append((vid, [float(x) for x in v]))
            prev = v
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _cos(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def _oracle_kept(vecs, assign, cent, threshold):
    """Replicates the screening rule given (id -> vec), (id -> cell),
    (cell -> centroid): rank within cell by (round(centroid_sim,12) desc,
    id), drop i if any earlier j has cos(i, j) >= threshold."""
    by_cell = {}
    for vid, cell in assign.items():
        cs = round(_cos(vecs[vid], cent[cell]), 12)
        by_cell.setdefault(cell, []).append((-cs, vid))
    kept = set()
    for cell, items in by_cell.items():
        items.sort()
        for i, (_, vid) in enumerate(items):
            if not any(
                _cos(vecs[vid], vecs[e]) >= threshold
                for _, e in items[:i]
            ):
                kept.add(vid)
    return kept


def test_semdedup_matches_oracle_given_assignment(spark):
    emb = _corpus_with_dups(spark)
    threshold = 0.98
    cent_df = ivf_centroids(emb, k_cells=4, iters=3)
    assign = {
        r.vec_id: r.cell for r in ivf_assign(emb, cent_df).collect()
    }
    cent = {r.cell: r.cv for r in cent_df.collect()}
    vecs = {r.vec_id: r.embedding for r in emb.collect()}
    got = semdedup(emb, threshold=threshold, k_cells=4, iters=3)
    kept = {r.vec_id for r in got.collect() if r.is_kept}
    assert kept == _oracle_kept(vecs, assign, cent, threshold)
    # output covers every input exactly once
    assert got.count() == len(vecs)


def test_exact_duplicates_collapse(spark):
    # Pick a threshold ABOVE the max cosine between any two non-identical
    # vectors (tight planted clusters sit at ~0.999+, so a hard-coded 0.999
    # would also prune non-dups): only the exact-copy pairs qualify, so the
    # rule must drop exactly one member per duplicate group and nothing else.
    emb = _corpus_with_dups(spark)
    rows = emb.collect()
    vecs = {r.vec_id: tuple(round(x, 9) for x in r.embedding) for r in rows}
    raw = {r.vec_id: r.embedding for r in rows}
    ids = sorted(raw)
    max_nondup = max(
        _cos(raw[a], raw[b])
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if vecs[a] != vecs[b]
    )
    threshold = (max_nondup + 1.0) / 2.0
    assert threshold < 1.0
    got = semdedup(emb, threshold=threshold, k_cells=4, iters=3).collect()
    kept = {r.vec_id for r in got if r.is_kept}
    from collections import defaultdict

    groups = defaultdict(list)
    for vid, v in vecs.items():
        groups[v].append(vid)
    # exactly one survivor per exact-duplicate group, all uniques kept
    for g in groups.values():
        assert len(set(g) & kept) == 1, g
    assert len(kept) == len(groups)


def test_impossible_threshold_keeps_everything(spark):
    emb = _corpus_with_dups(spark)
    got = semdedup(emb, threshold=1.01, k_cells=4, iters=2)
    assert got.where(~F.col("is_kept")).count() == 0


def _giant_cell_corpus(spark, n_groups=12, per=8, n_singles=14, d=8, seed=3):
    """One-giant-cell fixture (VERDICT r4 next-round #4): well-separated
    groups of EXACT copies plus unique singletons. Exact copies rank
    identically by centroid_sim whatever centroid they are measured
    against, so the (rank, id) tie-break — and therefore is_kept — is
    invariant under hot-cell refinement; the fixture self-validates that
    no cross-group cosine reaches the threshold."""
    rng = np.random.RandomState(seed)
    points = rng.normal(0, 1, (n_groups + n_singles, d)) * 10.0
    rows, vid = [], 0
    for g in range(n_groups):
        for _ in range(per):
            rows.append((vid, [float(x) for x in points[g]]))
            vid += 1
    for s in range(n_singles):
        rows.append((vid, [float(x) for x in points[n_groups + s]]))
        vid += 1
    distinct = [points[i] for i in range(n_groups + n_singles)]
    max_cross = max(
        _cos(distinct[i], distinct[j])
        for i in range(len(distinct))
        for j in range(i + 1, len(distinct))
    )
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        max_cross,
    )


def test_hot_cell_split_bounds_cells_and_preserves_output(spark):
    emb, max_cross = _giant_cell_corpus(spark)
    threshold = 0.95
    assert max_cross < threshold  # only exact copies are near-dups here
    cap = 30
    # k_cells=1 -> every vector lands in ONE cell (the planted hot cell)
    unsplit = semdedup(emb, threshold=threshold, k_cells=1, iters=1)
    split = semdedup(
        emb, threshold=threshold, k_cells=1, iters=1,
        cell_cap=cap, split_factor=4, split_iters=2, max_split_rounds=6,
        expose_cell_key=True,
    )
    urows = unsplit.collect()
    srows = split.collect()
    assert len(urows) == len(srows) == emb.count()
    # the unsplit run really is one giant cell
    assert {r.cell for r in urows} == {0}
    # refinement bounded every cell at the cap (separable fixture)
    from collections import Counter

    sizes = Counter(r.cell_key for r in srows)
    assert len(sizes) > 1 and max(sizes.values()) <= cap, sizes
    # published output identical to the unsplit semantics: same keeps
    assert {r.vec_id for r in srows if r.is_kept} == {
        r.vec_id for r in urows if r.is_kept
    }
    # schema contract: default output has no cell_key, split output keeps
    # the top-level cell column
    assert "cell_key" not in unsplit.columns
    assert {r.cell for r in srows} == {0}


def test_cell_cap_noop_when_no_cell_is_hot(spark):
    emb = _corpus_with_dups(spark)
    base = semdedup(emb, threshold=0.98, k_cells=4, iters=2)
    capped = semdedup(emb, threshold=0.98, k_cells=4, iters=2, cell_cap=10_000)
    a = sorted(map(tuple, base.collect()))
    b = sorted(map(tuple, capped.collect()))
    assert a == b
