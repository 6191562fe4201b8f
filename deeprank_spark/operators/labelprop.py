"""Synchronous label propagation (north-rule kernel, not in the reference).

Deterministic spec (shared with the oracle, oracle/kernels.py:lpa_sync):
each round every vertex adopts the smallest label among those with maximal
count over its undirected neighborhood (previous round's labels); isolated
vertices keep their own label. Fixpoint or max_iter (default 20 — sync LPA
can 2-cycle on bipartite structures, the cap bounds it).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

_SEP = ""  # kind is a single char; token = kind + key parses positionally

PER_CONV_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("key", StringType(), False),
        StructField("label", StringType(), False),
    ]
)


def _lpa_numpy(n: int, src: np.ndarray, dst: np.ndarray, max_iter: int) -> np.ndarray:
    # undirected adjacency (dedup, no self loops)
    mask = src != dst
    a = np.concatenate([src[mask], dst[mask]])
    b = np.concatenate([dst[mask], src[mask]])
    labels = np.arange(n)
    if len(a) == 0:
        return labels  # only self-loops / no edges: every vertex keeps its label
    pairs = np.unique(np.stack([a, b], axis=1), axis=0)
    a, b = pairs[:, 0], pairs[:, 1]
    for _ in range(max_iter):
        new = labels.copy()
        # histogram per (vertex a, neighbor-label): count, pick (max count, min label)
        nl = labels[b]
        order = np.lexsort((nl, a))
        aa, ll = a[order], nl[order]
        grp = np.concatenate([[True], (aa[1:] != aa[:-1]) | (ll[1:] != ll[:-1])])
        gi = np.flatnonzero(grp)
        counts = np.diff(np.append(gi, len(aa)))
        ga, gl = aa[gi], ll[gi]
        # per vertex: max count then min label; lexsort by (count desc, label desc)
        # then take the first row per vertex after sorting (count asc, label desc)
        sel = np.lexsort((-gl, counts, ga))  # within vertex: count asc, label desc
        sa, sl, sc = ga[sel], gl[sel], counts[sel]
        last = np.concatenate([(sa[1:] != sa[:-1]), [True]])  # last row per vertex
        win_v, win_l = sa[last], sl[last]
        new[win_v] = win_l
        if np.array_equal(new, labels):
            break
        labels = new
    return labels


def lpa_per_conv(gedges: DataFrame, max_iter: int = 20) -> DataFrame:
    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame({"conv_id": [], "kind": [], "key": [], "label": []})
        conv = pdf["conv_id"].iloc[0]
        skey = pdf["src_kind"].astype(str) + pdf["src"].astype(str)
        dkey = pdf["dst_kind"].astype(str) + pdf["dst"].astype(str)
        nodes, inv = np.unique(
            np.concatenate([skey.to_numpy(), dkey.to_numpy()]), return_inverse=True
        )
        m = len(pdf)
        labels = _lpa_numpy(len(nodes), inv[:m], inv[m:], max_iter)
        kinds = [s[0] for s in nodes]
        keys = [s[1:] for s in nodes]
        return pd.DataFrame(
            {"conv_id": conv, "kind": kinds, "key": keys, "label": nodes[labels]}
        )

    return gedges.groupBy("conv_id").applyInPandas(run, PER_CONV_SCHEMA)


def lpa_distributed(
    edges: DataFrame, id_cols: tuple = ("src", "dst"), max_iter: int = 20
) -> DataFrame:
    """Distributed synchronous LPA: neighbor-label histogram via groupBy +
    max_by(struct(count, -label)) argmax with min-label tie-break.
    Returns (id, label)."""
    src, dst = id_cols
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .cache()
    )
    labels = (
        e.select(F.col("a").alias("id"))
        .union(e.select(F.col("b").alias("id")))
        .distinct()
        .select("id", F.col("id").alias("label"))
        .localCheckpoint(eager=True)
    )
    from .components import _ResetDir

    kept = []  # strong refs: keep checkpoint blocks alive between resets
    rdir = _ResetDir("lpa")
    for it in range(max_iter):
        hist = (
            labels.join(sym, labels["id"] == sym["a"])
            .groupBy(sym["b"].alias("id"), F.col("label"))
            .agg(F.count("*").alias("cnt"))
        )
        win = hist.groupBy("id").agg(
            F.max_by("label", F.struct(F.col("cnt"), (-F.col("label")).alias("nl"))).alias(
                "new_label"
            )
        )
        new = (
            labels.join(win, "id", "left")
            .select(
                "id",
                F.coalesce(F.col("new_label"), F.col("label")).alias("label"),
                (F.coalesce(F.col("new_label"), F.col("label")) != F.col("label")).alias(
                    "chg"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = new.agg(F.sum(F.col("chg").cast("long"))).first()[0] or 0
        kept.append(new)
        labels = new.select("id", "label")
        if (it + 1) % 5 == 0:
            labels = rdir.reset(labels, it)
            kept.clear()
        if changed == 0:
            break
    sym.unpersist()
    return rdir.finalize(labels)
