"""Strongly connected components.

Reference anchor: the giant-component gate in the reference uses
`nx.strongly_connected_components` (/root/reference/textcrafts/deepRank.py:
398-406). Round 2 shipped weakly-CC only (documented delta, SURVEY §2.9);
this module closes that delta:

- `scc_per_conv` — exact SCCs per conversation graph: iterative Tarjan
  inside `applyInPandas` (same one-shuffle shape as
  components.components_per_conv). Component label = min node token of the
  SCC, so outputs are directly comparable with the networkx oracle.
- `scc_distributed` — one giant directed graph, forward-backward coloring
  with trimming (Orzan-style coloring / FW-BW of Hong et al., both public):

    outer round:
      1. TRIM to fixpoint: a vertex with no in-edges or no out-edges inside
         the remaining subgraph is a singleton SCC — peel immediately.
         Real link graphs are mostly acyclic, so trimming usually removes
         the bulk of the vertex set in the first round.
      2. COLOR: min-label propagation along edge direction to fixpoint,
         with pointer jumping — color(v) = min-labeled vertex that reaches
         v. Jumping is sound exactly as in weak CC: if u reaches v and w
         reaches u then w reaches v, so color'(v) = color(color(v)) only
         ever tightens within the reaching set.
      3. BACKWARD: bcolor(v) = min-labeled vertex REACHABLE FROM v within
         its color class — the same min-label + jump loop on the REVERSED,
         class-restricted edges. The class root r (the class's min-labeled
         vertex, see proof note) satisfies
         v in SCC(r)  <=>  color(v) = label(r) and bcolor(v) = label(r):
         mutual reachability. Peel every class's root SCC at once; the
         emitted component id is the min REAL id of each peeled SCC
         (one groupBy), matching the networkx-comparable convention.
      4. Remove peeled vertices, keep only edges with both ends remaining.

    LABELS ARE HASHED: propagation uses struct(xxhash64(id), id) — the
    hash gives a direction-agnostic random total order, the raw id breaks
    hash collisions exactly. Min-ID propagation with pointer jumping is
    only fast when ids happen to DECREASE along the propagation direction
    (each vertex's pointer then leaves itself, forming jumpable chains);
    on an ascending-id cycle the backward sweep degenerates to one vertex
    per round, and truncating it would peel a PARTIAL SCC — which breaks
    the remainder's strong connectivity and silently mislabels it.
    Randomized labels make both sweeps O(log n) rounds w.h.p. regardless
    of id assignment (the classic hash-min analysis); the 500-cycle
    regression test pins it. On budget exhaustion the kernel RAISES
    instead of mislabeling leftovers.

  Root-in-class proof note: for any member w of the class of r with
  label(w) < label(r): w reaches itself, so color(w) <= label(w) <
  label(r), contradicting w's membership in r's class. Hence r is the
  class's unique min-labeled vertex and bcolor(v) = label(r) iff v
  reaches r.

Scale notes (100 TB shape): every fixpoint loop checkpoints eagerly per
step with strong refs and periodic parquet resets (the `_ResetDir` lineage
discipline measured in pagerank.py); all shuffles are on the vertex id;
no collect, no per-row Python. Worst case (a long path of singleton SCCs)
is bounded by trimming, which peels path endpoints in O(path length / 1)
trim passes, each a cheap degree semi-join on a shrinking edge set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .components import PER_CONV_SCHEMA, _ResetDir


def _tarjan_components(n: int, adj_heads: np.ndarray, adj_next: np.ndarray,
                       vert_head: np.ndarray) -> np.ndarray:
    """Iterative Tarjan over a CSR-ish linked adjacency; returns for each
    vertex the min vertex index of its SCC."""
    UNVISITED = -1
    index_of = np.full(n, UNVISITED, dtype=np.int64)
    low = np.zeros(n, dtype=np.int64)
    on_stack = np.zeros(n, dtype=bool)
    comp_min = np.arange(n, dtype=np.int64)
    stack: list[int] = []
    next_index = 0
    for root in range(n):
        if index_of[root] != UNVISITED:
            continue
        # explicit DFS stack of (vertex, pointer into its adjacency list)
        work = [(root, vert_head[root])]
        index_of[root] = low[root] = next_index
        next_index += 1
        stack.append(root)
        on_stack[root] = True
        while work:
            v, ptr = work[-1]
            if ptr != -1:
                w = int(adj_heads[ptr])
                work[-1] = (v, int(adj_next[ptr]))
                if index_of[w] == UNVISITED:
                    index_of[w] = low[w] = next_index
                    next_index += 1
                    stack.append(w)
                    on_stack[w] = True
                    work.append((w, int(vert_head[w])))
                elif on_stack[w]:
                    if index_of[w] < low[v]:
                        low[v] = index_of[w]
            else:
                work.pop()
                if work:
                    pv = work[-1][0]
                    if low[v] < low[pv]:
                        low[pv] = low[v]
                if low[v] == index_of[v]:
                    members = []
                    while True:
                        w = stack.pop()
                        on_stack[w] = False
                        members.append(w)
                        if w == v:
                            break
                    m = min(members)
                    for w in members:
                        comp_min[w] = m
    return comp_min


def scc_per_conv(gedges: DataFrame) -> DataFrame:
    """(conv_id, kind, key, component) with component = min node token
    (kind+key) of the STRONGLY connected component. Exact
    nx.strongly_connected_components semantics on each conversation's
    directed graph."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame({"conv_id": [], "kind": [], "key": [], "component": []})
        conv = pdf["conv_id"].iloc[0]
        skey = pdf["src_kind"].astype(str) + pdf["src"].astype(str)
        dkey = pdf["dst_kind"].astype(str) + pdf["dst"].astype(str)
        nodes, inv = np.unique(
            np.concatenate([skey.to_numpy(), dkey.to_numpy()]), return_inverse=True
        )
        m = len(pdf)
        n = len(nodes)
        src, dst = inv[:m], inv[m:]
        # linked adjacency (avoids per-vertex python lists)
        vert_head = np.full(n, -1, dtype=np.int64)
        adj_next = np.empty(m, dtype=np.int64)
        for i in range(m):
            adj_next[i] = vert_head[src[i]]
            vert_head[src[i]] = i
        comp_min = _tarjan_components(n, dst.astype(np.int64), adj_next, vert_head)
        comp_token = nodes[comp_min]
        kinds = [s[0] for s in nodes]
        keys = [s[1:] for s in nodes]
        return pd.DataFrame(
            {"conv_id": conv, "kind": kinds, "key": keys, "component": comp_token}
        )

    return gedges.groupBy("conv_id").applyInPandas(run, PER_CONV_SCHEMA)




def _hlabel(idcol: F.Column) -> F.Column:
    """Hashed propagation label: random total order via xxhash64, exact
    collision break via the raw id (struct comparison is lexicographic)."""
    return F.struct(F.xxhash64(idcol).alias("h"), idcol.alias("i"))


def _minlabel_fixpoint(
    state: DataFrame,
    prop_e: DataFrame,
    rdir: _ResetDir,
    base: int,
    max_inner: int,
) -> DataFrame:
    """Hash-min label exchange with pointer jumping to fixpoint.

    state: (id, lbl struct<h,i>); prop_e: (a, b) — labels flow a -> b.
    Jump: lbl'(v) = lbl(vertex named by lbl(v).i) — transitive within the
    reaching set. Raises if max_inner rounds don't converge (w.h.p. needs
    O(log n) under the hashed order)."""
    state = state.localCheckpoint(eager=True)
    kept = [state]
    for it in range(max_inner):
        msg = (
            state.join(prop_e, state["id"] == prop_e["a"])
            .groupBy(prop_e["b"].alias("id"))
            .agg(F.min("lbl").alias("pmin"))
        )
        m = state.join(msg, "id", "left").select(
            "id",
            F.least(
                F.col("lbl"), F.coalesce(F.col("pmin"), F.col("lbl"))
            ).alias("m"),
            F.col("lbl").alias("prev"),
        )
        jump = m.select(F.col("id").alias("jid"), F.col("m").alias("jlbl"))
        stepped = m.join(jump, m["m"]["i"] == jump["jid"]).select(
            "id",
            F.col("jlbl").alias("lbl"),
            (F.col("jlbl") != F.col("prev")).alias("chg"),
        )
        new = stepped.localCheckpoint(eager=True)
        changed = new.agg(F.sum(F.col("chg").cast("long"))).first()[0] or 0
        kept.append(new)
        state = new.select("id", "lbl")
        if (it + 1) % 5 == 0:
            state = rdir.reset(state, base + it)
            kept.clear()
        if changed == 0:
            return state
    raise RuntimeError(
        f"minlabel fixpoint did not converge within {max_inner} rounds"
    )


def scc_distributed(
    edges: DataFrame,
    id_cols: tuple = ("src", "dst"),
    max_outer: int = 50,
    max_inner: int = 100,
) -> DataFrame:
    """FW-BW coloring SCC on one giant directed graph.

    Returns (id, component) with component = min vertex id of the SCC.
    """
    src, dst = id_cols
    spark = edges.sparkSession
    raw = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e = (
        raw.where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # vertices come from the PRE-self-loop-filter edge set: a vertex that
    # appears only in self-loops is a singleton SCC in networkx (the first
    # trim pass peels it, since it has no remaining in/out edges)
    verts = (
        raw.select(F.col("a").alias("id"))
        .union(raw.select(F.col("b").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    done_parts: list[DataFrame] = []
    rdir = _ResetDir("scc")
    rem_v, rem_e = verts, e
    n_rem = rem_v.count()
    for outer in range(max_outer):
        # --- 1. trim singleton SCCs (no in- or no out-edges) to fixpoint ---
        for _ in range(max_inner):
            has_out = rem_e.select(F.col("a").alias("id")).distinct()
            has_in = rem_e.select(F.col("b").alias("id")).distinct()
            core = rem_v.join(has_out, "id", "leftsemi").join(
                has_in, "id", "leftsemi"
            ).localCheckpoint(eager=True)
            n_core = core.count()
            if n_core == n_rem:
                break
            trimmed = rem_v.join(core, "id", "leftanti").select(
                "id", F.col("id").alias("component")
            )
            done_parts.append(trimmed.localCheckpoint(eager=True))
            rem_v, n_rem = core, n_core
            rem_e = (
                rem_e.join(rem_v.select(F.col("id").alias("a")), "a", "leftsemi")
                .join(rem_v.select(F.col("id").alias("b")), "b", "leftsemi")
                .localCheckpoint(eager=True)
            )
        if n_rem == 0:
            break
        # --- 2. color: min-label forward propagation with pointer jumping,
        # over HASHED labels struct(xxhash64(id), id) — see module doc ---
        colors = rem_v.select("id", _hlabel(F.col("id")).alias("lbl"))
        colors = _minlabel_fixpoint(
            colors, rem_e, rdir, outer * 1000, max_inner
        ).withColumnRenamed("lbl", "color")
        # --- 3. backward: same loop on the REVERSED class-restricted edges ---
        col_of = colors.localCheckpoint(eager=True)
        ce = (
            rem_e.join(col_of.select(F.col("id").alias("a"), F.col("color").alias("ca")), "a")
            .join(col_of.select(F.col("id").alias("b"), F.col("color").alias("cb")), "b")
            .where(F.col("ca") == F.col("cb"))
            .select(F.col("b").alias("a"), F.col("a").alias("b"))  # reversed
            .localCheckpoint(eager=True)
        )
        bcol = _minlabel_fixpoint(
            col_of.select("id", _hlabel(F.col("id")).alias("lbl")),
            ce, rdir, outer * 1000 + 500, max_inner,
        ).withColumnRenamed("lbl", "bcolor")
        joined = col_of.join(bcol, "id").localCheckpoint(eager=True)
        peeled = joined.where(F.col("bcolor") == F.col("color"))
        # labels are hashed structs; the published component id is the min
        # REAL id of each peeled SCC (networkx-comparable convention)
        comp = peeled.groupBy("color").agg(F.min("id").alias("component"))
        scc_now = peeled.join(comp, "color").select("id", "component")
        done_parts.append(scc_now.localCheckpoint(eager=True))
        rem_v = (
            joined.where(F.col("bcolor") != F.col("color"))
            .select("id")
            .localCheckpoint(eager=True)
        )
        n_rem = rem_v.count()
        if n_rem == 0:
            break
        rem_e = (
            rem_e.join(rem_v.select(F.col("id").alias("a")), "a", "leftsemi")
            .join(rem_v.select(F.col("id").alias("b")), "b", "leftsemi")
            .localCheckpoint(eager=True)
        )
    if n_rem > 0:
        # refuse to emit wrong labels: leftover vertices are NOT known
        # singletons (outer-round budget exhausted on an adversarial chain)
        raise RuntimeError(
            f"scc_distributed: {n_rem} vertices unresolved after "
            f"{max_outer} outer rounds; raise max_outer"
        )
    if not done_parts:
        # empty vertex set (no edges at all): empty frame, input id type
        return rdir.finalize(verts.select("id", F.col("id").alias("component")))
    out = done_parts[0]
    for part in done_parts[1:]:
        out = out.union(part)
    return rdir.finalize(out)
