"""The recursive DuckDB PageRank oracle (oracle/sqlgen._pr_ctes) must
reproduce the engine's numpy kernel (pagerank._power_iteration) exactly:
same per-conversation convergence schedule, ranks equal to within float
accumulation noise (~1e-15), identical after ROUND(.,8).

This is the building block that upgrades dr_keywords / dr_summary /
dr_relations / dr_line_graph from rows-only to full value oracles; pinning
it here keeps the SQL mirror from drifting when pagerank.py changes.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from deeprank_spark.operators.pagerank import _conv_pagerank_pdf
from deeprank_spark.oracle.sqlgen import _pr_ctes


def _random_conv_edges(seed: int = 7) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    rows = []
    # mixed sizes; W->S endpoints produce dangling sentence nodes, which
    # exercises the dangling-mass redistribution path
    for conv, n in [("c1", 12), ("c2", 30), ("c3", 80)]:
        for _ in range(n * 3):
            s, d = rng.randint(0, n), rng.randint(0, n)
            if s != d:
                rows.append((conv, "W", f"n{s}", "S", str(d)))
    return pd.DataFrame(
        rows, columns=["conv_id", "src_kind", "src", "dst_kind", "dst"]
    ).drop_duplicates()


def test_recursive_pagerank_matches_numpy_kernel():
    edges = _random_conv_edges()
    expected = pd.concat(
        [
            _conv_pagerank_pdf(g.reset_index(drop=True), None, 0.85, 1e-6, 100)
            for _, g in edges.groupby("conv_id")
        ]
    ).reset_index(drop=True)

    con = duckdb.connect()
    con.register("gedge", edges)
    sql = (
        "WITH RECURSIVE edg AS MATERIALIZED (SELECT conv_id, "
        "src_kind || src AS s, dst_kind || dst AS d FROM gedge),"
        + _pr_ctes("edg")
        + " SELECT conv_id, kind, key, rank FROM ranks"
    )
    got = con.execute(sql).df()

    m = expected.merge(
        got, on=["conv_id", "kind", "key"], suffixes=("_np", "_sql")
    )
    assert len(m) == len(expected) == len(got)
    diff = (m["rank_np"] - m["rank_sql"]).abs().max()
    assert diff < 1e-12, diff
    assert (np.round(m["rank_np"], 8) == np.round(m["rank_sql"], 8)).all()


def test_recursive_pagerank_stops_per_conversation():
    """Each conversation must stop at its OWN convergence iteration (the
    numpy kernel's schedule), not a global fixed count."""
    edges = _random_conv_edges(seed=11)
    con = duckdb.connect()
    con.register("gedge", edges)
    sql = (
        "WITH RECURSIVE edg AS MATERIALIZED (SELECT conv_id, "
        "src_kind || src AS s, dst_kind || dst AS d FROM gedge),"
        + _pr_ctes("edg")
        + " SELECT conv_id, MAX(it) AS iters FROM pr WHERE done GROUP BY conv_id"
    )
    iters = dict(con.execute(sql).fetchall())
    assert len(iters) == 3
    # convergence counts must be plausible power-iteration schedules
    assert all(3 <= v <= 100 for v in iters.values()), iters


@pytest.mark.parametrize(
    "fn_name",
    ["dr_keywords_sql", "dr_summary_sql", "dr_relations_sql", "dr_line_graph_sql"],
)
def test_rank_oracles_generate_valid_sql(fn_name):
    """The full-pipeline oracles must at least parse in DuckDB (the value
    equivalence against Spark runs in tools/check_contract.py and the
    driver's gate; here we pin SQL validity hermetically)."""
    from deeprank_spark.oracle import sqlgen

    sql = getattr(sqlgen, fn_name)()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT 1 AS doc_id, "
        "'The spark engine stores data. It runs fast queries.' AS text, "
        "50 AS n_chars"
    )
    out = con.execute(sql).df()
    assert out is not None
