"""Rows retired from the 50-row driver contract in round 5 (swapped for
dup_spans / semdedup / dr_dot, VERDICT r4 next-round #3/#6) stay verified
here with the SAME compare the driver uses: row count, column names, and an
order-insensitive multiset of stringified rows vs DuckDB on the shared
parquet tables."""

from __future__ import annotations

import os
from datetime import datetime

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("DEEPRANK_TEST_SF_DIR", "/root/testdata/sf0.001")

CASES = [
    ("first_occurrence", entrymod.q_first_occurrence, entrymod._FIRST_OCC_SQL,
     ["orders"]),
    ("semi_anti_join", entrymod.q_semi_anti, entrymod._SEMI_ANTI_SQL,
     ["customer", "orders"]),
    ("rollup_cube_agg", entrymod.q_rollup_cube_agg, entrymod._ROLLUP_CUBE_SQL,
     ["lineitem"]),
    ("topk_weighted", entrymod.q_topk_weighted, entrymod._TOPK_WEIGHTED_SQL,
     ["lineitem"]),
    ("window_rank", entrymod.q_window_rank, entrymod._WINDOW_RANK_SQL,
     ["orders"]),
]


def _norm_cell(v):
    if isinstance(v, float):
        return f"{v:.9g}"
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    return str(v)


def _multiset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_norm_cell(r[i]) for i in idx) for r in rows)


@pytest.mark.parametrize("name,fn,sql,tables", CASES, ids=[c[0] for c in CASES])
def test_folded_row_matches_duckdb(spark, name, fn, sql, tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    df = fn(spark, SF_DIR)
    srows = df.collect()
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(df.columns) == sorted(dcols)
    assert len(srows) == len(drows) and len(srows) > 0
    a = _multiset(df.columns, [[r[c] for c in df.columns] for r in srows])
    assert a == _multiset(dcols, drows)
