"""Self-check harness mimicking the driver's correctness gate:
run each __spark_entry__ query on Spark and its oracle SQL on DuckDB over
the same parquet tables; compare row count, column names, and an
order-insensitive multiset of stringified rows."""

from __future__ import annotations

import sys
from datetime import datetime

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from deeprank_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        return f"{v:.9g}"
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    return str(v)


def rows_multiset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(norm_cell(r[i]) for i in idx) for r in rows)


def main(sf_dir: str, only: list[str]):
    spark = get_spark(app_name="contract-check", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            srows = df.collect()
            scols = df.columns
        except Exception as exc:
            failures.append((name, f"SPARK ERROR: {exc}"))
            print(f"[FAIL] {name}: spark error {str(exc)[:300]}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(srows)} rows")
            if len(srows) == 0:
                failures.append((name, "0 rows"))
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as exc:
            failures.append((name, f"DUCKDB ERROR: {exc}"))
            print(f"[FAIL] {name}: duckdb error {str(exc)[:300]}")
            continue
        ok = True
        if sorted(scols) != sorted(dcols):
            failures.append((name, f"schema {sorted(scols)} vs {sorted(dcols)}"))
            ok = False
        elif len(srows) != len(drows):
            failures.append((name, f"rowcount {len(srows)} vs {len(drows)}"))
            ok = False
        else:
            a = rows_multiset(scols, [[r[c] for c in scols] for r in srows])
            b = rows_multiset(dcols, drows)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                failures.append((name, f"values differ, e.g. {diff}"))
                ok = False
        print(f"[{'OK' if ok else 'FAIL'}] {name}: {len(srows)} rows")
    print("\n=== SUMMARY ===")
    for n, why in failures:
        print("FAIL", n, "->", why[:500])
    if not failures:
        print("ALL OK")
    return 1 if failures else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.exit(main(sf, sys.argv[2:]))
