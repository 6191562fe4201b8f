"""Iceberg writer seam (VERDICT r3 next-round #8).

The engine is catalog-agnostic through sources/tables.py: every read/write
routes through read_table/write_table, which switch on DEEPRANK_CATALOG
between parquet paths (default) and an Iceberg catalog (spark.read.table /
DataFrameWriterV2 with a bucket partition transform).

This sandbox has NO iceberg-spark-runtime jar anywhere on the filesystem
(verified: find / -name '*iceberg*.jar' is empty; no pip package, no ivy/m2
cache) and no network to resolve one, so the full catalog round-trip CANNOT
run here — test_iceberg_roundtrip records that as a skip with the probe
result, and will activate automatically in any environment where the jar
is present. What CAN be verified offline, and is, in
test_iceberg_branch_reaches_v2_writer: with DEEPRANK_CATALOG=iceberg the
seam really builds and submits the V2 writeTo plan (the failure is the
expected catalog-resolution error from the JVM, not a Python-side bug),
and read_table routes to spark.read.table.
"""

import pytest

from deeprank_spark.sources import tables


def _iceberg_jar_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def test_iceberg_roundtrip(spark, tmp_path, monkeypatch):
    if not _iceberg_jar_available(spark):
        pytest.skip(
            "iceberg-spark-runtime not on the classpath and not resolvable "
            "offline (no jar on filesystem, no network) — documented "
            "impossibility; this test activates automatically when the jar "
            "is present"
        )
    # full round-trip through a hadoop catalog when the jar exists
    monkeypatch.setenv("DEEPRANK_CATALOG", "iceberg")
    spark.conf.set(
        "spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.local.type", "hadoop")
    spark.conf.set("spark.sql.catalog.local.warehouse", str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [("c1", 0, "hello"), ("c2", 1, "world")],
        "conv_id string, turn_idx int, text string",
    )
    tables.write_table(df, "local.db.facts", bucket_col="conv_id")
    back = tables.read_table(spark, "local.db.facts")
    assert sorted(r["text"] for r in back.collect()) == ["hello", "world"]


def test_iceberg_branch_reaches_v2_writer(spark, monkeypatch):
    """With DEEPRANK_CATALOG=iceberg and no catalog configured, write_table
    must reach the JVM with a V2 writeTo plan and fail with the catalog/
    table resolution error (NOT a Python AttributeError/TypeError), and
    read_table must route to spark.read.table — proving the seam's Iceberg
    branch is mechanically sound without the runtime jar."""
    monkeypatch.setenv("DEEPRANK_CATALOG", "iceberg")
    assert tables.use_iceberg()
    df = spark.createDataFrame([("c1", 0)], "conv_id string, turn_idx int")
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException) as ei:
        tables.write_table(df, "no_such_catalog.db.t", bucket_col="conv_id")
    assert "no_such_catalog" in str(ei.value)
    with pytest.raises(AnalysisException) as ei:
        tables.read_table(spark, "no_such_catalog.db.t")
    assert "no_such_catalog" in str(ei.value)
    monkeypatch.delenv("DEEPRANK_CATALOG")
    assert not tables.use_iceberg()
