"""Catalog-agnostic table IO (Iceberg catalog or parquet paths).

The north rule targets Iceberg tables of transcripts; this sandbox has no
Iceberg runtime jar, so the engine is written against ONE seam: every
read/write goes through this module, switched by config — `spark.read.
table(name)` against an Iceberg catalog when DEEPRANK_CATALOG=iceberg
(same schema, bucket layout and writer calls), `spark.read.parquet(path)`
otherwise. Engine code and tests never branch.

Layout decisions that matter at 10^12 turns:
- transcripts partitioned/bucketed by hash of conv_id: a conversation's
  turns are co-located, so the per-conv parse + graph build shuffles once
  on conv_id and AQE coalesces the rest.
- fact-table exports partitioned by bucket(conv_id) for the same reason;
  Iceberg's hidden-partition `bucket(N, conv_id)` maps to an explicit
  `pmod(xxhash64(conv_id), N)` column in the parquet fallback.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRANSCRIPTS_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def use_iceberg() -> bool:
    return os.environ.get("DEEPRANK_CATALOG", "parquet").lower() == "iceberg"


def read_table(spark: SparkSession, name_or_path: str, schema=None) -> DataFrame:
    if use_iceberg():
        return spark.read.table(name_or_path)
    r = spark.read
    if schema is not None:
        # explicit schema: required to read back relations that were empty
        # at write time (partitioned writes of 0 rows leave no data files)
        r = r.schema(schema)
    return r.parquet(name_or_path)


def write_table(
    df: DataFrame,
    name_or_path: str,
    mode: str = "overwrite",
    bucket_col: str | None = None,
    num_buckets: int = 64,
) -> None:
    """Write with conversation co-location. Iceberg: writeTo + bucket
    partition transform. Parquet: explicit bucket column partitioning."""
    if use_iceberg():
        w = df.writeTo(name_or_path)
        if bucket_col is not None:
            from pyspark.sql.functions import partitioning

            w = w.partitionedBy(partitioning.bucket(num_buckets, F.col(bucket_col)))
        if mode == "overwrite":
            w.createOrReplace()
        else:
            w.append()
        return
    out = df
    writer_partition = None
    if bucket_col is not None:
        out = df.withColumn(
            "bucket", F.pmod(F.xxhash64(F.col(bucket_col)), F.lit(num_buckets))
        )
        writer_partition = "bucket"
    w = out.write.mode(mode)
    if writer_partition:
        w = w.partitionBy(writer_partition)
    w.parquet(name_or_path)


def read_transcripts(
    spark: SparkSession, name_or_path: str, format: str | None = None
) -> DataFrame:
    """The engine's canonical input (input_hint schema, fixed order).

    `format`: None auto-detects — the Iceberg catalog when
    DEEPRANK_CATALOG=iceberg, else by extension (.jsonl/.json -> JSON
    lines, .csv -> CSV with header, anything else parquet) — or pass
    'parquet' | 'jsonl' | 'csv' | 'table' explicitly. The text formats
    read with the EXPLICIT transcripts schema: schema inference would
    scan the whole input before the job starts (a non-starter at 10^12
    turns), and with a fixed schema a malformed line degrades to nulls in
    that row instead of failing the read (Spark's default PERMISSIVE
    mode), which the parse stage's null guards already tolerate."""
    fmt = format
    if fmt is None:
        if use_iceberg():
            fmt = "table"
        else:
            low = name_or_path.lower()
            if low.endswith((".jsonl", ".json", ".jsonl.gz", ".json.gz")):
                fmt = "jsonl"
            elif low.endswith((".csv", ".csv.gz")):
                fmt = "csv"
            else:
                fmt = "parquet"
    if fmt in ("table", "parquet"):
        df = read_table(spark, name_or_path)
    elif fmt == "jsonl":
        df = spark.read.schema(TRANSCRIPTS_SCHEMA).json(name_or_path)
    elif fmt == "csv":
        df = (
            spark.read.schema(TRANSCRIPTS_SCHEMA)
            .option("header", True)
            .csv(name_or_path)
        )
    else:
        raise ValueError(
            f"read_transcripts: unknown format {fmt!r} "
            "(expected parquet | jsonl | csv | table)"
        )
    return df.select("conv_id", "turn_idx", "role", "text", "tool", "ts")
