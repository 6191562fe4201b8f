"""As-of (point-in-time) join — the classic event-attribution operator.

For every left row, attach the LATEST right row of the same key whose
timestamp is <= the left timestamp. The reference has no temporal joins
(SURVEY §2.11) but any transcript/event engine at scale needs one; this
is the standard union-tag + running-last-value formulation:

    union(left tagged 1, right tagged 0)
      -> ONE shuffle on (key), sort (ts, side, tiebreak)
      -> last(right-payload STRUCT, ignorenulls) over rowsBetween(unbounded, 0)
      -> keep left rows

i.e. a single window pass instead of a per-row range join — no range
blow-up, no per-key skew beyond the key's own row count. The payload
travels as ONE struct so every asof_* column comes from the SAME right
row even when payload fields are null.

HOT-KEY MODE (`time_bucket`): with the plain window, a hot key is one
sorted partition stream — a key holding 1% of 100 TB lands on one task.
Passing `time_bucket` (bucket width: seconds for timestamp columns,
plain units for numeric ones) splits every key's stream into
(key, floor(ts / width)) window partitions and restores cross-bucket
semantics with a carry pass that runs over ONE ROW PER (key, bucket),
not per event:

    1. within-bucket running last  — window on (key, bucket)
    2. per-bucket last right value — max_by aggregate on (key, bucket)
    3. carry-in per bucket         — window on key over the BUCKET table
       (rowsBetween(unboundedPreceding, -1), ignorenulls)
    4. asof = coalesce(within-bucket, carry-in) — join back on
       (key, bucket), co-partitioned with pass 1

Results are identical to the plain path for every bucket width (the
property test pins this); max task size drops from O(hottest key) to
O(hottest key's hottest bucket), and the carry window is O(#buckets).

Ties: a right row at exactly the left row's timestamp IS matched
(side 0 sorts before side 1); right rows sharing a timestamp break on
`right_id` so the result is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_id: str | None = None,
    payload: tuple = (),
    time_bucket: float | None = None,
) -> DataFrame:
    """-> all left columns + `asof_<col>` for each right payload column
    (null when no right row precedes the left row). `time_bucket` switches
    to the hot-key-safe bucketed formulation (see module doc); results are
    identical for any positive width."""
    pay = list(payload)
    lcols = list(left.columns)
    rtypes = dict(right.dtypes)
    pay_struct = F.struct(*[F.col(c) for c in pay])
    pay_type = f"struct<{', '.join(f'{c}:{rtypes[c]}' for c in pay)}>"
    # tie-break column keeps right_id's NATIVE type: casting e.g. a string
    # event id to long would turn it NULL and make same-timestamp right
    # rows order nondeterministically
    tb_type = rtypes[right_id] if right_id else "int"

    l2 = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ets"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(tb_type).alias("_tb"),
        F.struct(*[F.col(c) for c in lcols]).alias("_l"),
        F.lit(None).cast(pay_type).alias("_r"),
    )
    r2 = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ets"),
        F.lit(0).alias("_side"),
        (F.col(right_id) if right_id else F.lit(0)).alias("_tb"),
        F.lit(None).cast(
            f"struct<{', '.join(f'{c}:{t}' for c, t in left.dtypes)}>"
        ).alias("_l"),
        pay_struct.alias("_r"),
    )
    u = l2.unionByName(r2)
    out_cols = [F.col(f"_l.{c}").alias(c) for c in lcols] + [
        F.col(f"_asof.{c}").alias(f"asof_{c}") for c in pay
    ]
    if time_bucket is None:
        w = (
            Window.partitionBy("_k")
            .orderBy(F.col("_ets"), F.col("_side"), F.col("_tb"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = u.withColumn(
            "_asof", F.last(F.col("_r"), ignorenulls=True).over(w)
        )
        return filled.where(F.col("_side") == 1).select(*out_cols)

    if time_bucket <= 0:
        raise ValueError(f"time_bucket must be > 0, got {time_bucket}")
    lts_type = dict(left.dtypes)[left_ts]
    ts_num = (
        F.unix_timestamp("_ets") if lts_type.startswith("timestamp")
        else F.col("_ets")
    )
    u = u.withColumn("_b", F.floor(ts_num / F.lit(float(time_bucket))))
    # 1. within-bucket running last (hot key now split across buckets)
    wb = (
        Window.partitionBy("_k", "_b")
        .orderBy(F.col("_ets"), F.col("_side"), F.col("_tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn(
        "_asof_in", F.last(F.col("_r"), ignorenulls=True).over(wb)
    )
    # 2. per-bucket last right value: max_by over right rows only — same
    # winner as the window's ascending-order last (max (ts, tiebreak))
    blast = (
        u.where(F.col("_side") == 0)
        .groupBy("_k", "_b")
        .agg(F.max_by(F.col("_r"), F.struct("_ets", "_tb")).alias("_blast"))
    )
    # make sure every (key, bucket) of the event stream has a carry row,
    # including buckets that contain only left rows
    buckets = u.select("_k", "_b").distinct().join(blast, ["_k", "_b"], "left")
    # 3. carry-in = last right value of any STRICTLY EARLIER bucket; this
    # window is per key over the bucket table (O(#buckets) rows per key)
    wc = (
        Window.partitionBy("_k")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = buckets.withColumn(
        "_carry", F.last(F.col("_blast"), ignorenulls=True).over(wc)
    ).select("_k", "_b", "_carry")
    # 4. join back on (key, bucket) — co-partitioned with pass 1
    return (
        filled.where(F.col("_side") == 1)
        .join(carry, ["_k", "_b"], "left")
        .withColumn("_asof", F.coalesce(F.col("_asof_in"), F.col("_carry")))
        .select(*out_cols)
    )
