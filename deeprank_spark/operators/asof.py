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
blow-up, no per-key skew beyond the key's own row count (a hot key is
one sorted partition stream; at 100 TB split hot keys by time-bucketing
the window, semantics unchanged since buckets carry over their last
value via a second pass). The payload travels as ONE struct so every
asof_* column comes from the SAME right row even when payload fields
are null.

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
) -> DataFrame:
    """-> all left columns + `asof_<col>` for each right payload column
    (null when no right row precedes the left row)."""
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
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ets"), F.col("_side"), F.col("_tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn("_asof", F.last(F.col("_r"), ignorenulls=True).over(w))
    return filled.where(F.col("_side") == 1).select(
        *[F.col(f"_l.{c}").alias(c) for c in lcols],
        *[F.col(f"_asof.{c}").alias(f"asof_{c}") for c in pay],
    )
