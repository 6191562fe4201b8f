"""Hot-key as-of join benchmark: one user holds ~10% of all events, the
rest follow a uniform key distribution. Compares the plain single-window
formulation (hot key = one sorted task) against the time-bucketed two-pass
formulation (operators/asof.py `time_bucket`), verifying identical results
and reporting wall time + max single-task duration from the Spark listener.

Usage: python tools/asof_skew_bench.py [n_events] — prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from deeprank_spark.operators.asof import asof_join  # noqa: E402
from deeprank_spark.session import get_spark  # noqa: E402


def _stages(spark):
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    return ui, app, json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages?status=complete")
    )


def _max_task_ms(spark, body):
    """Run body() and return (result, wall s, max single-task ms) — task
    durations read from the Spark monitoring REST API (same numbers as the
    UI), restricted to stages submitted by THIS body()."""
    import urllib.request

    _, _, before = _stages(spark)
    stage_floor = max([s["stageId"] for s in before], default=-1)
    t0 = time.time()
    out = body()
    wall = time.time() - t0
    ui, app, after = _stages(spark)
    max_ms = 0.0
    for s in after:
        if s["stageId"] <= stage_floor:
            continue
        ts = json.load(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/stages/"
                f"{s['stageId']}/{s['attemptId']}/taskSummary?quantiles=1.0"
            )
        )
        d = (ts.get("duration") or [0])[0]
        if d > max_ms:
            max_ms = d
    return out, wall, max_ms


def main(n: int) -> None:
    spark = get_spark(
        app_name="asof-skew-bench",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "true"},  # REST task metrics
    )
    spark.sparkContext.setLogLevel("ERROR")
    # ~25% of events on user 0, the rest uniform over 1000 users; integer
    # timestamps spread over n units so buckets split the hot key evenly.
    # 25% makes the hot key's sorted-window task the unambiguous straggler
    # in the plain formulation (10% drowned in fixed costs at bench sizes)
    base = spark.range(n)
    ev = base.select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") % 4 == 0, F.lit(0))
        .otherwise(F.xxhash64("id") % 1000 + 1)
        .alias("user_id"),
        (F.xxhash64("id", F.lit(7)) % n + n).cast("double").alias("ts"),
        (F.col("id") % 97).cast("double").alias("value"),
    ).localCheckpoint(eager=True)
    left = ev.where(F.col("event_id") % 2 == 0).select("event_id", "user_id", "ts")
    right = ev.where(F.col("event_id") % 2 == 1)
    kw = dict(key="user_id", right_id="event_id", payload=("event_id", "value"))

    out = {
        "n_events": n,
        "hot_key_rows": ev.where("user_id = 0").count(),
    }
    sums = {}
    for tag, tb in (("plain", None), ("bucketed", float(n // 64))):
        def body():
            df = asof_join(left, right, time_bucket=tb, **kw)
            return df.agg(
                F.count("*").alias("rows"),
                F.sum(F.col("asof_value")).alias("sum_v"),
                F.sum(F.col("asof_event_id")).alias("sum_id"),
            ).first()

        row, wall, max_ms = _max_task_ms(spark, body)
        sums[tag] = (row["rows"], row["sum_v"], row["sum_id"])
        out[tag] = {"wall_s": round(wall, 2), "max_task_ms": int(max_ms)}
    out["results_identical"] = sums["plain"] == sums["bucketed"]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000)
