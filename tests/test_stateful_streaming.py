"""applyInPandasWithState operators: streaming dedup + running counts.

Drives a real file-source stream twice against the same checkpoint to prove
state survives restarts (the first_seen filter must NOT re-emit keys seen
in the first run)."""

import datetime as dt

from deeprank_spark.streaming.stateful import first_seen_filter, running_counts

SCHEMA = "k string, ts timestamp"


def _rows(spark, keys, base_min=0):
    base = dt.datetime(2026, 1, 1)
    return spark.createDataFrame(
        [(k, base + dt.timedelta(minutes=base_min + i)) for i, k in enumerate(keys)],
        SCHEMA,
    )


def _run_stream(spark, src, ck, out_fn, out_dir, mode):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    w = out_fn(stream).writeStream.option("checkpointLocation", ck)
    if mode == "append":
        w = w.format("parquet").option("path", out_dir)
    else:
        # parquet sink rejects update mode; foreachBatch appends each
        # micro-batch's updated rows instead
        w = w.foreachBatch(
            lambda batch, _id: batch.write.mode("append").parquet(out_dir)
        )
    q = w.outputMode(mode).trigger(availableNow=True).start()
    q.awaitTermination(120)


def test_first_seen_filter_dedups_across_restarts(spark, tmp_path):
    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")

    _rows(spark, ["a", "b", "a", "c"]).write.mode("append").parquet(src)
    _run_stream(spark, src, ck, first_seen_filter, out, "append")
    got1 = {r["k"] for r in spark.read.parquet(out).collect()}
    assert got1 == {"a", "b", "c"}

    # second micro-batch: two repeats + one new key; state must persist
    _rows(spark, ["b", "d", "c"], base_min=100).write.mode("append").parquet(src)
    _run_stream(spark, src, ck, first_seen_filter, out, "append")
    rows = spark.read.parquet(out).collect()
    ks = [r["k"] for r in rows]
    assert sorted(ks) == ["a", "b", "c", "d"], "repeat keys must not re-emit"


def test_running_counts_accumulate(spark, tmp_path):
    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")

    _rows(spark, ["x", "x", "y"]).write.mode("append").parquet(src)
    _run_stream(spark, src, ck, running_counts, out, "update")
    _rows(spark, ["x", "y", "y"], base_min=50).write.mode("append").parquet(src)
    _run_stream(spark, src, ck, running_counts, out, "update")

    # last emitted total per key reflects the full stream
    rows = spark.read.parquet(out).collect()
    latest = {}
    for r in rows:
        latest[r["k"]] = max(latest.get(r["k"], 0), r["total"])
    assert latest == {"x": 3, "y": 3}


def test_first_seen_ttl_evicts_and_reemits(spark, tmp_path):
    """With state_ttl_ms, an idle key's marker is evicted (on the next
    batch after expiry) and a later re-occurrence re-emits — the bounded-
    state contract. ProcessingTimeTimeout fires for groups WITHOUT data in
    the batch, so eviction happens on the intermediate batch."""
    import time

    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")

    def run(keys, base_min):
        _rows(spark, keys, base_min=base_min).write.mode("append").parquet(src)
        _run_stream(
            spark, src, ck,
            lambda s: first_seen_filter(s, state_ttl_ms=500),
            out, "append",
        )

    run(["a"], 0)
    time.sleep(1.5)           # let a's TTL lapse
    run(["b"], 100)           # a has no data here -> timeout fires, state dropped
    run(["a"], 200)           # re-occurrence after eviction -> re-emit
    ks = sorted(r["k"] for r in spark.read.parquet(out).collect())
    assert ks == ["a", "a", "b"], ks
