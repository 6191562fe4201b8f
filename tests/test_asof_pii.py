"""As-of join + PII redaction (round-3 relational/corpus operators)."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from deeprank_spark.operators.asof import asof_join
from deeprank_spark.operators.textstats import redact_pii

T0 = datetime(2024, 1, 1)


def _ts(m):
    return T0 + timedelta(minutes=m)


def test_asof_join_matches_bruteforce(spark):
    left = spark.createDataFrame(
        [(i, i % 3, _ts(i * 7 % 50)) for i in range(30)],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100 + i, i % 3, _ts(i * 11 % 50), float(i)) for i in range(30)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    got = {
        r["event_id"]: (r["asof_event_id"], r["asof_value"])
        for r in asof_join(
            left, right, key="user_id", right_id="event_id",
            payload=("event_id", "value"),
        ).collect()
    }
    rrows = right.collect()
    for l in left.collect():
        cands = [
            r for r in rrows
            if r["user_id"] == l["user_id"] and r["ts"] <= l["ts"]
        ]
        if cands:
            best = max(cands, key=lambda r: (r["ts"], r["event_id"]))
            assert got[l["event_id"]] == (best["event_id"], best["value"]), l
        else:
            assert got[l["event_id"]] == (None, None), l
    assert len(got) == 30  # every left row kept


def test_asof_tie_at_equal_ts_matches(spark):
    left = spark.createDataFrame(
        [(1, 7, _ts(5))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, 7, _ts(5), 1.0), (11, 7, _ts(5), 2.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    row = asof_join(
        left, right, key="user_id", right_id="event_id",
        payload=("event_id", "value"),
    ).collect()[0]
    # right row AT the left ts matches; ties break on the larger event_id
    assert (row["asof_event_id"], row["asof_value"]) == (11, 2.0)


def test_redact_pii_counts_and_placeholders(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail a@b.co and c.d@e-f.org call +1-555-0100 from 10.0.0.1"),
            (2, "no pii here"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    assert got[1]["n_redactions"] == 4
    assert got[1]["redacted"] == (
        "mail <EMAIL> and <EMAIL> call <PHONE> from <IPV4>"
    )
    assert got[2]["n_redactions"] == 0 and got[2]["redacted"] == "no pii here"
    assert got[3]["n_redactions"] == 0 and got[3]["redacted"] == ""


def test_asof_string_right_id_deterministic_tiebreak(spark):
    """Right rows sharing (key, ts) must tie-break on right_id in its
    NATIVE type: a string id cast to long becomes NULL and the winner was
    arbitrary. The max string id must win (last in the window order)."""
    left = spark.createDataFrame([(1, 10)], "k int, ts int")
    right = spark.createDataFrame(
        [(1, 10, "ev_a", 1.0), (1, 10, "ev_c", 3.0), (1, 10, "ev_b", 2.0)],
        "k int, ts int, eid string, v double",
    )
    for _ in range(3):  # repeated runs would flap if the order were random
        row = asof_join(
            left, right, key="k", right_id="eid", payload=("eid", "v")
        ).first()
        assert row["asof_eid"] == "ev_c" and row["asof_v"] == 3.0


def test_asof_time_bucketed_equals_plain(spark):
    """The hot-key bucketed formulation is a pure scheduling change: for
    EVERY bucket width the result equals the single-window path —
    including buckets with only left rows (carry-in crosses empty
    buckets) and ties at bucket boundaries."""
    import random

    rng = random.Random(41)
    left = spark.createDataFrame(
        [(i, rng.randrange(4), _ts(rng.randrange(0, 200))) for i in range(60)],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1000 + i, rng.randrange(4), _ts(rng.randrange(0, 200)), float(i))
            for i in range(40)
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    kw = dict(key="user_id", right_id="event_id", payload=("event_id", "value"))
    plain = {
        r["event_id"]: (r["asof_event_id"], r["asof_value"])
        for r in asof_join(left, right, **kw).collect()
    }
    for width in (60.0, 600.0, 3600.0, 1e9):  # 1 min .. one-bucket degenerate
        got = {
            r["event_id"]: (r["asof_event_id"], r["asof_value"])
            for r in asof_join(left, right, time_bucket=width, **kw).collect()
        }
        assert got == plain, f"width={width}"


def test_asof_time_bucket_numeric_ts_and_validation(spark):
    import pytest

    left = spark.createDataFrame(
        [(1, 1, 100.0), (2, 1, 5.0)], "event_id long, user_id long, ts double"
    )
    right = spark.createDataFrame(
        [(10, 1, 50.0, 7.0), (11, 1, 99.0, 8.0)],
        "event_id long, user_id long, ts double, value double",
    )
    kw = dict(key="user_id", right_id="event_id", payload=("value",))
    got = {
        r["event_id"]: r["asof_value"]
        for r in asof_join(left, right, time_bucket=10.0, **kw).collect()
    }
    assert got == {1: 8.0, 2: None}
    with pytest.raises(ValueError, match="time_bucket must be > 0"):
        asof_join(left, right, time_bucket=0, **kw)
