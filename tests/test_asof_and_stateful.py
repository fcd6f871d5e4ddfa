"""As-of join semantics tests and the applyInPandasWithState stateful
operator (state must survive across micro-batches)."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from sum_spark.operators.asof import asof_join


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


@pytest.fixture(scope="module")
def asof_data(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts(5)), (2, 1, _ts(10)), (3, 1, _ts(2)), (4, 2, _ts(7))],
        "event_id long, user_id long, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [(1, _ts(5), 100.0), (1, _ts(9), 200.0), (2, _ts(8), 300.0)],
        "user_id long, ts timestamp_ntz, value double",
    )
    return left, right


def test_asof_picks_latest_at_or_before(asof_data):
    left, right = asof_data
    out = {
        r["event_id"]: r["v"]
        for r in asof_join(
            left, right, on="user_id", ts_col="ts", values={"v": "value"}
        ).collect()
    }
    assert out[1] == 100.0  # equal timestamp IS visible (>= semantics)
    assert out[2] == 200.0  # latest of the two priors
    assert out[3] is None  # nothing at or before 00:02
    assert out[4] is None  # user 2's right row is later (00:08 > 00:07)


def test_stateful_totals_survive_microbatches(spark, sf_smoke, tmp_path):
    from sum_spark.streaming.stateful import running_user_totals
    from sum_spark.sources.tables import load_table

    # Split events into two files -> two micro-batches (maxFilesPerTrigger=1).
    events = load_table(spark, sf_smoke, "events").select("user_id", "ts", "value")
    src = str(tmp_path / "stream_src")
    half = events.count() // 2
    events.limit(half).coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "b1"))
    events.subtract(events.limit(half)).coalesce(1).write.mode("append").parquet(
        os.path.join(src, "b1")
    )
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "b1"))
    )
    q = (
        running_user_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("t_stateful")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("t_stateful")
    assert out.count() > 0
    # The running count is monotonic; its max per user must equal the true
    # batch count — only possible if state persisted across micro-batches.
    final = {
        r["user_id"]: r["m"]
        for r in out.groupBy("user_id").agg(F.max("n").alias("m")).collect()
    }
    truth = {
        r["user_id"]: r["c"]
        for r in events.groupBy("user_id").agg(F.count("*").alias("c")).collect()
    }
    assert final == truth


def test_asof_null_value_on_newest_right_row_propagates(spark):
    """All carried columns must come from the SAME right row: a NULL on
    the newest right row is carried as NULL, never backfilled from an
    older row (the mixed-row bug DuckDB ASOF does not have)."""
    left = spark.createDataFrame(
        [(1, 1, _ts(10))], "event_id long, user_id long, ts timestamp_ntz"
    )
    right = spark.createDataFrame(
        [(1, _ts(2), 100.0, "old"), (1, _ts(5), None, "new")],
        "user_id long, ts timestamp_ntz, value double, tag string",
    )
    row = asof_join(
        left, right, on="user_id", ts_col="ts", values={"v": "value", "t": "tag"}
    ).collect()[0]
    assert row["t"] == "new"
    assert row["v"] is None  # NOT 100.0 from the older row


def test_asof_forward_and_tolerance(spark):
    """Forward picks the earliest right at-or-after (ties visible);
    tolerance nulls carries farther than the interval in either
    direction; a NULL carried value still comes from the matched row."""
    import datetime as dt

    from pyspark.sql import functions as F

    from sum_spark.operators.asof import asof_join

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

    def ts(mins):
        return t0 + dt.timedelta(minutes=mins)

    left = spark.createDataFrame(
        [(1, "u", ts(0)), (2, "u", ts(50)), (3, "u", ts(100)), (4, "v", ts(0))],
        "event_id long, user_id string, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [("u", ts(10), 1.0), ("u", ts(60), None), ("v", ts(300), 9.0)],
        "user_id string, ts timestamp_ntz, value double",
    )
    vals = {"r_ts": "ts", "r_v": "value"}

    fwd = {
        r["event_id"]: (r["r_ts"], r["r_v"])
        for r in asof_join(
            left, right, on="user_id", values=vals, direction="forward"
        ).collect()
    }
    assert fwd[1] == (ts(10), 1.0)       # earliest at-or-after
    assert fwd[2] == (ts(60), None)      # matched row's NULL value carried
    assert fwd[3] == (None, None)        # nothing after -> left-join nulls
    assert fwd[4] == (ts(300), 9.0)

    tol = {
        r["event_id"]: (r["r_ts"], r["r_v"])
        for r in asof_join(
            left, right, on="user_id", values=vals,
            direction="forward", tolerance="15 MINUTES",
        ).collect()
    }
    assert tol[1] == (ts(10), 1.0)       # 10 min <= 15 min
    assert tol[2] == (ts(60), None)      # 10 min gap, NULL value kept
    assert tol[4] == (None, None)        # 300 min > tolerance -> nulled

    back_tol = {
        r["event_id"]: (r["r_ts"], r["r_v"])
        for r in asof_join(
            left, right, on="user_id", values=vals, tolerance="30 MINUTES"
        ).collect()
    }
    assert back_tol[1] == (None, None)   # nothing before
    assert back_tol[2] == (None, None)   # latest is 40 min back > 30 -> nulled
    assert back_tol[3] == (None, None)   # latest is 40 min back > 30 -> nulled
    assert back_tol[4] == (None, None)


def test_sessionize_ids_and_bounds(spark):
    """Per-event session ids: dense 1-based per key in time order, a
    new id exactly when the gap exceeds the threshold; bounds aggregate
    back to the q29 shape."""
    import datetime as dt

    from sum_spark.operators.sessions import session_bounds, sessionize

    t0 = dt.datetime(2026, 1, 1, 9, 0, 0)

    def ts(mins):
        return t0 + dt.timedelta(minutes=mins)

    ev = spark.createDataFrame(
        [
            (1, "u", ts(0), 1.0),
            (2, "u", ts(10), 2.0),
            (3, "u", ts(45), 4.0),   # 35 min gap -> new session
            (4, "u", ts(46), 8.0),
            (5, "v", ts(0), 1.0),
        ],
        "event_id long, user_id string, ts timestamp_ntz, value double",
    )
    sz = sessionize(ev, gap="30 minutes")
    got = {r["event_id"]: r["session_id"] for r in sz.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}
    # exactly-at-gap boundary: 30 min gap is SAME session (> not >=)
    edge = spark.createDataFrame(
        [(1, "u", ts(0), 0.0), (2, "u", ts(30), 0.0)],
        "event_id long, user_id string, ts timestamp_ntz, value double",
    )
    ids = {r["event_id"]: r["session_id"] for r in sessionize(edge).collect()}
    assert ids == {1: 1, 2: 1}

    b = session_bounds(sz, value_col="value").collect()
    rows = {(r["user_id"], r["session_id"]): (r["s"], r["e"], r["n"], r["v"]) for r in b}
    assert rows[("u", 1)] == (ts(0), ts(10), 2, 3.0)
    assert rows[("u", 2)] == (ts(45), ts(46), 2, 12.0)
    assert rows[("v", 1)] == (ts(0), ts(0), 1, 1.0)
