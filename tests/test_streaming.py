"""Streaming parity tests: each streaming window operator must produce the
same result as its batch-declared (DuckDB-checkable) twin on the same
input — the strategy from SURVEY §5 item (4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sum_spark import streaming as S
from sum_spark.queries import REGISTRY


@pytest.fixture(scope="module", autouse=True)
def utc(spark):
    # The streaming source uses LTZ event time (state ops need instants);
    # pin UTC so wall-clock window starts equal the batch NTZ form.
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    yield
    spark.conf.set("spark.sql.session.timeZone", old)


def _pdf(df, cols):
    out = df.toPandas()[cols].sort_values(cols, ignore_index=True)
    for c in out.columns:
        if str(out[c].dtype).startswith("datetime64"):
            out[c] = out[c].dt.tz_localize(None) if out[c].dt.tz is not None else out[c]
    return out


def test_tumbling_matches_batch(spark, sf_smoke):
    stream = S.run_to_memory(
        S.tumbling_counts(S.read_event_stream(spark, sf_smoke)), "t_tumbling"
    )
    batch = REGISTRY["q27_tumbling_window"].fn(spark, sf_smoke)
    cols = ["ws", "event_type", "c", "s"]
    assert _pdf(stream, cols).equals(_pdf(batch, cols))


def test_sliding_matches_batch(spark, sf_smoke):
    stream = S.run_to_memory(
        S.sliding_counts(S.read_event_stream(spark, sf_smoke)), "t_sliding"
    )
    # the entry also carries the per-event 'trail' leg; the streaming
    # twin is the 30-minute sliding grid = the 'slide' leg
    batch = REGISTRY["q28_sliding_window"].fn(spark, sf_smoke).where("mode = 'slide'")
    cols = ["ws", "event_type", "c", "s"]
    assert _pdf(stream, cols).equals(_pdf(batch, cols))


def test_session_matches_batch(spark, sf_smoke):
    stream = S.run_to_memory(
        S.sessionized(S.read_event_stream(spark, sf_smoke)), "t_session"
    )
    batch = REGISTRY["q29_session_window"].fn(spark, sf_smoke)
    # session_window: start = min(ts), end = last ts + gap; batch: s=min, e=max.
    stream_n = stream.select(
        "user_id", "s", F.expr("e - INTERVAL 30 MINUTES").alias("e"), F.col("n")
    )
    batch_n = batch.select("user_id", "s", "e", "n")
    cols = ["user_id", "s", "e", "n"]
    assert _pdf(stream_n, cols).equals(_pdf(batch_n, cols))


def test_dedup_stream(spark, sf_smoke):
    events = S.read_event_stream(spark, sf_smoke)
    out = S.run_to_memory(S.dedup_events(events), "t_dedup", output_mode="append")
    total = out.count()
    distinct_ids = out.select("event_id").distinct().count()
    assert total == distinct_ids > 0
