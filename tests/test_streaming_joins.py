"""Stream-static / stream-stream joins and the foreachBatch sink."""

from __future__ import annotations

from pyspark.sql import functions as F

from sum_spark import streaming as S
from sum_spark.sources.tables import load_table
from sum_spark.streaming.joins import (
    enrich_stream,
    purchases_after_signup,
    write_foreach_batch_parquet,
)


def test_stream_static_enrichment(spark, sf_smoke):
    events = S.read_event_stream(spark, sf_smoke)
    dim = spark.createDataFrame(
        [("purchase", 1), ("view", 0), ("click", 0), ("signup", 0), ("error", 0)],
        "event_type string, is_revenue int",
    )
    out = S.run_to_memory(
        enrich_stream(events, dim, "event_type"), "t_enriched", output_mode="append"
    )
    batch = load_table(spark, sf_smoke, "events")
    assert out.count() == batch.count()
    rev = out.where(F.col("is_revenue") == 1).count()
    assert rev == batch.where(F.col("event_type") == "purchase").count()


def test_stream_stream_join_matches_batch(spark, sf_smoke):
    events = S.read_event_stream(spark, sf_smoke)
    out = S.run_to_memory(
        purchases_after_signup(events), "t_ssj", output_mode="append"
    )
    # Batch ground truth with the same interval condition.
    e = load_table(spark, sf_smoke, "events")
    s = e.where(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("signup_ts")
    )
    p = e.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts"), "value"
    )
    truth = p.join(
        s,
        (p.user_id == s.user_id)
        & (p.purchase_ts >= s.signup_ts)
        & (p.purchase_ts <= s.signup_ts + F.expr("INTERVAL 1 HOUR")),
    ).count()
    assert out.count() == truth > 0  # non-vacuity: fixture has real matches


def test_foreach_batch_sink_exactly_once_layout(spark, sf_smoke, tmp_path):
    events = S.read_event_stream(spark, sf_smoke).select("event_id", "user_id", "value")
    q = write_foreach_batch_parquet(
        events, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    written = spark.read.parquet(str(tmp_path / "out"))
    batch = load_table(spark, sf_smoke, "events")
    assert written.count() == batch.count()
    assert written.select("event_id").distinct().count() == batch.count()


def test_foreach_batch_sink_idempotent_on_redelivery(spark, sf_smoke, tmp_path):
    """Redelivery simulation: the same batch id written twice must not
    duplicate rows (the property the batch-id overwrite layout exists for)."""
    from sum_spark.streaming.joins import make_parquet_batch_sink

    sink = make_parquet_batch_sink(str(tmp_path / "out2"))
    batch = load_table(spark, sf_smoke, "events").select("event_id", "value")
    sink(batch, 0)
    sink(batch, 0)  # re-delivered micro-batch, same id
    written = spark.read.parquet(str(tmp_path / "out2"))
    assert written.count() == batch.count()
