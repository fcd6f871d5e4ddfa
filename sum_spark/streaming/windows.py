"""Structured Streaming operators over the events stream: tumbling /
sliding / session windows with watermarked late-data handling, and
stateful deduplication.

The reference has no stream processor (it is an online gRPC server); this
module is the engine extension declared in SURVEY §2.F Q27-Q29. Each
streaming aggregation has a batch-declared twin in
``sum_spark.queries.windows`` — the DuckDB oracle checks the batch form,
and the tests here assert stream == batch on the same input (the
foreachBatch-parity strategy from SURVEY §5).

Watermarks: 10 minutes for windowed aggs (late events beyond the
watermark are dropped — the knob a 100 TB deployment tunes against its
ingestion skew), and the dedup state is likewise watermark-bounded so the
per-key state store cannot grow without bound.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

def _events_schema(ts_type) -> StructType:
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", ts_type),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


# events.parquet has shipped ts as TIMESTAMP(NANOS) -> long (nanosAsLong)
# and as timestamp[us]; the stream reader sniffs the file like the batch
# reader (sources/tables.py) and applies the matching conversion.
EVENTS_NANOS_SCHEMA = _events_schema(LongType())

WATERMARK = "10 minutes"


def read_event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the events table (one-file directory scan;
    in production this is the Kafka/queue source with the same schema).

    Streaming state operators require TIMESTAMP (instant) event time, so
    unlike the batch reader this produces LTZ; tests pin UTC for parity.
    File streams need an explicit schema, so the physical ts shape is
    sniffed with one footer-only batch read, then converted to the instant
    whose UTC wall clock equals the batch reader's NTZ value — via integer
    epoch arithmetic in every branch, never the session timezone.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    sf_dir = sf_dir.rstrip(os.sep)
    ts_read = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema["ts"].dataType
    )
    raw = (
        spark.readStream.schema(_events_schema(ts_read))
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if isinstance(ts_read, LongType):  # nanos-as-long
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(ts_read, TimestampNTZType):
        return raw.withColumn(
            "ts",
            F.expr(
                "timestamp_micros(timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts))"
            ),
        )
    if isinstance(ts_read, TimestampType):  # already an instant
        return raw
    raise TypeError(f"events.ts read as unsupported type {ts_read}")


def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Q27 streaming form: per-window per-type count + sum(value)."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").alias("c"), F.round(F.sum("value"), 2).alias("s"))
        .select(F.col("w.start").alias("ws"), "event_type", "c", "s")
    )


def sliding_counts(
    events: DataFrame, width: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Q28 streaming form: overlapping windows (each event in width/slide
    windows)."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("c"), F.round(F.sum("value"), 2).alias("s"))
        .select(F.col("w.start").alias("ws"), "event_type", "c", "s")
    )


def sessionized(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Q29 streaming form: native session windows (gap-merged state).

    Note the contract difference vs the batch gaps-and-islands form:
    session_window.end = last event time + gap, while the batch query's
    ``e`` is MAX(ts); tests reconcile by subtracting the gap.
    """
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
        .select(
            "user_id",
            F.col("w.start").alias("s"),
            F.col("w.end").alias("e"),
            "n",
        )
    )


def dedup_events(events: DataFrame, within: str = WATERMARK) -> DataFrame:
    """Stateful exactly-once dedup on event_id within the watermark window
    (state-store-bounded, unlike an unbounded distinct)."""
    return events.withWatermark("ts", within).dropDuplicatesWithinWatermark(["event_id"])


def run_to_memory(
    stream_df: DataFrame, name: str, output_mode: str = "complete"
) -> DataFrame:
    """Drive a streaming DataFrame to completion against the memory sink
    (availableNow trigger) and return the result table — the local smoke
    harness; production sinks are kafka/parquet/foreachBatch."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)
