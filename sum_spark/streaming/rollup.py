"""Streaming continuous aggregate — the hypertable pattern
(operators/rollup_ts.py) maintained at ingest: each micro-batch
contributes its own hourly partial rows, and the up-to-date hourly
table (from which every coarser grain serves, q43) is a partial-merge
at read time.

This works because the partial schema is REAGGREGATABLE by design
(count/sum re-roll by summing, min/max by min/max — the same property
that lets rollup_to serve day/week/month from hours): a micro-batch's
hourly partials merge with every other batch's exactly like hourly
partials merge into days. So, as with the sketch family
(streaming/sketch.py), no streaming state is needed — per-batch
partials land in idempotent ``batch_id=N`` directories (redelivery
overwrites, never double-counts) and the merge is an aggregation over
partial ROWS (hours x event types x batches), never over raw events.
A dashboard reading the rollup scans kilobytes of partials while the
raw stream runs to billions of rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sum_spark.operators.rollup_ts import hourly_rollup


def streaming_hourly_rollup(
    stream_events: DataFrame,
    path: str,
    checkpoint: str,
    trigger: dict | None = None,
    auto_compact_after: int | None = None,
):
    """Maintain hourly (h, event_type) partials over an event stream:
    one partial-rows parquet per micro-batch under ``path/batch_id=N``.
    Batch ids are checkpoint-scoped (path and checkpoint live and die
    together). ``auto_compact_after`` folds the committed batch-dir
    prefix in-sink once that many dirs accumulate (streaming/compact.
    maybe_auto_compact)."""
    from sum_spark.streaming.compact import maybe_auto_compact

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        maybe_auto_compact(
            batch_df.sparkSession, path, checkpoint, auto_compact_after
        )
        hourly_rollup(batch_df).write.mode("overwrite").parquet(
            f"{path}/batch_id={batch_id}"
        )

    return (
        stream_events.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def read_hourly_rollup(spark: SparkSession, path: str) -> DataFrame:
    """The accumulated hourly table: partial-merge across batch
    directories — same schema as operators/rollup_ts.hourly_rollup over
    all ingested events, so rollup_to() serves day/week/month from it
    unchanged."""
    return (
        spark.read.parquet(path)
        .groupBy("h", "event_type")
        .agg(
            F.sum("c").alias("c"),
            F.sum("s").alias("s"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
        )
    )
