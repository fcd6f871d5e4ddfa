"""Streaming joins and transactional sinks.

- stream-static enrichment: a streaming fact joined to a static (broadcast)
  dimension — the bread-and-butter enrichment shape; no state needed.
- stream-stream join: two watermarked streams joined within a time bound;
  state is bounded by the watermark + interval condition (the join buffers
  only rows young enough to still find a match).
- foreachBatch parquet sink: per-micro-batch exactly-once writes keyed by
  batch id — the pattern for sinks without native streaming support.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(events: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static join: each micro-batch is joined against the (small)
    static dimension; F.broadcast keeps it a map-side join in every batch."""
    return events.join(F.broadcast(dim), on, "left")


def purchases_after_signup(events: DataFrame, within: str = "1 hour") -> DataFrame:
    """Stream-stream join: purchases matched to the same user's signup
    within ``within``. Both sides watermarked; the interval condition
    bounds the join state (rows age out once no counterpart can arrive).
    """
    signups = (
        events.where(F.col("event_type") == "signup")
        .select(F.col("user_id"), F.col("ts").alias("signup_ts"))
        .withWatermark("signup_ts", "10 minutes")
    )
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("purchase_ts"), "value")
        .withWatermark("purchase_ts", "10 minutes")
    )
    return purchases.join(
        signups,
        (purchases.user_id == signups.user_id)
        & (purchases.purchase_ts >= signups.signup_ts)
        & (purchases.purchase_ts <= signups.signup_ts + F.expr(f"INTERVAL {within}")),
        "inner",
    ).select(purchases.user_id, "signup_ts", "purchase_ts", "value")


def make_parquet_batch_sink(path: str):
    """Idempotent foreachBatch sink: each micro-batch overwrites its own
    batch-id subdirectory, so a re-delivered batch rewrites identical data
    instead of duplicating rows."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")

    return sink


def write_foreach_batch_parquet(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    trigger: dict | None = None,
):
    """Parquet sink via foreachBatch with per-batch idempotent writes.

    Batch ids are CHECKPOINT-scoped: ``path`` and ``checkpoint`` must live
    and die together. Restarting with a fresh checkpoint against an
    existing ``path`` restarts ids at 0 and overwrites earlier batches —
    point a new run at a new output path (or keep the checkpoint).

    ``trigger`` is passed to ``writeStream.trigger`` (default
    availableNow=True for bounded drains; use
    ``{"processingTime": "10 seconds"}`` for a continuous source).
    """
    return (
        stream_df.writeStream.foreachBatch(make_parquet_batch_sink(path))
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
