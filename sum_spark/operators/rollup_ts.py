"""Two-level time-series rollup (the continuous-aggregate / hypertable
pattern): materialize fine-grained partials once, serve coarser grains
from the partials instead of rescanning raw events.

At 100 TB this is the difference between a daily dashboard reading 24
hourly partial rows per day versus re-aggregating billions of raw events:
the hourly table is the only scan of raw data, and every coarser grain
(day, week, month) is an aggregation over it. Counts and sums re-roll
exactly; averages are derived as sum/count at serve time (never averaged
across partials); min/max re-roll; distincts would need sketches (HLL) —
the standard re-aggregatable vs non-re-aggregatable split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_rollup(events: DataFrame) -> DataFrame:
    """The fine-grained partial: one row per (hour, event_type)."""
    return (
        events.groupBy(
            F.date_trunc("hour", "ts").alias("h"), "event_type"
        ).agg(
            F.count("*").alias("c"),
            F.sum("value").alias("s"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
    )


def rollup_to(hourly: DataFrame, grain: str) -> DataFrame:
    """Serve a coarser grain from the hourly partials (no raw scan).
    ``grain`` is any date_trunc unit coarser than hour ('day', 'week',
    'month')."""
    return (
        hourly.groupBy(F.date_trunc(grain, "h").alias("g"), "event_type")
        .agg(
            F.sum("c").alias("c"),
            F.sum("s").alias("s"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
        )
        .withColumn("avg_v", F.col("s") / F.col("c"))
    )
