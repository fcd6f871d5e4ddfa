"""Gap-based sessionization — the gaps-and-islands operator behind
q29_session_window, exposed as a public surface: assign every event a
session id (new session when the gap to the previous event of the same
key exceeds ``gap``), and aggregate per-session bounds.

Shape at scale: ONE shuffle (the per-key window partitioning) carries
both the lag comparison and the running session counter; session ids
are (key, ordinal) pairs, so they are deterministic, dense per key, and
never require a global sequence. The streaming twin is
F.session_window (sum_spark.streaming.sessionized — stream == batch
parity-tested).

No reference analog (the reference has no event/time surface); part of
the training-pipeline extension family (activity modeling, per-session
packing of interaction logs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("event_id",),
    session_col: str = "session_id",
) -> DataFrame:
    """All input columns + ``session_col`` (LONG, 1-based per key in
    time order). A new session starts when this event's timestamp is
    more than ``gap`` after the previous event of the same key; ties
    order by ``order_cols`` for determinism."""
    w = W.partitionBy(key_col).orderBy(ts_col, *order_cols)
    brk = (
        F.when(
            F.col(ts_col) > F.lag(ts_col).over(w) + F.expr(f"INTERVAL {gap}"),
            F.lit(1),
        )
        .otherwise(F.lit(0))
    )
    run = F.sum(brk).over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
    return events.withColumn(session_col, (run + F.lit(1)).cast("long"))


def session_bounds(
    sessionized: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Per-session (key, session_id, s, e, n[, v]) bounds from a
    sessionize() frame — q29's per-session aggregate, keyed so sessions
    can join back to events."""
    aggs = [
        F.min(ts_col).alias("s"),
        F.max(ts_col).alias("e"),
        F.count("*").alias("n"),
    ]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 2).alias("v"))
    return (
        sessionized.groupBy(key_col, session_col)
        .agg(*aggs)
        .orderBy(key_col, "s")
    )
