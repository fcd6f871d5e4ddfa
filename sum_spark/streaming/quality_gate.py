"""Streaming ingest quality gate — the trained classifier applied at
the door: each arriving micro-batch is scored with the EXPORTED
hashed-linear weights (operators/classifier) and only passing documents
reach the corpus sink.

Shape: the weight table is static and broadcast inside the batch
function (stream-static), and per-document scoring needs nothing beyond
the document itself — so the gate carries NO streaming state (no
watermark, no state store): scoring is micro-batch-local and the sink
inherits the idempotent batch-id layout of
streaming/joins.make_parquet_batch_sink, making redelivery safe.

This is the streaming twin of pipeline stage 4c: the same integer
micro-logit threshold, so a document admitted at ingest is exactly the
document the batch pipeline would have kept.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sum_spark.operators.classifier import score_text_classifier


def min_logit_micro(min_clf_prob: float) -> int:
    """Probability floor -> integer micro-logit threshold (the exact cut
    pipeline stage 4c applies)."""
    p = float(min_clf_prob)
    if not 0.0 < p < 1.0:
        raise ValueError("min_clf_prob must be in (0, 1)")
    return int(math.ceil(math.log(p / (1.0 - p)) * 1_000_000))


def gate_batch(
    batch_df: DataFrame,
    weights: DataFrame,
    intercept_micro: int,
    min_clf_prob: float,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score one (micro-)batch and keep only passing documents — usable
    directly on a static DataFrame too (it IS the stage-4c filter)."""
    floor = min_logit_micro(min_clf_prob)
    keep = (
        score_text_classifier(
            batch_df, weights, intercept_micro, text_col=text_col, id_col=id_col
        )
        .where(F.col("logit_micro") >= F.lit(floor))
        .select(F.col("doc_id").alias(id_col))
    )
    return batch_df.join(keep, id_col, "left_semi")


def streaming_quality_gate(
    stream_df: DataFrame,
    weights: DataFrame,
    intercept_micro: int,
    min_clf_prob: float,
    path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    trigger: dict | None = None,
):
    """Gate a document stream into an idempotent parquet corpus sink.

    Batch ids are checkpoint-scoped (see write_foreach_batch_parquet's
    contract): path and checkpoint live and die together.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        kept = gate_batch(
            batch_df, weights, intercept_micro, min_clf_prob, text_col, id_col
        )
        kept.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")

    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
