"""Streaming benchmark decontamination — the contamination check applied
at ingest: documents sharing a word n-gram with the evaluation/benchmark
set never reach the training corpus sink.

Shape (the quality_gate pattern): the benchmark's distinct shingle-hash
table is computed ONCE from the static benchmark frame — eval sets are
megabytes, so the table is broadcast-sized by construction — and every
micro-batch runs the EXACT batch operator (operators.decontam.
decontaminate) against it inside foreachBatch, then anti-joins the
flagged ids. No streaming state, no watermark: contamination is a
property of the document alone versus a static set, so the decision is
micro-batch-local and redelivery-safe under the idempotent batch-id
sink layout. A document admitted here is exactly the document the batch
pipeline's decontamination stage would have kept — the stream==batch
parity the whole streaming layer guarantees.

Reference analog: none (no stream processor in the reference); this is
the streaming twin of pipeline stage 5 (operators/pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sum_spark.functions.text import SHINGLE_N
from sum_spark.operators.decontam import decontaminate


def clean_batch(
    batch_df: DataFrame,
    benchmark: DataFrame,
    n: int = SHINGLE_N,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One (micro-)batch minus its contaminated documents — usable on a
    static DataFrame too (it IS the batch decontamination filter)."""
    flagged = decontaminate(
        batch_df, benchmark, n=n, text_col=text_col, id_col=id_col
    ).select(F.col("doc_id").alias(id_col))
    return batch_df.join(flagged, id_col, "left_anti")


def streaming_decontaminate(
    stream_df: DataFrame,
    benchmark: DataFrame,
    path: str,
    checkpoint: str,
    n: int = SHINGLE_N,
    text_col: str = "text",
    id_col: str = "doc_id",
    trigger: dict | None = None,
):
    """Drain a document stream into an idempotent parquet corpus sink,
    dropping every document that overlaps the benchmark set.

    Batch ids are checkpoint-scoped (write_foreach_batch_parquet's
    contract): ``path`` and ``checkpoint`` live and die together.
    ``benchmark`` is a static frame; its shingle hashing happens inside
    the per-batch plan where the batch operator broadcasts it — the
    corpus-side stream is never shuffled.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        kept = clean_batch(batch_df, benchmark, n, text_col, id_col)
        kept.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")

    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
