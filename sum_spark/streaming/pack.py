"""Streaming sequence packing — pack_sequences (operators/sampling.py)
at ingest: documents arriving on a stream lay into the SAME fixed
token-budget packs the batch operator would produce over the whole
corpus, without ever revisiting packed data.

The trick is the one the streaming shard writer uses for shard
placement, applied to the token dimension: a document's pack is
``(tokens-before-it) DIV budget``, and tokens-before-it decomposes into
(total tokens of every earlier micro-batch) + (within-batch running
sum). The first term is a per-batch scalar recovered from a tiny token
log — so there is NO streaming state: micro-batch N packs itself with
``pack_sequences(batch, budget, token_base=base(N))`` where
``base(N) = sum of the logged totals of batches < N``, writes rows and
its own token total under idempotent ``batch_id=N`` directories, and a
redelivered batch recomputes the identical base (the log it reads
excludes itself) and overwrites in place.

Contract: the stream's arrival order IS the serialization order —
batches must arrive in nondecreasing ``id_col`` order (each batch's ids
follow the previous batch's), which is exactly how an upstream
curation pipeline emits a corpus. Under that contract stream-packed ==
batch-packed, row for row (parity-tested). The trailing pack of the
stream-so-far is open the same way the batch operator's last pack is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sum_spark.operators.sampling import pack_sequences


def _token_base(spark: SparkSession, path: str, batch_id: int) -> int:
    """Total tokens of batches strictly before ``batch_id`` — 0 for the
    first batch (no log yet). Reading only `< batch_id` rows is what
    makes redelivery idempotent: a replayed batch never counts its own
    first attempt."""
    try:
        log = spark.read.parquet(f"{path}/_tokens")
    except Exception:
        return 0
    [row] = (
        log.where(F.col("batch_id") < batch_id)
        .agg(F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("t"))
        .collect()
    )
    return int(row["t"])


def streaming_pack_sequences(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    trigger: dict | None = None,
):
    """Pack a document stream into fixed token-budget sequences:
    (doc_id, n_tokens, pack_id) rows of micro-batch N land under
    ``path/data/batch_id=N``, its token total under
    ``path/_tokens/batch_id=N``. Batch ids are checkpoint-scoped."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        base = _token_base(spark, path, batch_id)
        packed = pack_sequences(
            batch_df, budget, text_col=text_col, id_col=id_col, token_base=base
        )
        packed.write.mode("overwrite").parquet(f"{path}/data/batch_id={batch_id}")
        total = spark.read.parquet(f"{path}/data/batch_id={batch_id}").agg(
            F.coalesce(F.sum("n_tokens"), F.lit(0)).cast("long").alias("n_tokens")
        )
        total.coalesce(1).write.mode("overwrite").parquet(
            f"{path}/_tokens/batch_id={batch_id}"
        )

    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def read_packed(spark: SparkSession, path: str) -> DataFrame:
    """Everything packed so far: (doc_id, n_tokens, pack_id) in id
    order — the same frame the batch operator returns over all ingested
    documents."""
    return (
        spark.read.parquet(f"{path}/data")
        .drop("batch_id")
        .orderBy("doc_id")
    )
