"""Streaming training-shard export — the last-mile shard writer
(sources/shards.py) at ingest time: a continuously curated stream rolls
into numbered, fixed-size shards as rows arrive, and a trainer can start
consuming SEALED shards while the stream is still filling later ones.

No reference analog (the reference has no bulk export at all); this is
the streaming twin of write_training_shards, built on the engine's
standard redelivery-safe sink layout (streaming/sketch.py pattern).

Design — stateless placement, idempotent batches, merge-at-read sealing:

- PLACEMENT carries no streaming state. Like the batch writer, rows must
  arrive with a dense serialization rank (``order_col`` — the upstream
  pipeline's assign_contiguous_ids / shuffle_pos), and shard membership
  is the same pure map-side function ``(order - base) DIV
  rows_per_shard`` — so stream-written and batch-written exports of the
  same corpus have byte-identical shard membership (parity-tested), and
  a redelivered row can only ever land in the shard it already belongs
  to.
- Each micro-batch APPENDS nothing: it overwrites its OWN directory
  ``path/data/batch_id=N``, sub-partitioned by shard. Redelivery after
  a failure rewrites that directory idempotently instead of
  double-writing rows. A logical shard is the union of its
  ``*/shard=M`` slices across batch directories; both ``batch_id`` and
  ``shard`` are Hive partition columns, so a shard-restricted read
  prunes at the directory level (PartitionFilters), exactly like the
  batch reader's resume path.
- SEALING is decided at read time from per-batch per-shard row counts
  (``path/_counts/batch_id=N`` — bounded at shards-touched-per-batch
  rows, written in the same idempotent layout): shard M is sealed once
  its accumulated count reaches ``rows_per_shard``. The count roll-up
  touches kilobytes of bookkeeping, never the data — the same
  merge-at-read shape as the streaming sketches.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _with_shard(df: DataFrame, order_col: str, rows_per_shard: int, base: int):
    return df.withColumn(
        "shard",
        F.expr(
            f"CAST((`{order_col}` - {int(base)}) DIV {int(rows_per_shard)} AS LONG)"
        ),
    )


def streaming_shard_writer(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    order_col: str = "shuffle_pos",
    rows_per_shard: int = 100_000,
    base: int = 0,
    fmt: str = "parquet",
    trigger: dict | None = None,
):
    """Roll a stream into fixed-size training shards under ``path``.

    ``order_col`` must be the corpus's dense serialization rank with
    origin ``base`` (the streaming writer cannot discover min(order) the
    way the batch writer can — ranks arrive incrementally). Rows of
    micro-batch N land in ``path/data/batch_id=N/shard=M``; counts in
    ``path/_counts/batch_id=N``; the shard geometry in ``path/_meta``
    (rewritten per batch with identical content — idempotent). Batch ids
    are checkpoint-scoped: path and checkpoint live and die together.
    """
    if fmt not in ("parquet", "json"):
        raise ValueError(f"unsupported shard format {fmt!r}")
    meta = json.dumps(
        {"order_col": order_col, "rows_per_shard": int(rows_per_shard),
         "base": int(base), "fmt": fmt}
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        _write_shard_batch(
            batch_df, batch_id, path, order_col, rows_per_shard, base, fmt, meta
        )

    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def _write_shard_batch(
    batch_df: DataFrame,
    batch_id: int,
    path: str,
    order_col: str,
    rows_per_shard: int,
    base: int,
    fmt: str,
    meta: str,
) -> None:
    """One micro-batch's idempotent write: data + counts under the
    batch-id directories (a redelivery overwrites both in place), plus
    the constant ``_meta``. Module-level so redelivery is directly
    testable."""
    sharded = _with_shard(batch_df, order_col, rows_per_shard, base)
    (
        sharded.repartition("shard")
        .sortWithinPartitions("shard", order_col)
        .write.partitionBy("shard")
        .mode("overwrite")
        .format(fmt)
        .save(f"{path}/data/batch_id={batch_id}")
    )
    counts = sharded.groupBy("shard").agg(F.count("*").cast("long").alias("n_rows"))
    counts.coalesce(1).write.mode("overwrite").parquet(
        f"{path}/_counts/batch_id={batch_id}"
    )
    batch_df.sparkSession.createDataFrame([(meta,)], "meta string").coalesce(
        1
    ).write.mode("overwrite").json(f"{path}/_meta")


def _read_meta(spark: SparkSession, path: str) -> dict:
    [row] = spark.read.json(f"{path}/_meta").collect()
    return json.loads(row["meta"])


def stream_shard_counts(spark: SparkSession, path: str) -> DataFrame:
    """(shard, n_rows, sealed) so far: per-batch counts rolled up —
    kilobytes of bookkeeping, no data scan. A shard is sealed when it
    holds its full ``rows_per_shard`` complement; only the trailing
    shard of a quiesced stream stays open."""
    meta = _read_meta(spark, path)
    return (
        spark.read.parquet(f"{path}/_counts")
        .groupBy("shard")
        .agg(F.sum("n_rows").cast("long").alias("n_rows"))
        .withColumn("sealed", F.col("n_rows") >= F.lit(meta["rows_per_shard"]))
    )


def read_stream_shards(
    spark: SparkSession,
    path: str,
    shards: list[int] | None = None,
    sealed_only: bool = True,
    schema=None,
) -> DataFrame:
    """Read back the export. ``sealed_only`` (default) restricts to
    complete shards — what a trainer may consume while the stream still
    fills later ones; pass False for everything written so far. Both the
    seal cut and an explicit ``shards`` list are filters on partition
    columns — directory-level pruning, never a post-read scan. The
    ``batch_id`` bookkeeping column is dropped; rows of one shard
    reassemble across batch slices in ``order_col`` order (json shards
    need ``schema``, as in the batch reader)."""
    meta = _read_meta(spark, path)
    reader = spark.read.format(meta["fmt"])
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.load(f"{path}/data")
    if sealed_only:
        sealed = sorted(
            int(r["shard"])
            for r in stream_shard_counts(spark, path)
            .where(F.col("sealed"))
            .collect()
        )
        # Ranks arrive roughly in order, so the sealed set is normally
        # the contiguous prefix [0..m] — one comparison instead of a
        # predicate enumerating every sealed shard (at full scale the
        # export holds ~10^5 shards; an isin that size is a plan, not a
        # filter). The enumerated form remains as the out-of-order
        # fallback; both are partition-column filters, so pruning is
        # identical.
        if sealed and sealed == list(range(sealed[0], sealed[0] + len(sealed))):
            df = df.where(
                (F.col("shard") >= sealed[0]) & (F.col("shard") <= sealed[-1])
            )
        else:
            df = df.where(F.col("shard").isin(sealed))
    if shards is not None:
        df = df.where(F.col("shard").isin([int(s) for s in shards]))
    return df.drop("batch_id")
