"""Streaming shard export: stream-written shard membership must equal
the batch writer's (stateless rank-based placement), redelivered batches
must not double-write (idempotent batch-id layout), and sealed/requested
reads must prune at the directory level."""

from __future__ import annotations

import contextlib
import io
import json

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from sum_spark.sources.tables import load_table
from sum_spark.streaming.shards import (
    _write_shard_batch,
    read_stream_shards,
    stream_shard_counts,
    streaming_shard_writer,
)

ROWS_PER_SHARD = 16
SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)


def _run_stream(spark, sf_smoke, tmp_path):
    """Drop the smoke docs as two files, stream them through the shard
    writer one file per micro-batch (doc_id is the dense rank)."""
    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    drop_dir = str(tmp_path / "drops")
    docs.where(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(drop_dir)
    docs.where(F.col("doc_id") % 2 != 0).coalesce(1).write.mode("append").parquet(
        drop_dir
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop_dir)
    )
    out = str(tmp_path / "shards")
    q = streaming_shard_writer(
        stream,
        path=out,
        checkpoint=str(tmp_path / "ckpt"),
        order_col="doc_id",
        rows_per_shard=ROWS_PER_SHARD,
    )
    q.awaitTermination()
    return docs, out


def test_stream_shards_match_batch_export(spark, sf_smoke, tmp_path):
    from sum_spark.sources.shards import write_training_shards

    docs, out = _run_stream(spark, sf_smoke, tmp_path)

    import glob

    assert len(glob.glob(out + "/data/batch_id=*")) >= 2  # real accumulation

    batch_path = str(tmp_path / "batch_shards")
    write_training_shards(
        docs, batch_path, order_col="doc_id", rows_per_shard=ROWS_PER_SHARD, base=0
    )
    batch_rows = {
        (int(r["shard"]), r["doc_id"])
        for r in spark.read.parquet(batch_path)
        .where(~F.input_file_name().contains("_manifest"))
        .select("shard", "doc_id")
        .collect()
    }
    stream_rows = {
        (int(r["shard"]), r["doc_id"])
        for r in read_stream_shards(spark, out, sealed_only=False)
        .select("shard", "doc_id")
        .collect()
    }
    assert stream_rows == batch_rows

    # Sealing: every shard but (at most) the trailing remainder is full.
    counts = {
        int(r["shard"]): (r["n_rows"], r["sealed"])
        for r in stream_shard_counts(spark, out).collect()
    }
    n_docs = docs.count()
    assert sum(n for n, _ in counts.values()) == n_docs
    for shard, (n, sealed) in counts.items():
        assert sealed == (n >= ROWS_PER_SHARD)
        if shard < max(counts) :
            assert n == ROWS_PER_SHARD
    sealed_rows = read_stream_shards(spark, out, sealed_only=True).count()
    assert sealed_rows == sum(n for n, s in counts.values() if s)


def test_stream_shards_redelivery_idempotent(spark, sf_smoke, tmp_path):
    docs, out = _run_stream(spark, sf_smoke, tmp_path)
    before = sorted(
        tuple(r)
        for r in read_stream_shards(spark, out, sealed_only=False)
        .select("shard", "doc_id")
        .collect()
    )
    # Redeliver batch 0 (failure-recovery replay): same rows, same id.
    meta = json.dumps(
        {"order_col": "doc_id", "rows_per_shard": ROWS_PER_SHARD,
         "base": 0, "fmt": "parquet"}
    )
    replay = docs.where(F.col("doc_id") % 2 == 0)
    _write_shard_batch(
        replay, 0, out, "doc_id", ROWS_PER_SHARD, 0, "parquet", meta
    )
    after = sorted(
        tuple(r)
        for r in read_stream_shards(spark, out, sealed_only=False)
        .select("shard", "doc_id")
        .collect()
    )
    assert after == before  # overwrote its own directory, no double rows


def test_stream_shard_read_prunes_partitions(spark, sf_smoke, tmp_path):
    _, out = _run_stream(spark, sf_smoke, tmp_path)
    df = read_stream_shards(spark, out, shards=[0], sealed_only=False)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "PartitionFilters: [" in p
    pf = p.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "shard" in pf  # directory-level pruning, not a post-read filter
