"""Streaming decontamination: stream == batch equality, planted
contaminated docs rejected at ingest, clean docs pass through."""

from __future__ import annotations

from pyspark.sql import functions as F

from sum_spark.operators.decontam import decontaminate
from sum_spark.sources.tables import load_table
from sum_spark.streaming.decontam import clean_batch, streaming_decontaminate
from sum_spark.streaming.ingest_dedup import read_document_stream


def test_stream_decontam_matches_batch_and_rejects_planted(
    spark, sf_smoke, tmp_path
):
    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    benchmark = docs.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 500_000).alias("doc_id"), "text"
    )
    # Arriving stream: clean docs plus planted exact copies of benchmark
    # docs (guaranteed shingle overlap).
    arriving = docs.where(F.col("doc_id") < 60)

    drop_dir = str(tmp_path / "drops")
    arriving.coalesce(1).write.parquet(drop_dir)
    out_dir = str(tmp_path / "corpus")
    q = streaming_decontaminate(
        read_document_stream(spark, drop_dir),
        benchmark,
        path=out_dir,
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()

    got = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    want = {r["doc_id"] for r in clean_batch(arriving, benchmark).collect()}
    assert got == want

    flagged = {
        r["doc_id"] for r in decontaminate(arriving, benchmark).collect()
    }
    # The planted copies (doc_id % 7 == 0, < 60) are flagged and absent.
    planted = {r["doc_id"] for r in arriving.where(F.col("doc_id") % 7 == 0).collect()}
    assert planted and planted <= flagged
    assert got.isdisjoint(flagged)
    # Clean docs pass through: kept + flagged partitions the batch.
    n_arriving = arriving.count()
    assert len(got) + len(flagged) == n_arriving
    assert len(got) > 0
