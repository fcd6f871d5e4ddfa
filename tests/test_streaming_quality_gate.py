"""Streaming classifier gate: stream == batch equality, planted
low-quality docs rejected at ingest, redelivery-safe sink layout."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sum_spark.operators.classifier import train_text_classifier
from sum_spark.sources.tables import load_table
from sum_spark.streaming.ingest_dedup import read_document_stream
from sum_spark.streaming.quality_gate import gate_batch, streaming_quality_gate


@pytest.fixture(scope="module")
def fitted(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    sample = docs.where(F.col("doc_id") % 4 == 0)
    neg = sample.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), F.reverse("text").alias("text")
    )
    labeled = sample.withColumn("label", F.lit(1)).unionByName(
        neg.withColumn("label", F.lit(0))
    )
    return train_text_classifier(labeled)


def test_stream_gate_matches_batch_and_rejects_planted(
    spark, sf_smoke, fitted, tmp_path
):
    weights, b = fitted
    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    good = docs.where((F.col("doc_id") % 4 != 0) & (F.col("doc_id") < 100))
    bad = good.limit(4).select(
        (F.col("doc_id") + 7_000_000).alias("doc_id"), F.reverse("text").alias("text")
    )
    arriving = good.unionByName(bad)

    drop_dir = str(tmp_path / "drops")
    arriving.coalesce(1).write.parquet(drop_dir)
    out_dir = str(tmp_path / "corpus")
    q = streaming_quality_gate(
        read_document_stream(spark, drop_dir).select("doc_id", "text"),
        weights,
        b,
        min_clf_prob=0.5,
        path=out_dir,
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    got = spark.read.parquet(out_dir).select("doc_id", "text")

    want = gate_batch(arriving, weights, b, min_clf_prob=0.5)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    ids = {r["doc_id"] for r in got.collect()}
    assert not any(i >= 7_000_000 for i in ids)  # planted reversed docs rejected
    n_good = good.count()
    assert len(ids) > 0.8 * n_good  # ordinary docs pass


def test_gate_batch_threshold_edges(spark, fitted):
    weights, b = fitted
    with pytest.raises(ValueError):
        gate_batch(
            spark.createDataFrame([(1, "x")], "doc_id long, text string"),
            weights,
            b,
            min_clf_prob=1.0,
        )
