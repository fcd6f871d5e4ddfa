"""Streaming sequence packing: stream-packed pack ids must equal the
batch operator's over the same corpus (stateless token-base placement),
and the token-base recovery must exclude a batch's own log row (the
redelivery-idempotence property)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sum_spark.operators.sampling import pack_sequences
from sum_spark.sources.tables import load_table
from sum_spark.streaming.pack import (
    _token_base,
    read_packed,
    streaming_pack_sequences,
)

BUDGET = 512


def test_stream_pack_equals_batch_pack(spark, sf_smoke, tmp_path):
    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    cut = docs.approxQuantile("doc_id", [0.5], 0.0)[0]

    # Arrival order IS the serialization order: earlier ids first.
    drop_dir = str(tmp_path / "drops")
    docs.where(F.col("doc_id") < cut).coalesce(1).write.parquet(drop_dir)
    docs.where(F.col("doc_id") >= cut).coalesce(1).write.mode("append").parquet(
        drop_dir
    )
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop_dir)
    )
    out = str(tmp_path / "packed")
    q = streaming_pack_sequences(
        stream, path=out, checkpoint=str(tmp_path / "ckpt"), budget=BUDGET
    )
    q.awaitTermination()

    import glob

    assert len(glob.glob(out + "/data/batch_id=*")) >= 2

    streamed = [
        (r["doc_id"], r["n_tokens"], r["pack_id"])
        for r in read_packed(spark, out).collect()
    ]
    batch = [
        (r["doc_id"], r["n_tokens"], r["pack_id"])
        for r in pack_sequences(docs, BUDGET).collect()
    ]
    assert streamed == batch and streamed

    # Token-base recovery: batch 0 sees 0 even though the log exists;
    # batch 1 sees exactly batch 0's total (its own row is excluded —
    # the property that makes a redelivered batch recompute the same
    # base instead of double-counting its first attempt).
    t0 = spark.read.parquet(out + "/_tokens").where("batch_id = 0").collect()[0][
        "n_tokens"
    ]
    assert _token_base(spark, out, 0) == 0
    assert _token_base(spark, out, 1) == t0
    assert _token_base(spark, str(tmp_path / "nowhere"), 0) == 0


def test_pack_token_base_shifts_placement(spark, sf_smoke):
    """pack_sequences(token_base=t) == packing a corpus whose first
    ``t`` tokens are already laid down: pack ids shift by the DIV
    boundary, row set unchanged."""
    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    plain = {r["doc_id"]: r["pack_id"] for r in pack_sequences(docs, 512).collect()}
    shifted = {
        r["doc_id"]: r["pack_id"]
        for r in pack_sequences(docs, 512, token_base=3 * 512).collect()
    }
    assert shifted == {k: v + 3 for k, v in plain.items()}
