"""Streaming ingestion dedup: near-dup detection of a document stream
against the stored corpus, at ingest time — the online form of
``operators.dedup.dedup_incremental``.

The 100 TB deployment shape: corpus MinHash signatures are computed once
at ingest and stored (``operators.dedup.minhash_signatures`` written to
parquet); the arriving document stream computes its own signatures as a
pure projection (shingle -> hash -> Arrow-vectorized minhash — all
streaming-safe, no state), explodes LSH band keys, and stream-static
joins the corpus band table. Only band-bucket matches are verified with
exact shingle-hash Jaccard, so per-micro-batch cost is O(batch +
matching buckets) — the corpus is never rescanned and never shuffled
(the static side builds once per query).

State: the only stateful operator is the final pair dropDuplicates
(a true near-dup pair matches in several bands). Its state is the set
of EMITTED pairs — proportional to detected near-dups, not to the
stream — and can be bounded with a processing-time TTL via
``spark.sql.streaming.statefulOperator.stateTtl`` equivalents or by
keying the sink idempotently instead.

Reference analog: none (the reference is an online server but has no
stream processor); this is the engine's Structured Streaming extension
per SURVEY.md §2.F.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from sum_spark.operators.dedup import (
    _bands_from_sig,
    band_struct_array,
    minhash_signatures,
)

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ]
)


def read_document_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of (doc_id, text) parquet drops — the local
    stand-in for the Kafka/queue ingest topic with the same schema."""
    return spark.readStream.schema(DOC_SCHEMA).parquet(path)


def streaming_near_dups(
    doc_stream: DataFrame,
    corpus_sig: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    state_ttl: str | None = None,
) -> DataFrame:
    """Near-dups of a streaming document batch against a STATIC corpus
    signature table (``minhash_signatures`` output, typically read back
    from its stored parquet).

    Returns a streaming DataFrame of (new_id, corpus_id, jaccard) —
    exactly ``dedup_incremental``'s surface, so the batch and streaming
    paths are interchangeable downstream.

    ``state_ttl`` (e.g. ``"1 hour"``) bounds the pair-dedup state with a
    processing-time watermark (dropDuplicatesWithinWatermark): a pair
    re-emitted only after the TTL can appear twice, which an idempotent
    sink absorbs — the standard trade for bounded state on an unbounded
    stream. With None (default) the state is the exact emitted-pair set
    (proportional to detected near-dups, not stream volume).
    """
    t = float(threshold)
    sig_n = minhash_signatures(doc_stream, text_col, id_col)
    # Keep the stream's shingle hashes alongside its band keys in ONE
    # projection: the verify join must read them from THIS side, and a
    # join back to sig_n would be stream-stream.
    bands_n = sig_n.select(
        F.col("doc_id").alias("new_id"),
        F.col("hh").alias("__sa"),
        F.explode(band_struct_array()).alias("bk"),
    ).select("new_id", "__sa", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    # Same single-projection shape on the static side: the stream-static
    # join re-evaluates the static subplan per micro-batch, so a
    # bands-join-signatures self-join would scan the signature table
    # twice per batch.
    bands_c = corpus_sig.select(
        F.col("doc_id").alias("corpus_id"),
        F.col("hh").alias("__sb"),
        F.explode(band_struct_array()).alias("bk"),
    ).select("corpus_id", "__sb", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    j = (
        F.size(F.array_intersect("__sa", "__sb")).cast("double")
        / F.size(F.array_union("__sa", "__sb")).cast("double")
    )
    pairs = (
        bands_n.join(bands_c, ["band", "key"])
        .select("new_id", "corpus_id", j.alias("__j"))
        .where(F.col("__j") >= t)
        .select("new_id", "corpus_id", F.round("__j", 4).alias("jaccard"))
    )
    if state_ttl is None:
        return pairs.dropDuplicates(["new_id", "corpus_id"])
    return (
        pairs.withColumn("__seen", F.current_timestamp())
        .withWatermark("__seen", state_ttl)
        .dropDuplicatesWithinWatermark(["new_id", "corpus_id"])
        .drop("__seen")
    )
