"""Training-shard export: the last mile of the data pipeline — turn the
shuffled, packed corpus into numbered shard files a training job streams
in order, with an integrity manifest and partition-pruned resume reads.

No reference analog (the reference serves records over gRPC,
node/service/service.go; it has no bulk export). The contract a trainer
needs, expressed Spark-first:

- DETERMINISTIC placement: shard = order // rows_per_shard where order is
  the pipeline's serialization rank (global_shuffle / prepare_training_
  data's shuffle_pos) — a pure map-side function, so the same corpus +
  seed always produces byte-identical shard membership on any cluster.
- ONE shuffle: repartition by shard, sortWithinPartitions by order; at
  100 TB this is the unavoidable placement exchange and nothing else.
- An integrity MANIFEST (one row per shard: row count, order range,
  order-sensitive md5 digest) computed by READING BACK the files the
  write produced — the digest attests to the bytes on disk, not to a
  second evaluation of the input lineage (which could silently diverge
  under upstream nondeterminism or a source mutated between jobs).
- RESUME reads that touch only the requested shards via partition
  pruning (shard is the parquet partition column — the scan's
  PartitionFilters, not a post-read filter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _digest(order_col: str, cols: list[str]):
    """Order-sensitive per-shard digest: md5 over the in-order
    concatenation of per-row md5s. Portable (md5 both engines) and
    layout-independent: rows are sorted by the order rank inside an
    array, never by partition order. Bounded by rows_per_shard — the
    shard is sized to stream through a trainer, so its row-hash array
    fits an aggregation buffer by construction."""
    row_h = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols]))
    return F.md5(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col(order_col).alias("o"), row_h.alias("h")))
                ),
                lambda s: s["h"],
            ),
            "",
        )
    )


def _shard_manifest(data: DataFrame, order_col: str) -> DataFrame:
    """(shard, n_rows, min_order, max_order, digest) — one aggregate over
    a shard-partitioned frame; every non-shard column joins the digest.
    Shared by the write (read-back attestation) and verify paths so the
    two can only ever disagree when the files themselves changed."""
    cols = [c for c in data.columns if c != "shard"]
    return data.groupBy("shard").agg(
        F.count("*").alias("n_rows"),
        F.min(order_col).alias("min_order"),
        F.max(order_col).alias("max_order"),
        _digest(order_col, cols).alias("digest"),
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    order_col: str = "shuffle_pos",
    rows_per_shard: int = 100_000,
    fmt: str = "parquet",
    base: int | None = None,
) -> DataFrame:
    """Write ``df`` as ``shard=N`` partitions of ``fmt`` files and return
    the manifest DataFrame (shard, n_rows, min_order, max_order, digest),
    also persisted at ``<path>/_manifest`` (parquet, 1 file).

    ``order_col`` must be the dense serialization rank (0- or 1-based) —
    the output of global_shuffle / assign_contiguous_ids; placement is
    ``(order - base) DIV rows_per_shard`` (integer division — exact at
    any rank, where a double round-trip would drift past 2^53) so shard
    boundaries are stable under appends of higher ranks and every shard
    except the last holds exactly rows_per_shard rows. Pass ``base`` (the
    rank's origin, 0 or 1) when you know it — leaving it None computes
    min(order), an extra single-column pass the parquet min/max
    statistics make cheap but a 100 TB export shouldn't pay twice.

    The manifest is computed FROM THE WRITTEN FILES (read back, same
    grouping as verify_shards): the digest attests to the shards on disk.
    The read-back costs one scan of the export — the price of an
    attestation that doesn't trust a re-evaluation of the input lineage
    (nondeterministic upstreams, sources mutated between jobs).
    For json, readback uses the input's schema so types (hence digests)
    are exact, not inference-widened.
    """
    if fmt not in ("parquet", "json"):
        raise ValueError(f"unsupported shard format {fmt!r}")
    if base is None:
        base = df.select(F.min(F.col(order_col)).alias("__b")).collect()[0]["__b"]
        if base is None:
            raise ValueError("write_training_shards: empty input")
    sharded = df.withColumn(
        "shard",
        F.expr(f"CAST((`{order_col}` - {int(base)}) DIV {int(rows_per_shard)} AS LONG)"),
    )
    (
        sharded.repartition("shard")
        .sortWithinPartitions("shard", order_col)
        .write.partitionBy("shard")
        .mode("overwrite")
        .format(fmt)
        .save(path)
    )
    spark = df.sparkSession
    reader = spark.read.format(fmt)
    if fmt == "json":
        reader = reader.schema(sharded.schema)
    written = reader.load(path)
    manifest = _shard_manifest(written, order_col).orderBy("shard")
    manifest.coalesce(1).write.mode("overwrite").parquet(path + "/_manifest")
    return spark.read.parquet(path + "/_manifest").orderBy("shard")


def read_training_shards(
    spark: SparkSession,
    path: str,
    shards: list[int] | None = None,
    from_shard: int | None = None,
    fmt: str = "parquet",
    schema=None,
) -> DataFrame:
    """Read back shard partitions; ``shards``/``from_shard`` restrict the
    scan to the named shards VIA PARTITION PRUNING (the filter is on the
    partition column, so unrequested shards' files are never opened —
    the resume path of a 100 TB export costs only the remaining data).
    For json shards pass ``schema`` (inference is an extra pass and can
    widen types, which would also desync verify_shards' digests)."""
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.load(path)
    if shards is not None:
        df = df.where(F.col("shard").isin([int(s) for s in shards]))
    if from_shard is not None:
        df = df.where(F.col("shard") >= int(from_shard))
    return df


def verify_shards(
    spark: SparkSession,
    path: str,
    order_col: str = "shuffle_pos",
    fmt: str = "parquet",
    schema=None,
) -> DataFrame:
    """Recompute the manifest from the shard files and diff it against
    the stored one. Returns the discrepancy rows (empty = intact) for
    any shard whose row count or digest drifted — the check a training
    job runs before trusting a resumed export. For json shards pass the
    write-time ``schema`` so readback types (hence digests) are exact."""
    stored = spark.read.parquet(path + "/_manifest")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    data = reader.load(path)
    actual = _shard_manifest(data, order_col)
    s = stored.select(
        "shard",
        F.col("n_rows").alias("e_rows"),
        F.col("digest").alias("e_digest"),
    )
    a = actual.select(
        "shard",
        F.col("n_rows").alias("a_rows"),
        F.col("digest").alias("a_digest"),
    )
    j = s.join(a, "shard", "full_outer")
    return (
        j.where(
            (F.col("e_rows").isNull())
            | (F.col("a_rows").isNull())
            | (F.col("e_rows") != F.col("a_rows"))
            | (F.col("e_digest") != F.col("a_digest"))
        )
        .select(
            "shard",
            F.col("e_rows"),
            F.col("a_rows"),
            F.col("e_digest"),
            F.col("a_digest"),
        )
        .orderBy("shard")
    )
