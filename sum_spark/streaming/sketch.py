"""Streaming count-min sketch — corpus-wide approximate frequencies
maintained at ingest, in fixed space.

CMS is LINEAR (operators/sketch.count_min_merge): the grid of a union
is the cell-wise sum of the grids. So the streaming form needs no
streaming state at all — each micro-batch builds its own
depth x width grid (a few KB) and writes it under an idempotent
batch-id directory (the engine's standard redelivery-safe sink layout);
the sketch of everything ingested so far is the cell-sum over the batch
directories, computed at READ time over <= batches * depth * width tiny
rows. A redelivered batch overwrites its own grid instead of
double-counting — exactly the idempotence argument of
streaming/joins.make_parquet_batch_sink, inherited by construction.

This is the fixed-space answer to "what are the hot tokens/domains in
the stream so far" — the streaming twin of q31's 'cms' leg, sharing the
same portable-hash build (stream-accumulated == batch-built,
parity-tested).

Every sink here takes ``auto_compact_after``: once that many batch
directories accumulate, the sink folds the COMMITTED prefix into one
before writing the arriving batch (streaming/compact.maybe_auto_compact
— VERDICT r8 #3), so the read-side merge stays O(1) directories on a
months-long stream. Folding unions the partial rows verbatim and every
family's reader RE-APPLIES its merge law at read (cell sums, register
max, priority top-k, MG counter-merge), so accumulated == batch-built
parity is untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sum_spark.operators.sketch import count_min_build
from sum_spark.streaming.compact import maybe_auto_compact


def streaming_count_min(
    stream_df: DataFrame,
    item_col: str,
    path: str,
    checkpoint: str,
    width: int = 256,
    depth: int = 4,
    group_cols: tuple[str, ...] = (),
    trigger: dict | None = None,
    auto_compact_after: int | None = None,
):
    """Accumulate a CMS over a stream: one grid parquet per micro-batch
    under ``path/batch_id=N``. Batch ids are checkpoint-scoped (path and
    checkpoint live and die together). ``group_cols`` keeps one grid per
    group (pass the same to ``read_count_min``) — the streaming_hll
    grouped-read shape."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        maybe_auto_compact(
            batch_df.sparkSession, path, checkpoint, auto_compact_after
        )
        grid = count_min_build(
            batch_df, item_col, width=width, depth=depth, group_cols=group_cols
        )
        grid.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")

    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def read_count_min(
    spark: SparkSession, path: str, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """The accumulated sketch: cell-wise sum of every batch grid —
    identical to the grid a single batch build over all ingested rows
    would produce (CMS linearity; parity-tested). Pass the writer's
    ``group_cols`` to keep the per-group grids; omitting them for a
    grouped writer ALSO works (grouped cells sum into the global grid —
    linearity again)."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(path)
        .groupBy(*group_cols, "depth", "bucket")
        .agg(F.sum("c").alias("c"))
    )


def streaming_kmv(
    stream_df: DataFrame,
    item_col: str,
    path: str,
    checkpoint: str,
    k: int = 32,
    seed: str = "kmv",
    group_cols: tuple[str, ...] = (),
    trigger: dict | None = None,
    auto_compact_after: int | None = None,
):
    """Accumulate a KMV distinct sketch over a stream — the same
    per-batch/merge-at-read shape as streaming_count_min, resting on
    KMV's mergeability instead of CMS linearity: each micro-batch writes
    its own <= k smallest-hash rows under ``path/batch_id=N`` and the
    sketch so far is the k smallest DISTINCT values across the batch
    files (operators/sketch.kmv_merge semantics at read time over
    <= batches * k rows). A value arriving in several batches
    deduplicates in the read-side distinct; a redelivered batch
    overwrites its own file. The answer to "how many distinct
    users/domains/tokens so far" in k rows of state — per group with
    ``group_cols`` (per-domain distinct-so-far; <= k rows per group per
    batch)."""
    from sum_spark.operators.sketch import kmv_sketch

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        maybe_auto_compact(
            batch_df.sparkSession, path, checkpoint, auto_compact_after
        )
        sk = kmv_sketch(batch_df, item_col, k=k, seed=seed, group_cols=group_cols)
        sk.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")

    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def read_kmv(
    spark: SparkSession, path: str, k: int = 32, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """The accumulated KMV sketch: k smallest distinct hashes across
    every batch sketch (== the sketch of all ingested rows). Pass the
    writer's ``group_cols`` for the per-group sketches — the read is
    the _kmv_topk shape (WindowGroupLimit per group) over
    <= batches x groups x k stored rows."""
    from sum_spark.operators.sketch import _kmv_topk

    return _kmv_topk(
        spark.read.parquet(path).select(*group_cols, "h"), k, group_cols
    )


def streaming_histogram(
    stream_df: DataFrame,
    value_col: str,
    path: str,
    checkpoint: str,
    width: float,
    lo: float = 0.0,
    scale: int = 100,
    group_cols: tuple[str, ...] = (),
    trigger: dict | None = None,
    auto_compact_after: int | None = None,
):
    """Maintain a fixed-bucket value histogram over a stream — the third
    member of the per-batch/merge-at-read sketch family, resting on
    histogram mergeability (operators/sketch.histogram_merge): each
    micro-batch writes its own range-bounded (bucket, n, s_fixed) cells
    under ``path/batch_id=N`` and the distribution of everything
    ingested so far is the cell-wise sum at read time. All-BIGINT cells,
    so stream-accumulated == batch-built exactly (parity-tested), unlike
    an engine-private quantile sketch. The answer to "what does the
    value/length/score distribution look like so far" in
    range-bounded space."""
    from sum_spark.operators.sketch import histogram_fixed

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        maybe_auto_compact(
            batch_df.sparkSession, path, checkpoint, auto_compact_after
        )
        h = histogram_fixed(
            batch_df, value_col, width=width, lo=lo, scale=scale,
            group_cols=group_cols,
        )
        h.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")

    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def read_histogram(
    spark: SparkSession, path: str, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """The accumulated histogram: cell-wise sum of every batch's cells —
    identical to one batch build over all ingested rows; pass the same
    ``group_cols`` as the writer for per-domain distributions-so-far
    (histogram_drift_by_group consumes these directly)."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(path)
        .groupBy(*group_cols, "bucket")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("s_fixed").cast("long").alias("s_fixed"),
        )
    )


def streaming_vocab(
    stream_docs: DataFrame,
    path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_cols: list[str] | None = None,
    trigger: dict | None = None,
    auto_compact_after: int | None = None,
):
    """Maintain corpus vocabulary counts over a document stream: each
    micro-batch writes its own per-token (w, tf, df) partial under
    ``path/batch_id=N`` and the corpus-so-far vocabulary is a cell-wise
    sum at read time (``read_vocab``) — the streaming twin of q31's
    'vocab' heavy-hitters leg.

    tf is trivially mergeable; df merges because a DOCUMENT is atomic to
    one micro-batch (foreachBatch hands over whole rows), so per-batch
    distinct-doc counts for a token count disjoint doc sets — the same
    disjointness argument that lets the per-source vocabulary aggregate
    reaggregate into the corpus one. Partial size is batch-vocabulary
    rows, not batch tokens; redelivery overwrites its own directory.
    ``group_cols`` keeps the partials per group (the per-SOURCE
    vocabulary at ingest, q31's 'dvocab' view) — grouped partials
    reaggregate into the corpus vocabulary at read exactly like the
    batch operator's."""
    from sum_spark.functions.text import tokens

    groups = list(group_cols or [])

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        maybe_auto_compact(
            batch_df.sparkSession, path, checkpoint, auto_compact_after
        )
        from pyspark.sql import functions as F

        vc = (
            batch_df.select(
                *groups,
                F.col(id_col).alias("__id"),
                F.explode(tokens(text_col)).alias("w"),
            )
            .groupBy(*groups, "w")
            .agg(
                F.count("*").cast("long").alias("tf"),
                F.countDistinct("__id").cast("long").alias("df"),
            )
        )
        vc.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")

    return (
        stream_docs.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def read_vocab(
    spark: SparkSession,
    path: str,
    top_k: int | None = None,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """The accumulated vocabulary: cell-wise (tf, df) sums across batch
    partials — identical to one batch aggregate over all ingested docs.
    Pass the writer's ``group_cols`` to keep the per-group view, or omit
    them to collapse grouped partials into the corpus vocabulary (the
    doc-atomicity disjointness makes df collapse correctly). Ungrouped
    ``top_k`` keeps the k most frequent ((tf desc, w) tie-break) via
    TakeOrdered, never a global sort; grouped top-k goes through
    sampling.top_k_per_group (WindowGroupLimit)."""
    from pyspark.sql import functions as F

    groups = list(group_cols or [])
    out = (
        spark.read.parquet(path)
        .groupBy(*groups, "w")
        .agg(F.sum("tf").cast("long").alias("tf"), F.sum("df").cast("long").alias("df"))
    )
    if top_k is not None:
        if groups:
            from sum_spark.operators.sampling import top_k_per_group

            out = top_k_per_group(
                out, groups, [F.col("tf").desc(), F.col("w")], int(top_k)
            )
        else:
            out = out.orderBy(F.col("tf").desc(), F.col("w")).limit(int(top_k))
    return out


def streaming_hll(
    stream_df: DataFrame,
    item_col: str,
    path: str,
    checkpoint: str,
    seed: str = "hll",
    group_cols: tuple[str, ...] = (),
    trigger: dict | None = None,
    auto_compact_after: int | None = None,
):
    """Accumulate HyperLogLog registers over a stream — per-batch/
    merge-at-read like streaming_kmv, resting on the register MAX merge
    law (operators/sketch.hll_merge): each micro-batch writes its own
    <= 4096 (idx, rho) rows under ``path/batch_id=N``; the registers so
    far are the per-idx MAX across batch files. A redelivered batch
    overwrites its own file, so redelivery cannot inflate rho (MAX is
    idempotent anyway — HLL merge tolerates duplication by nature).
    Cardinality-so-far in at most 4096 rows of state, with the
    cross-engine-reproducible register property of the batch sketch."""
    from sum_spark.operators.sketch import hll_sketch

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        maybe_auto_compact(
            batch_df.sparkSession, path, checkpoint, auto_compact_after
        )
        sk = hll_sketch(batch_df, item_col, group_cols, seed=seed)
        sk.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")

    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def read_hll(
    spark: SparkSession, path: str, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """The accumulated registers: per-(group, idx) MAX across every
    batch sketch (== the registers of one batch build over all
    ingested rows); pass the same ``group_cols`` as the writer for
    per-domain cardinalities-so-far."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(path)
        .groupBy(*group_cols, "idx")
        .agg(F.max("rho").alias("rho"))
    )


def streaming_weighted_sample(
    stream_df: DataFrame,
    k: int,
    path: str,
    checkpoint: str,
    weight_col: str = "weight",
    id_col: str = "doc_id",
    strat_col: str = "source",
    seed: str = "wk",
    max_weight: int = 64,
    per_stratum: bool = False,
    trigger: dict | None = None,
    auto_compact_after: int | None = None,
):
    """Maintain a weighted random sample (without replacement) over a
    stream — the streaming form of sampling.sample_weighted_k, resting
    on priority mergeability: each micro-batch writes its own k
    smallest (doc_id, stratum, __pri) rows under ``path/batch_id=N``;
    the sample so far is the k smallest priorities across batch files
    (a row's priority is a deterministic hash MIN, so a redelivered or
    duplicated row carries the SAME priority and collapses in the
    read-side distinct). This is a weighted reservoir in k rows of
    state per batch, with exact batch parity: stream-accumulated ==
    one batch draw over all ingested rows.

    ``per_stratum=True`` maintains k rows PER STRATUM (the per-domain
    weighted reservoir): each batch keeps its local per-stratum top-k
    (rank filter -> WindowGroupLimit) and the read side re-ranks across
    batches — parity with sample_weighted_k(per_stratum=True) holds by
    the same argument, per stratum."""
    from sum_spark.operators.sampling import weighted_priorities

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        maybe_auto_compact(
            batch_df.sparkSession, path, checkpoint, auto_compact_after
        )
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        pri = weighted_priorities(
            batch_df, weight_col, id_col, strat_col, seed, max_weight
        )
        if per_stratum:
            w = Window.partitionBy("stratum").orderBy("__pri", "doc_id")
            top = (
                pri.withColumn("__rk", F.row_number().over(w))
                .where(F.col("__rk") <= k)
                .drop("__rk")
            )
        else:
            top = pri.orderBy("__pri", "doc_id").limit(k)
        top.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")

    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def read_weighted_sample(
    spark: SparkSession, path: str, k: int, per_stratum: bool = False
) -> DataFrame:
    """The accumulated draw: k smallest distinct priorities across every
    batch's top-k (== sample_weighted_k over all ingested rows, because
    any globally-top-k priority is top-k within its own batch — and per
    stratum with ``per_stratum``, matching the writer's setting).
    Output: (doc_id, stratum, pick), pick ranked within the whole draw
    or within each stratum respectively."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = spark.read.parquet(path).select("doc_id", "stratum", "__pri").distinct()
    if per_stratum:
        w = Window.partitionBy("stratum").orderBy("__pri", "doc_id")
        return (
            rows.withColumn("pick", F.row_number().over(w).cast("long"))
            .where(F.col("pick") <= k)
            .select("doc_id", "stratum", "pick")
            .orderBy("doc_id")
        )
    top = rows.orderBy("__pri", "doc_id").limit(k)
    return top.select(
        "doc_id",
        "stratum",
        F.row_number()
        .over(Window.orderBy("__pri", "doc_id"))
        .cast("long")
        .alias("pick"),
    ).orderBy("doc_id")


def streaming_mg(
    stream_df: DataFrame,
    item_col: str,
    path: str,
    checkpoint: str,
    k: int = 64,
    weight_col: str | None = None,
    trigger: dict | None = None,
    auto_compact_after: int | None = None,
):
    """Accumulate a Misra-Gries heavy-hitter summary over a stream —
    per-batch partial / merge-at-read like streaming_hll: each
    micro-batch folds to its own <= k (item, est) summary under
    ``path/batch_id=N`` (operators/sketch.mg_summary — bounded state no
    matter the batch size), and the summary-so-far is the counter-sum +
    capacity prune across batch files (``read_mg`` ==
    operators/sketch.mg_merge). Mergeable summaries keep the sequential
    guarantee — any item's undercount stays <= n/(k+1) of the TOTAL
    ingested weight n — so heavy items can never disappear as the
    stream grows. Redelivery overwrites the batch's own directory."""
    from sum_spark.operators.sketch import mg_summary

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        maybe_auto_compact(
            batch_df.sparkSession, path, checkpoint, auto_compact_after
        )
        sk = mg_summary(batch_df, item_col, k=k, weight_col=weight_col)
        sk.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")

    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def read_mg(spark: SparkSession, path: str, k: int = 64) -> DataFrame:
    """The accumulated heavy-hitter summary: sum matching counters
    across batch partials, then one capacity prune — exactly
    operators/sketch.mg_merge over the batch summaries."""
    from pyspark.sql import functions as F

    from sum_spark.operators.sketch import _mg_prune

    merged = (
        spark.read.parquet(path)
        .groupBy("item")
        .agg(F.sum("est").cast("long").alias("est"))
    )
    return _mg_prune(merged, k)


def streaming_log_histogram(
    stream_df: DataFrame,
    value_col: str,
    path: str,
    checkpoint: str,
    bits: int = 7,
    scale: int = 100,
    group_cols: tuple[str, ...] = (),
    trigger: dict | None = None,
    auto_compact_after: int | None = None,
):
    """Maintain the UNKNOWN-RANGE log digest over a stream — the
    per-batch/merge-at-read shape of operators/sketch.log_histogram:
    each micro-batch writes its own (group..., bucket, n) cells (space
    bounded by the TYPE, not the data — no range parameter to get wrong
    before the data arrives, which is exactly the streaming case) under
    ``path/batch_id=N``; the digest of everything ingested so far is
    the cell-wise sum at read time, and log_histogram_quantile answers
    rank-bracketing quantile intervals from it without revisiting any
    data. stream-accumulated == batch-built exactly (integer cells,
    parity-tested)."""
    from sum_spark.operators.sketch import log_histogram

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        maybe_auto_compact(
            batch_df.sparkSession, path, checkpoint, auto_compact_after
        )
        cells = log_histogram(
            batch_df, value_col, bits=bits, scale=scale,
            group_cols=list(group_cols),
        )
        cells.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")

    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def read_log_histogram(
    spark: SparkSession, path: str, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """The accumulated log digest: cell-wise sum over batch files — ==
    one batch build over all ingested rows; omitting a grouped writer's
    ``group_cols`` collapses to the global digest (cells sum)."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(path)
        .groupBy(*group_cols, "bucket")
        .agg(F.sum("n").cast("long").alias("n"))
    )


def read_log_histogram_quantiles(
    spark: SparkSession,
    path: str,
    ps: list[tuple[int, int]],
    group_cols: tuple[str, ...] = (),
    bits: int = 7,
) -> DataFrame:
    """Quantile-interval ANSWERS from the accumulated stream digest —
    the serving read the batch q31 'ldigg' leg runs, now available on
    the stream-grown cells (VERDICT r6 #6): per group (or globally with
    ``group_cols=()``), each p gets its digest rank and the bracketing
    [lo_fp, hi_fp] interval (relative width <= 2^-bits), computed from
    kilobyte cell frames without revisiting any ingested row. Because
    the accumulated cells equal a batch build exactly (integer
    cell-wise sums), these answers equal operators/sketch.
    log_histogram_quantile over a one-shot batch digest of everything
    ingested — property-tested across multi-batch ingests."""
    from sum_spark.operators.sketch import log_histogram_quantile

    cells = read_log_histogram(spark, path, group_cols)
    return log_histogram_quantile(cells, ps, bits=bits, group_cols=list(group_cols))
