"""Streaming CMS: stream-accumulated grid == batch-built grid over the
same rows (CMS linearity through the idempotent batch-id sink), across
MULTIPLE micro-batches."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from sum_spark.functions.text import tokens
from sum_spark.operators.sketch import (
    count_min_build,
    count_min_estimate,
    count_min_merge,
)
from sum_spark.sources.tables import load_table


def test_stream_cms_equals_batch_cms(spark, sf_smoke, tmp_path):
    from sum_spark.streaming.sketch import read_count_min, streaming_count_min

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    tok = docs.select(F.explode(tokens("text")).alias("w"))

    # Two separate drop files + maxFilesPerTrigger=1 -> >= 2 micro-batches.
    drop_dir = str(tmp_path / "drops")
    docs.where(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(drop_dir)
    docs.where(F.col("doc_id") % 2 != 0).coalesce(1).write.mode("append").parquet(
        drop_dir
    )
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop_dir)
        .select(F.explode(tokens("text")).alias("w"))
    )
    out_dir = str(tmp_path / "cms")
    q = streaming_count_min(
        stream, "w", path=out_dir, checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination()

    # More than one batch grid was written (the accumulation is real).
    import glob

    assert len(glob.glob(out_dir + "/batch_id=*")) >= 2

    accumulated = read_count_min(spark, out_dir)
    batch = count_min_build(tok, "w")
    assert sorted(map(tuple, accumulated.collect())) == sorted(
        map(tuple, batch.collect())
    )
    # And estimates from the accumulated grid behave: never under-count.
    truth = tok.groupBy("w").agg(F.count("*").cast("long").alias("tf"))
    est = count_min_estimate(accumulated, truth, "w")
    assert est.where(F.col("est") < F.col("tf")).count() == 0


def test_count_min_merge_is_linear(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    tok = docs.select(F.explode(tokens("text")).alias("w"))
    a = tok.where(F.col("w") < "m")
    b = tok.where(F.col("w") >= "m")
    merged = count_min_merge(
        count_min_build(a, "w"), count_min_build(b, "w")
    )
    full = count_min_build(tok, "w")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))


def test_stream_kmv_equals_batch_kmv(spark, sf_smoke, tmp_path):
    from sum_spark.operators.sketch import kmv_estimate, kmv_sketch
    from sum_spark.streaming.sketch import read_kmv, streaming_kmv

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    drop_dir = str(tmp_path / "drops")
    docs.where(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(drop_dir)
    docs.where(F.col("doc_id") % 2 != 0).coalesce(1).write.mode("append").parquet(
        drop_dir
    )
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop_dir)
        .select(F.col("doc_id").alias("x"))
    )
    out_dir = str(tmp_path / "kmv")
    q = streaming_kmv(stream, "x", path=out_dir, checkpoint=str(tmp_path / "ck2"))
    q.awaitTermination()

    acc = read_kmv(spark, out_dir)
    full = kmv_sketch(docs.select(F.col("doc_id").alias("x")), "x")
    assert [r["h"] for r in acc.collect()] == [r["h"] for r in full.collect()]
    [ea] = kmv_estimate(acc).collect()
    [ef] = kmv_estimate(full).collect()
    assert tuple(ea) == tuple(ef)


def test_stream_histogram_equals_batch_histogram(spark, sf_smoke, tmp_path):
    """Stream-accumulated histogram == batch-built histogram over the
    same rows (BIGINT cells, so equality is exact), across >= 2
    micro-batches."""
    from pyspark.sql.types import DoubleType

    from sum_spark.operators.sketch import histogram_fixed
    from sum_spark.streaming.sketch import read_histogram, streaming_histogram

    ev = load_table(spark, sf_smoke, "events").select("event_id", "value")
    drop_dir = str(tmp_path / "drops")
    ev.where(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(drop_dir)
    ev.where(F.col("event_id") % 2 != 0).coalesce(1).write.mode("append").parquet(
        drop_dir
    )
    schema = StructType(
        [StructField("event_id", LongType()), StructField("value", DoubleType())]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop_dir)
    )
    out = str(tmp_path / "hist")
    q = streaming_histogram(
        stream, "value", path=out, checkpoint=str(tmp_path / "ckpt"), width=50.0
    )
    q.awaitTermination()

    import glob

    assert len(glob.glob(out + "/batch_id=*")) >= 2
    accumulated = sorted(tuple(r) for r in read_histogram(spark, out).collect())
    batch = sorted(
        tuple(r) for r in histogram_fixed(ev, "value", width=50.0).collect()
    )
    assert accumulated == batch


def _drop_two_batches(spark, sf_smoke, tmp_path, name):
    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    drop_dir = str(tmp_path / f"drops_{name}")
    docs.where(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(drop_dir)
    docs.where(F.col("doc_id") % 2 != 0).coalesce(1).write.mode("append").parquet(
        drop_dir
    )
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop_dir)
        .select(F.explode(tokens("text")).alias("w"))
    )


def test_compact_batches_preserves_sketch_and_survives_crash(
    spark, sf_smoke, tmp_path
):
    """Compaction folds every batch grid into one directory without
    changing the accumulated sketch, and a crash between delete and
    rename is recovered by re-running."""
    import glob
    import os
    import shutil

    from sum_spark.streaming.compact import compact_batches
    from sum_spark.streaming.sketch import read_count_min, streaming_count_min

    out = str(tmp_path / "cms_c")
    q = streaming_count_min(
        _drop_two_batches(spark, sf_smoke, tmp_path, "c"),
        "w",
        path=out,
        checkpoint=str(tmp_path / "ckpt_c"),
    )
    q.awaitTermination()
    assert len(glob.glob(out + "/batch_id=*")) >= 2
    before = sorted(map(tuple, read_count_min(spark, out).collect()))

    max_id = compact_batches(spark, out, merged=read_count_min(spark, out))
    dirs = glob.glob(out + "/batch_id=*")
    assert [os.path.basename(d) for d in dirs] == [f"batch_id={max_id}"]
    assert sorted(map(tuple, read_count_min(spark, out).collect())) == before
    # Idempotent on an already-compacted path.
    assert compact_batches(spark, out) == max_id

    # Crash window: merged data durable under _compacted, old dirs gone,
    # rename never happened — re-running finishes the job.
    tmp = out + "/_compacted"
    shutil.copytree(out + f"/batch_id={max_id}", tmp)
    with open(tmp + "/_SUCCESS", "w") as fh:
        fh.write(str(max_id + 7))
    shutil.rmtree(out + f"/batch_id={max_id}")
    recovered = compact_batches(spark, out)
    assert recovered == max_id + 7
    assert sorted(map(tuple, read_count_min(spark, out).collect())) == before


def test_stream_vocab_equals_batch_vocab(spark, sf_smoke, tmp_path):
    """Stream-accumulated (w, tf, df) == one batch aggregate over the
    same docs — tf by linearity, df by batch-disjointness of documents."""
    from sum_spark.streaming.sketch import read_vocab, streaming_vocab

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    drop_dir = str(tmp_path / "drops_v")
    docs.where(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(drop_dir)
    docs.where(F.col("doc_id") % 2 != 0).coalesce(1).write.mode("append").parquet(
        drop_dir
    )
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop_dir)
    )
    out = str(tmp_path / "vocab")
    q = streaming_vocab(stream, path=out, checkpoint=str(tmp_path / "ckpt_v"))
    q.awaitTermination()

    import glob

    assert len(glob.glob(out + "/batch_id=*")) >= 2
    accumulated = sorted(map(tuple, read_vocab(spark, out).collect()))
    batch = sorted(
        map(
            tuple,
            docs.select("doc_id", F.explode(tokens("text")).alias("w"))
            .groupBy("w")
            .agg(
                F.count("*").cast("long").alias("tf"),
                F.countDistinct("doc_id").cast("long").alias("df"),
            )
            .collect(),
        )
    )
    assert accumulated == batch
    top = read_vocab(spark, out, top_k=10).collect()
    assert len(top) == 10 and top[0]["tf"] == max(r[1] for r in batch)


def test_stream_vocab_grouped_and_collapsed(spark, sf_smoke, tmp_path):
    """Grouped streaming vocabulary: per-source partials match the batch
    per-source aggregate, and reading WITHOUT the group collapses them
    into the corpus vocabulary (doc-atomicity disjointness)."""
    from sum_spark.streaming.sketch import read_vocab, streaming_vocab

    docs = load_table(spark, sf_smoke, "documents").select(
        "doc_id", "source", "text"
    )
    drop_dir = str(tmp_path / "drops_gv")
    docs.where(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(drop_dir)
    docs.where(F.col("doc_id") % 2 != 0).coalesce(1).write.mode("append").parquet(
        drop_dir
    )
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop_dir)
    )
    out = str(tmp_path / "gvocab")
    q = streaming_vocab(
        stream,
        path=out,
        checkpoint=str(tmp_path / "ckpt_gv"),
        group_cols=["source"],
    )
    q.awaitTermination()

    tok = docs.select("doc_id", "source", F.explode(tokens("text")).alias("w"))
    batch_grouped = sorted(
        map(
            tuple,
            tok.groupBy("source", "w")
            .agg(
                F.count("*").cast("long").alias("tf"),
                F.countDistinct("doc_id").cast("long").alias("df"),
            )
            .collect(),
        )
    )
    got_grouped = sorted(
        map(tuple, read_vocab(spark, out, group_cols=["source"]).collect())
    )
    assert got_grouped == batch_grouped

    batch_corpus = sorted(
        map(
            tuple,
            tok.groupBy("w")
            .agg(
                F.count("*").cast("long").alias("tf"),
                F.countDistinct("doc_id").cast("long").alias("df"),
            )
            .collect(),
        )
    )
    assert sorted(map(tuple, read_vocab(spark, out).collect())) == batch_corpus

    topg = read_vocab(spark, out, top_k=3, group_cols=["source"])
    counts = {r["source"]: 0 for r in topg.collect()}
    for r in topg.collect():
        counts[r["source"]] += 1
    assert counts and all(v == 3 for v in counts.values())


def test_stream_hll_equals_batch_hll(spark, sf_smoke, tmp_path):
    """Stream-accumulated HLL registers == batch-built registers over
    the same rows (integer MAX cells — exact equality), across >= 2
    micro-batches; estimates therefore agree too."""
    from sum_spark.operators.sketch import hll_estimate, hll_sketch
    from sum_spark.streaming.sketch import read_hll, streaming_hll

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    drop_dir = str(tmp_path / "hll_drops")
    docs.where(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(drop_dir)
    docs.where(F.col("doc_id") % 2 != 0).coalesce(1).write.mode("append").parquet(
        drop_dir
    )
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop_dir)
        .select(F.col("doc_id").alias("x"))
    )
    out_dir = str(tmp_path / "hll")
    q = streaming_hll(stream, "x", path=out_dir, checkpoint=str(tmp_path / "ckh"))
    q.awaitTermination()

    acc = read_hll(spark, out_dir)
    full = hll_sketch(docs.select(F.col("doc_id").alias("x")), "x")
    key = lambda df: sorted((r["idx"], r["rho"]) for r in df.collect())
    assert key(acc) == key(full)
    [ea] = hll_estimate(acc).collect()
    [ef] = hll_estimate(full).collect()
    assert ea["est"] == ef["est"]


def test_stream_weighted_sample_equals_batch_draw(spark, sf_smoke, tmp_path):
    """Stream-accumulated weighted sample == sample_weighted_k over all
    ingested rows (priority mergeability), across >= 2 micro-batches."""
    from sum_spark.operators.sampling import sample_weighted_k
    from sum_spark.streaming.sketch import (
        read_weighted_sample,
        streaming_weighted_sample,
    )

    docs = (
        load_table(spark, sf_smoke, "documents")
        .select("doc_id", "source", (F.lit(1) + F.col("n_chars") % 5).alias("weight"))
    )
    drop_dir = str(tmp_path / "wk_drops")
    docs.where(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(drop_dir)
    docs.where(F.col("doc_id") % 2 != 0).coalesce(1).write.mode("append").parquet(
        drop_dir
    )
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("source", StringType()),
            StructField("weight", LongType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop_dir)
    )
    out_dir = str(tmp_path / "wk")
    q = streaming_weighted_sample(
        stream, k=9, path=out_dir, checkpoint=str(tmp_path / "ckw")
    )
    q.awaitTermination()

    acc = read_weighted_sample(spark, out_dir, k=9).collect()
    full = sample_weighted_k(docs, 9).collect()
    assert sorted(map(tuple, acc)) == sorted(map(tuple, full))


def test_stream_hll_grouped_equals_batch(spark, sf_smoke, tmp_path):
    from sum_spark.operators.sketch import hll_sketch
    from sum_spark.streaming.sketch import read_hll, streaming_hll

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "source")
    drop_dir = str(tmp_path / "hg_drops")
    docs.where(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(drop_dir)
    docs.where(F.col("doc_id") % 2 != 0).coalesce(1).write.mode("append").parquet(
        drop_dir
    )
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("source", StringType())]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop_dir)
        .select(F.col("doc_id").alias("x"), "source")
    )
    out_dir = str(tmp_path / "hg")
    q = streaming_hll(
        stream, "x", path=out_dir, checkpoint=str(tmp_path / "ckg"),
        group_cols=("source",),
    )
    q.awaitTermination()
    acc = read_hll(spark, out_dir, group_cols=("source",))
    full = hll_sketch(docs.select(F.col("doc_id").alias("x"), "source"), "x", ("source",))
    key = lambda df: sorted((r["source"], r["idx"], r["rho"]) for r in df.collect())
    assert key(acc) == key(full)


def test_stream_histogram_grouped_equals_batch(spark, sf_smoke, tmp_path):
    from pyspark.sql.types import DoubleType

    from sum_spark.operators.sketch import histogram_fixed
    from sum_spark.streaming.sketch import read_histogram, streaming_histogram

    ev = load_table(spark, sf_smoke, "events").select("event_id", "event_type", "value")
    drop_dir = str(tmp_path / "gh_drops")
    ev.where(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(drop_dir)
    ev.where(F.col("event_id") % 2 != 0).coalesce(1).write.mode("append").parquet(
        drop_dir
    )
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop_dir)
    )
    out_dir = str(tmp_path / "gh")
    q = streaming_histogram(
        stream, "value", path=out_dir, checkpoint=str(tmp_path / "ckgh"),
        width=50.0, group_cols=("event_type",),
    )
    q.awaitTermination()
    acc = read_histogram(spark, out_dir, group_cols=("event_type",))
    full = histogram_fixed(ev, "value", width=50.0, group_cols=("event_type",))
    key = lambda df: sorted(map(tuple, df.select("event_type", "bucket", "n", "s_fixed").collect()))
    assert key(acc) == key(full)


def test_stream_mg_keeps_guarantee_over_batches(spark, sf_smoke, tmp_path):
    """Stream-accumulated Misra-Gries: the merged summary over >= 2
    micro-batches keeps the mergeable-summaries guarantee against exact
    counts of the full ingested corpus (counter values legitimately
    differ from a one-shot batch build — the GUARANTEE is the parity
    claim, exactly as for the batch operator)."""
    from sum_spark.streaming.sketch import read_mg, streaming_mg

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    drop_dir = str(tmp_path / "drops_mg")
    docs.where(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(drop_dir)
    docs.where(F.col("doc_id") % 2 != 0).coalesce(1).write.mode("append").parquet(
        drop_dir
    )
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop_dir)
        .select(F.explode(tokens("text")).alias("w"))
    )
    out = str(tmp_path / "mg")
    k = 16
    q = streaming_mg(stream, "w", path=out, checkpoint=str(tmp_path / "ckpt_mg"), k=k)
    q.awaitTermination()

    import glob

    assert len(glob.glob(out + "/batch_id=*")) >= 2

    got = {r["item"]: r["est"] for r in read_mg(spark, out, k=k).collect()}
    tok = docs.select(F.explode(tokens("text")).alias("w"))
    exact = {
        r["w"]: r["n"]
        for r in tok.groupBy("w").agg(F.count("*").alias("n")).collect()
    }
    n = sum(exact.values())
    bound = n // (k + 1)
    assert len(got) <= k
    for w, true in exact.items():
        e = got.get(w, 0)
        assert e <= true
        assert true - e <= bound
        if true > bound:
            assert w in got


def test_stream_cms_grouped_equals_batch_and_collapses(spark, sf_smoke, tmp_path):
    """Grouped streaming CMS == grouped batch build per group, and an
    UNGROUPED read over the grouped writer's files equals the global
    grid (CMS linearity across groups)."""
    from sum_spark.streaming.sketch import read_count_min, streaming_count_min

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "source", "text")
    drop_dir = str(tmp_path / "gcms_drops")
    docs.where(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(drop_dir)
    docs.where(F.col("doc_id") % 2 != 0).coalesce(1).write.mode("append").parquet(
        drop_dir
    )
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("source", StringType()),
            StructField("text", StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop_dir)
        .select("source", F.explode(tokens("text")).alias("w"))
    )
    out_dir = str(tmp_path / "gcms")
    q = streaming_count_min(
        stream, "w", path=out_dir, checkpoint=str(tmp_path / "ckgcms"),
        group_cols=("source",),
    )
    q.awaitTermination()

    tok = docs.select("source", F.explode(tokens("text")).alias("w"))
    acc = read_count_min(spark, out_dir, group_cols=("source",))
    full = count_min_build(tok, "w", group_cols=("source",))
    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(acc) == key(full)
    # collapsed read == the global ungrouped grid
    acc_flat = read_count_min(spark, out_dir)
    full_flat = count_min_build(tok, "w")
    assert key(acc_flat) == key(full_flat)


def test_stream_kmv_grouped_equals_batch(spark, sf_smoke, tmp_path):
    from sum_spark.operators.sketch import kmv_estimate, kmv_sketch
    from sum_spark.streaming.sketch import read_kmv, streaming_kmv

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "source")
    drop_dir = str(tmp_path / "gkmv_drops")
    docs.where(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(drop_dir)
    docs.where(F.col("doc_id") % 2 != 0).coalesce(1).write.mode("append").parquet(
        drop_dir
    )
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("source", StringType())]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop_dir)
        .select(F.col("doc_id").alias("x"), "source")
    )
    out_dir = str(tmp_path / "gkmv")
    q = streaming_kmv(
        stream, "x", path=out_dir, checkpoint=str(tmp_path / "ckgkmv"),
        k=16, group_cols=("source",),
    )
    q.awaitTermination()

    acc = read_kmv(spark, out_dir, k=16, group_cols=("source",))
    full = kmv_sketch(
        docs.select(F.col("doc_id").alias("x"), "source"), "x", k=16,
        group_cols=("source",),
    )
    key = lambda df: sorted(map(tuple, df.select("source", "h").collect()))
    assert key(acc) == key(full)
    # grouped estimates carry one row per group with sane counts
    est = {
        r["source"]: r["est"]
        for r in kmv_estimate(acc, k=16, group_cols=("source",)).collect()
    }
    exact = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(
            F.countDistinct("doc_id").alias("n")
        ).collect()
    }
    assert set(est) == set(exact)
    for s, n in exact.items():
        if n < 16:
            assert est[s] == n  # below k the sketch is exact
        else:
            assert est[s] > 0


def test_stream_weighted_sample_per_stratum_equals_batch(spark, sf_smoke, tmp_path):
    from sum_spark.operators.sampling import sample_weighted_k
    from sum_spark.streaming.sketch import (
        read_weighted_sample,
        streaming_weighted_sample,
    )

    docs = load_table(spark, sf_smoke, "documents").select(
        "doc_id", "source", (1 + F.col("doc_id") % 5).alias("weight")
    )
    drop_dir = str(tmp_path / "gws_drops")
    docs.where(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(drop_dir)
    docs.where(F.col("doc_id") % 2 != 0).coalesce(1).write.mode("append").parquet(
        drop_dir
    )
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("source", StringType()),
            StructField("weight", LongType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop_dir)
    )
    out_dir = str(tmp_path / "gws")
    q = streaming_weighted_sample(
        stream, k=5, path=out_dir, checkpoint=str(tmp_path / "ckgws"),
        weight_col="weight", strat_col="source", per_stratum=True,
    )
    q.awaitTermination()

    acc = read_weighted_sample(spark, out_dir, k=5, per_stratum=True)
    full = sample_weighted_k(
        docs, k=5, weight_col="weight", strat_col="source", per_stratum=True
    )
    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(acc) == key(full) and acc.count() > 0


def test_stream_log_digest_equals_batch_and_answers_quantiles(
    spark, sf_smoke, tmp_path
):
    from pyspark.sql.types import DoubleType

    from sum_spark.operators.sketch import log_histogram, log_histogram_quantile
    from sum_spark.streaming.sketch import (
        read_log_histogram,
        read_log_histogram_quantiles,
        streaming_log_histogram,
    )

    ev = load_table(spark, sf_smoke, "events").select(
        "event_id", "event_type", "value"
    )
    drop_dir = str(tmp_path / "ld_drops")
    ev.where(F.col("event_id") % 3 == 0).coalesce(1).write.parquet(drop_dir)
    ev.where(F.col("event_id") % 3 == 1).coalesce(1).write.mode("append").parquet(
        drop_dir
    )
    ev.where(F.col("event_id") % 3 == 2).coalesce(1).write.mode("append").parquet(
        drop_dir
    )
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop_dir)
    )
    out_dir = str(tmp_path / "ld")
    q = streaming_log_histogram(
        stream, "value", path=out_dir, checkpoint=str(tmp_path / "ckld"),
        group_cols=("event_type",),
    )
    q.awaitTermination()

    key = lambda df: sorted(map(tuple, df.collect()))
    acc_g = read_log_histogram(spark, out_dir, group_cols=("event_type",))
    full_g = log_histogram(ev, "value", group_cols=["event_type"])
    assert key(acc_g) == key(full_g)
    # collapsed read == global digest, and it answers quantiles
    acc = read_log_histogram(spark, out_dir)
    full = log_histogram(ev, "value")
    assert key(acc) == key(full)
    qi = key(log_histogram_quantile(acc, [(1, 2), (9, 10)]))
    assert qi == key(log_histogram_quantile(full, [(1, 2), (9, 10)])) and qi
    # the PER-GROUP quantile READ (the batch q31 'ldigg' serving shape,
    # VERDICT r6 #6): interval answers straight from the accumulated
    # stream cells == the batch grouped digest's answers, every group
    ps = [(1, 2), (9, 10), (99, 100)]
    qg_stream = key(
        read_log_histogram_quantiles(
            spark, out_dir, ps, group_cols=("event_type",)
        )
    )
    qg_batch = key(log_histogram_quantile(full_g, ps, group_cols=["event_type"]))
    assert qg_stream == qg_batch and len(qg_stream) >= len(ps)
