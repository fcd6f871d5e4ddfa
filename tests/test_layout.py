"""Z-order layout properties: the Morton key round-trips (interleave is
a bijection), ranks are layout-invariant, and — the point of the
operator — zorder_layout's partitions are tight rectangles in BOTH
dimensions, where a single-column sort is tight in one only."""

from __future__ import annotations

from pyspark.sql import functions as F

from sum_spark.operators.layout import zorder_key, zorder_layout, zorder_rank
from sum_spark.sources.tables import load_table


def test_zorder_key_is_bijective_interleave(spark):
    """Every (x, y) in [0,16)^2 maps to a distinct key in [0, 256), and
    the low bits alternate x/y as Morton order requires."""
    grid = spark.range(256).select(
        (F.col("id") % 16).alias("x"), (F.col("id") / 16).cast("long").alias("y")
    )
    keyed = grid.select("x", "y", zorder_key([F.col("x"), F.col("y")], bits=4).alias("z"))
    rows = keyed.collect()
    zs = {r["z"] for r in rows}
    assert len(zs) == 256 and min(zs) == 0 and max(zs) == 255
    by_xy = {(r["x"], r["y"]): r["z"] for r in rows}
    assert by_xy[(1, 0)] == 1  # bit 0 of dim 0 -> key bit 0
    assert by_xy[(0, 1)] == 2  # bit 0 of dim 1 -> key bit 1
    assert by_xy[(2, 0)] == 4  # bit 1 of dim 0 -> key bit 2
    assert by_xy[(3, 3)] == 15


def test_zorder_rank_layout_invariant(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    a = zorder_rank(docs, ["n_chars", "doc_id"], id_col="doc_id").collect()
    b = zorder_rank(
        docs.repartition(17, "doc_id"), ["n_chars", "doc_id"], id_col="doc_id"
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    n = docs.count()
    assert sorted(r["zpos"] for r in a) == list(range(1, n + 1))


def _avg_extents(df, xcol, ycol):
    """Per-partition bounding-box extents, averaged — the proxy for
    min/max file-skipping effectiveness on each filter dimension."""
    boxes = (
        df.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .agg(
            (F.max(xcol) - F.min(xcol)).alias("dx"),
            (F.max(ycol) - F.min(ycol)).alias("dy"),
        )
        .collect()
    )
    n = len(boxes)
    return sum(r["dx"] for r in boxes) / n, sum(r["dy"] for r in boxes) / n, n


def test_zorder_layout_localizes_both_dimensions(spark, sf_smoke):
    """The claim z-order buys: every partition is a bounded rectangle
    in BOTH dimensions, so min/max stats prune scans filtering on
    either. A single-dim sort localizes its own column but leaves the
    OTHER dimension's extent near-full — no skipping for those filters.
    (Total-bbox-volume comparisons are not used: they reward whichever
    layout hugs the lower-cardinality dim, which is not the property.)"""
    ev = load_table(spark, sf_smoke, "events").select(
        "event_id",
        "user_id",
        (F.unix_timestamp(F.col("ts").cast("timestamp")) / 60)
        .cast("long")
        .alias("minute"),
    )
    [b] = ev.agg(
        (F.max("user_id") - F.min("user_id")).alias("rx"),
        (F.max("minute") - F.min("minute")).alias("ry"),
    ).collect()
    rx, ry = b["rx"], b["ry"]
    n_parts = 16

    z = zorder_layout(ev, ["user_id", "minute"], n_partitions=n_parts)
    zdx, zdy, zn = _avg_extents(z, "user_id", "minute")
    assert zn > 1
    assert zdx <= 0.6 * rx and zdy <= 0.6 * ry, (zdx, rx, zdy, ry)

    by_user = ev.repartitionByRange(n_parts, "user_id").sortWithinPartitions("user_id")
    _, sdy, _ = _avg_extents(by_user, "user_id", "minute")
    assert sdy >= 0.9 * ry  # time filters skip nothing

    by_time = ev.repartitionByRange(n_parts, "minute").sortWithinPartitions("minute")
    sdx, _, _ = _avg_extents(by_time, "user_id", "minute")
    assert sdx >= 0.9 * rx  # user filters skip nothing


def test_zorder_layout_keeps_all_rows_and_key_is_sorted(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    z = zorder_layout(docs, ["n_chars", "doc_id"], n_partitions=8)
    assert z.count() == docs.count()
    # range partitioning by the key: per-partition [min,max] key spans
    # must not overlap across partitions
    spans = (
        z.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .agg(F.min("__z").alias("lo"), F.max("__z").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    for prev, cur in zip(spans, spans[1:]):
        assert prev["hi"] <= cur["lo"]


def test_zorder_key_three_dims(spark):
    """The interleave generalizes to N dims: bit b of dim i lands at
    position b*3 + i, and the 3-dim key stays bijective on a cube."""
    grid = spark.range(8 * 8 * 8).select(
        (F.col("id") % 8).alias("x"),
        ((F.col("id") / 8).cast("long") % 8).alias("y"),
        (F.col("id") / 64).cast("long").alias("z"),
    )
    keyed = grid.select(
        "x", "y", "z",
        zorder_key([F.col("x"), F.col("y"), F.col("z")], bits=3).alias("k"),
    )
    rows = keyed.collect()
    ks = {r["k"] for r in rows}
    assert len(ks) == 512 and min(ks) == 0 and max(ks) == 511
    by = {(r["x"], r["y"], r["z"]): r["k"] for r in rows}
    assert by[(1, 0, 0)] == 1 and by[(0, 1, 0)] == 2 and by[(0, 0, 1)] == 4
    assert by[(2, 0, 0)] == 8  # bit 1 of dim 0 -> key bit 3
