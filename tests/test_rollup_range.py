"""Unit tests for the two-level rollup and the bucketized range join."""

from __future__ import annotations

from pyspark.sql import functions as F

from sum_spark.operators.rangejoin import range_join
from sum_spark.operators.rollup_ts import hourly_rollup, rollup_to
from sum_spark.sources.tables import load_table


def test_rollup_serves_month_from_hourly(spark, sf_smoke):
    events = load_table(spark, sf_smoke, "events")
    hourly = hourly_rollup(events)
    monthly = rollup_to(hourly, "month")
    direct = (
        events.groupBy(F.date_trunc("month", "ts").alias("g"), "event_type")
        .agg(F.count("*").alias("c"), F.round(F.sum("value"), 2).alias("s"))
    )
    a = {(r["g"], r["event_type"]): (r["c"], round(r["s"], 2)) for r in monthly.collect()}
    b = {(r["g"], r["event_type"]): (r["c"], r["s"]) for r in direct.collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert a[k][0] == b[k][0]
        assert abs(a[k][1] - b[k][1]) < 0.02  # partial-sum rounding tolerance


def test_rollup_avg_derived_not_averaged(spark, sf_smoke):
    events = load_table(spark, sf_smoke, "events")
    daily = rollup_to(hourly_rollup(events), "day")
    direct = (
        events.groupBy(F.date_trunc("day", "ts").alias("g"), "event_type")
        .agg(F.avg("value").alias("avg_v"))
    )
    a = {(r["g"], r["event_type"]): r["avg_v"] for r in daily.collect()}
    b = {(r["g"], r["event_type"]): r["avg_v"] for r in direct.collect()}
    for k in b:
        assert abs(a[k] - b[k]) < 1e-9  # sum/count at serve time == true avg


def test_range_join_matches_theta_join(spark, sf_smoke):
    events = load_table(spark, sf_smoke, "events").select("event_id", "value")
    tiers = spark.createDataFrame(
        [("low", 0.0, 50.0), ("mid", 50.0, 150.0), ("high", 150.0, 500.0)],
        "tier string, lo double, hi double",
    )
    bucketed = range_join(events, tiers, value_col="value", step=37.0)
    theta = events.join(
        tiers, (events.value >= tiers.lo) & (events.value < tiers.hi)
    )
    assert bucketed.count() == theta.count() > 0
    a = sorted((r["event_id"], r["tier"]) for r in bucketed.collect())
    b = sorted((r["event_id"], r["tier"]) for r in theta.collect())
    assert a == b


def test_range_join_boundary_values(spark):
    facts = spark.createDataFrame(
        [(1, 0.0), (2, 49.999), (3, 50.0), (4, 100.0)], "id long, v double"
    )
    iv = spark.createDataFrame([("a", 0.0, 50.0), ("b", 50.0, 100.0)], "t string, lo double, hi double")
    got = {r["id"]: r["t"] for r in range_join(facts, iv, "v", step=10.0).collect()}
    assert got == {1: "a", 2: "a", 3: "b"}  # hi is exclusive; 100.0 matches nothing


def test_range_join_left_keeps_unmatched_facts(spark):
    facts = spark.createDataFrame([(1, 25.0), (2, 999.0)], "id long, v double")
    iv = spark.createDataFrame([("a", 0.0, 50.0)], "t string, lo double, hi double")
    got = {r["id"]: r["t"] for r in range_join(facts, iv, "v", step=10.0, how="left").collect()}
    assert got == {1: "a", 2: None}  # honest left-outer, not silent inner


def test_range_join_empty_interval_matches_nothing(spark):
    facts = spark.createDataFrame([(1, 25.0)], "id long, v double")
    iv = spark.createDataFrame(
        [("empty", 30.0, 30.0), ("backwards", 50.0, 10.0), ("ok", 20.0, 30.0)],
        "t string, lo double, hi double",
    )
    rows = range_join(facts, iv, "v", step=10.0).collect()
    assert [(r["id"], r["t"]) for r in rows] == [(1, "ok")]


def test_range_join_rejects_interval_preserving_how(spark):
    facts = spark.createDataFrame([(1, 25.0)], "id long, v double")
    iv = spark.createDataFrame([("a", 0.0, 50.0)], "t string, lo double, hi double")
    import pytest

    with pytest.raises(ValueError, match="facts-preserving"):
        range_join(facts, iv, "v", step=10.0, how="full")


def test_interval_join_overlap_exact_no_duplicates(spark):
    """interval_join == the naive overlap theta join, with each pair
    emitted exactly once even when intervals share many buckets."""
    from sum_spark.operators.rangejoin import interval_join

    a = spark.createDataFrame(
        [(1, 0.0, 10.0), (2, 5.0, 6.0), (3, 100.0, 300.0), (4, 9.9, 10.0)],
        "a_id long, lo double, hi double",
    )
    b = spark.createDataFrame(
        [(10, 9.0, 11.0), (11, 0.0, 1000.0), (12, 10.0, 20.0), (13, -5.0, 0.0)],
        "b_id long, lo double, hi double",
    )
    got = sorted(
        (r["a_id"], r["b_id"])
        for r in interval_join(a, b, step=3.0).select("a_id", "b_id").collect()
    )
    naive = sorted(
        (ra, rb)
        for ra, alo, ahi in [(r["a_id"], r["lo"], r["hi"]) for r in a.collect()]
        for rb, blo, bhi in [(r["b_id"], r["lo"], r["hi"]) for r in b.collect()]
        if alo < bhi and blo < ahi
    )
    assert got == naive
    # b_id=11 spans ~300 buckets of a_id=3's ~70 — still exactly one row
    assert got.count((3, 11)) == 1


def test_interval_join_empty_intervals_dropped(spark):
    from sum_spark.operators.rangejoin import interval_join

    a = spark.createDataFrame([(1, 5.0, 5.0)], "a_id long, lo double, hi double")
    b = spark.createDataFrame([(2, 0.0, 10.0)], "b_id long, lo double, hi double")
    assert interval_join(a, b, step=1.0).count() == 0  # [5,5) is empty
