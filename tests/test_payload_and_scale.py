"""Payload (gzip contract), server info, and scale-utility tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sum_spark.payload import GZIP_THRESHOLD, build_payload, info
from sum_spark.plans.scale import bucketize_table, salted_join
from sum_spark.registry import QueryRegistry
from sum_spark.sources.tables import load_table


# -- payload contract (service.go:21-23, 106-124) ---------------------------


def test_small_payload_uncompressed():
    p = build_payload({"1": 0.99})
    assert not p.compressed
    assert p.decode() == {"1": 0.99}


def test_large_payload_gzipped():
    big = {str(i): i * 0.5 for i in range(1000)}
    p = build_payload(big)
    assert p.compressed
    assert len(p.data) < GZIP_THRESHOLD * 4  # actually compressed
    assert p.decode() == big


def test_threshold_is_exclusive():
    # exactly-threshold payloads stay uncompressed (len > threshold rule)
    filler = "x" * (GZIP_THRESHOLD - 2)
    p = build_payload(filler)
    assert len(p.data) == GZIP_THRESHOLD  # '"' + filler + '"'
    assert not p.compressed


def test_info(spark, sf_smoke):
    reg = QueryRegistry()
    reg.create(lambda: 1, name="one")
    emb = load_table(spark, sf_smoke, "embeddings")
    out = info(spark, records_df=emb, registry=reg)
    assert out["records"] > 0 and out["oracles"] == 1
    assert out["backend"] in ("catalyst", "numpy")


# -- scale utilities ---------------------------------------------------------


def test_salted_join_matches_plain_join(spark, sf_smoke):
    orders = load_table(spark, sf_smoke, "orders").select("o_custkey", "o_totalprice")
    customer = load_table(spark, sf_smoke, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = orders.join(customer, "o_custkey").count()
    salted = salted_join(orders, customer, "o_custkey", salt=4).count()
    assert salted == plain


def test_bucketized_join_has_no_shuffle(spark, sf_smoke):
    orders = load_table(spark, sf_smoke, "orders").select("o_custkey", "o_totalprice")
    customer = load_table(spark, sf_smoke, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    # Disable auto-broadcast so the test observes the bucketed (shuffle-free
    # sort-merge) path rather than a broadcast join.
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bucketize_table(orders, "t_orders_b", "o_custkey", buckets=8)
        bucketize_table(customer, "t_customer_b", "o_custkey", buckets=8)
        joined = spark.table("t_orders_b").join(spark.table("t_customer_b"), "o_custkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # bucket-to-bucket join: no Exchange on either side
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == orders.join(customer, "o_custkey").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_customer_b")
