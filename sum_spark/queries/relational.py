"""Relational inventory Q01-Q23 + Q26 (SURVEY.md §2.F).

Reference analogs are cited per query; everything here is plain
DataFrame-API Spark so Catalyst gets full freedom (pushdown, pruning,
join selection). Determinism contract: total ORDER BY, ROUND(money, 2),
aliases identical between the Spark plan and the DuckDB oracle.

Type alignment with DuckDB (the driver compares schemas):
counts/row_number/length are cast to BIGINT on the Spark side because
DuckDB returns BIGINT where Spark's builtins return INT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sum_spark.queries.base import query
from sum_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- Sources / scans -------------------------------------------------------


@query(
    "q01_filter_project",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey
    """,
    doc="Scan+projection+filter ≡ records.All + Meta filter "
    "(/root/reference/node/wrapper/records.go:35-43). Both the filter and "
    "the 2-column projection push into the parquet scan.",
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "q02_point_lookup",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_orderkey = 7 ORDER BY o_orderkey
    """,
    doc="Point lookup ≡ records.Find (/root/reference/node/wrapper/records.go:28-33); "
    "parquet min/max skipping replaces the id map.",
)
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") == 7)
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


@query(
    "q03_pagination",
    oracle="""
    SELECT l_orderkey, l_linenumber FROM lineitem
    ORDER BY l_orderkey, l_linenumber LIMIT 20 OFFSET 40
    """,
    doc="Ordered pagination ≡ ListRecords (/root/reference/node/service/records.go:66-114, "
    "sort at 96-99).",
)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
        .offset(40)
        .limit(20)
    )


# --- Predicates ------------------------------------------------------------


@query(
    "q04_predicates",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE p_size BETWEEN 10 AND 20 AND p_brand LIKE 'Brand%' AND p_retailprice > 900
    ORDER BY p_partkey
    """,
    doc="AND/BETWEEN/LIKE/> predicate stack; all push down to the parquet scan.",
)
def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return (
        p.where(
            F.col("p_size").between(10, 20)
            & F.col("p_brand").like("Brand%")
            & (F.col("p_retailprice") > 900)
        )
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    )


# --- Joins -----------------------------------------------------------------


@query(
    "q05_join_inner",
    oracle="""
    SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey
    ORDER BY n_name
    """,
    doc="Inner equi join; region is broadcast (≡ the master's record-literal "
    "inlining, /root/reference/master/ast_raccoon.go:94-148).",
)
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("n_name", "r_name")
        .orderBy("n_name")
    )


@query(
    "q06_join_multiway_agg",
    oracle="""
    SELECT n_name, ROUND(SUM(o_totalprice), 2) AS rev
    FROM orders JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name
    """,
    doc="Multi-way join + grouped agg ≡ partial/final aggregation the master "
    "hand-rolls (/root/reference/master/mux_runner.go:136-232). nation is "
    "broadcast; orders-customer is the only shuffle join.",
)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
        .orderBy("n_name")
    )


@query(
    "q07_join_left_outer",
    oracle="""
    SELECT c_custkey, COUNT(o_orderkey) AS n
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey ORDER BY c_custkey
    """,
    doc="Left outer join ≡ Find-miss -> IsNull (/root/reference/node/wrapper/record.go:41-44).",
)
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n"))
        .orderBy("c_custkey")
    )


@query(
    "q08_semi_join",
    oracle="""
    SELECT p_partkey FROM part
    WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity > 45)
    ORDER BY p_partkey
    """,
    doc="Left-semi join (EXISTS).",
)
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    lineitem = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45)
    return (
        part.join(lineitem, part.p_partkey == lineitem.l_partkey, "left_semi")
        .select("p_partkey")
        .orderBy("p_partkey")
    )


@query(
    "q09_anti_join",
    oracle="""
    SELECT c_custkey FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
    doc="Left-anti join (NOT EXISTS).",
)
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


@query(
    "q10_theta_join",
    oracle="""
    SELECT s.s_suppkey, c.c_custkey
    FROM supplier s JOIN customer c ON c.c_acctbal > s.s_acctbal * 2
    WHERE s.s_suppkey <= 3
    ORDER BY s.s_suppkey, c.c_custkey
    """,
    doc="Theta/range join -> broadcast nested loop on the 3-row filtered side.",
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = _t(spark, sf_dir, "supplier").where(F.col("s_suppkey") <= 3)
    customer = _t(spark, sf_dir, "customer")
    return (
        customer.join(F.broadcast(supplier), customer.c_acctbal > supplier.s_acctbal * 2)
        .select("s_suppkey", "c_custkey")
        .orderBy("s_suppkey", "c_custkey")
    )


@query(
    "q11_lag",
    oracle="""
    SELECT user_id, ts, LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events ORDER BY user_id, ts, event_id LIMIT 50
    """,
    doc="As-of-style self join via LAG window (SURVEY Q11).",
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.select("user_id", "ts", "event_id", F.lag("ts").over(w).alias("prev_ts"))
        .orderBy("user_id", "ts", "event_id")
        .limit(50)
        .select("user_id", "ts", "prev_ts")
    )


# --- Aggregations ----------------------------------------------------------


@query(
    "q12_grouped_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sq, ROUND(AVG(l_extendedprice), 2) AS ap,
           MIN(l_shipdate) AS mn, MAX(l_shipdate) AS mx, COUNT(*) AS c
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H-Q1-shaped grouped aggregation; Spark executes partial+final "
    "HashAggregate (≡ the master's per-node partials + merge, "
    "/root/reference/master/mux_runner.go:195-232).",
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sq"),
            F.round(F.avg("l_extendedprice"), 2).alias("ap"),
            F.min("l_shipdate").alias("mn"),
            F.max("l_shipdate").alias("mx"),
            F.count("*").alias("c"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q13_count_distinct",
    oracle="""
    SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS cd
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="COUNT(DISTINCT) — Catalyst expands to a two-stage aggregate.",
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("cd"))
        .orderBy("o_orderpriority")
    )


@query(
    "q14_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, ROUND(SUM(l_extendedprice), 2) AS s
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc="ROLLUP hierarchy totals.",
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("s"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first()
        )
    )


@query(
    "q15_grouping_sets",
    oracle="""
    SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d, COUNT(*) AS c
    FROM events
    GROUP BY GROUPING SETS ((event_type), (CAST(date_trunc('day', ts) AS DATE)), ())
    ORDER BY event_type NULLS FIRST, d NULLS FIRST
    """,
    doc="GROUPING SETS — expressed in Spark SQL (same Catalyst plan as the "
    "DataFrame cube/rollup family).",
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "events").createOrReplaceTempView("sumspark_q15_events")
    return spark.sql(
        """
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d, COUNT(*) AS c
        FROM sumspark_q15_events
        GROUP BY GROUPING SETS ((event_type), (CAST(date_trunc('day', ts) AS DATE)), ())
        ORDER BY event_type NULLS FIRST, d NULLS FIRST
        """
    )


# --- Window functions ------------------------------------------------------


@query(
    "q16_rank_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 2 ORDER BY o_custkey, rn
    """,
    doc="Top-K per group via row_number window.",
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_custkey", "o_orderkey", F.row_number().over(w).cast("long").alias("rn")
        )
        .where(F.col("rn") <= 2)
        .orderBy("o_custkey", "rn")
    )


@query(
    "q17_running_sum",
    oracle="""
    SELECT user_id, event_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS rs
    FROM events ORDER BY user_id, event_id LIMIT 100
    """,
    doc="Running-sum analytic frame.",
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        _t(spark, sf_dir, "events")
        .select("user_id", "event_id", F.round(F.sum("value").over(w), 2).alias("rs"))
        .orderBy("user_id", "event_id")
        .limit(100)
    )


@query(
    "q18_lead",
    oracle="""
    SELECT user_id, ts, LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
    FROM events ORDER BY user_id, ts, event_id LIMIT 50
    """,
    doc="LEAD — symmetric to Q11's LAG.",
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.select("user_id", "ts", "event_id", F.lead("ts").over(w).alias("next_ts"))
        .orderBy("user_id", "ts", "event_id")
        .limit(50)
        .select("user_id", "ts", "next_ts")
    )


# --- Sorts / limits / top-k -------------------------------------------------


@query(
    "q19_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    doc="Global top-k: Catalyst compiles ORDER BY + LIMIT to TakeOrderedAndProject "
    "(per-partition heap + driver merge — no global sort), ≡ ListRecords "
    "sort (/root/reference/node/service/records.go:96-99) without the full sort.",
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


# --- Set operations ---------------------------------------------------------


@query(
    "q20_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    ORDER BY o_custkey
    """,
    doc="INTERSECT (distinct semantics in both engines).",
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    f = orders.where(F.col("o_orderstatus") == "F").select("o_custkey")
    o = orders.where(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersect(o).orderBy("o_custkey")


@query(
    "q21_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey FROM orders
    ORDER BY c_custkey
    """,
    doc="EXCEPT (distinct).",
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return customer.subtract(orders).orderBy("c_custkey")


@query(
    "q22_union_all",
    oracle="""
    SELECT n_nationkey AS k FROM nation
    UNION ALL
    SELECT r_regionkey FROM region
    ORDER BY k
    """,
    doc="UNION ALL ≡ defaultMerger array concatenation "
    "(/root/reference/master/mux_runner.go:220-226).",
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("k"))
    region = _t(spark, sf_dir, "region").select(F.col("r_regionkey").alias("k"))
    return nation.unionAll(region).orderBy("k")


# --- Scalar functions -------------------------------------------------------


@query(
    "q23a_string_math",
    oracle="""
    SELECT UPPER(SUBSTR(p_name, 1, 5)) AS u, CAST(LENGTH(p_type) AS BIGINT) AS l,
           ROUND(SQRT(p_retailprice), 2) AS r
    FROM part ORDER BY p_partkey LIMIT 20
    """,
    doc="String/math scalar functions (reference has no scalar library beyond "
    "the vector kernels; Spark builtins cover this).",
)
def q23a(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "part")
        .orderBy("p_partkey")
        .limit(20)
        .select(
            F.upper(F.substring("p_name", 1, 5)).alias("u"),
            F.length("p_type").cast("long").alias("l"),
            F.round(F.sqrt("p_retailprice"), 2).alias("r"),
        )
    )


@query(
    "q23b_month_agg",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m, COUNT(*) AS c
    FROM orders GROUP BY m ORDER BY m
    """,
    doc="Date truncation + grouped count.",
)
def q23b(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", "o_orderdate").cast("date").alias("m"))
        .agg(F.count("*").alias("c"))
        .orderBy("m")
    )


@query(
    "q26_json_extract",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
    FROM events ORDER BY event_id LIMIT 50
    """,
    doc="JSON/map access ≡ Meta (/root/reference/node/wrapper/record.go:62-66); "
    "Spark get_json_object ≡ DuckDB json_extract_string.",
)
def q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .orderBy("event_id")
        .limit(50)
        .select(
            "event_id", F.get_json_object("props", "$.k").cast("int").alias("k")
        )
    )
