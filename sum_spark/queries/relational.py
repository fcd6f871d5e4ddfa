"""Relational inventory Q01-Q23 + Q26 (SURVEY.md §2.F), consolidated so
every registry entry fits the driver's 50-name checked window: merged
entries keep every original operator in one tagged/multi-column result
(q02+q19 -> q02_lookup_topk, q05->q06, q08+q41, q09+q20+q21+q22 ->
q20_set_ops, q11+q17+q18+q26+q36 -> q11_event_analytics, q12+q13,
q16+q34 -> q16_window_rank).

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
    "q02_lookup_topk",
    oracle="""
    SELECT 'point' AS op, o_orderkey, o_totalprice FROM orders WHERE o_orderkey = 7
    UNION ALL
    SELECT 'topk', o_orderkey, o_totalprice FROM (
      SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 10)
    ORDER BY op, o_totalprice DESC, o_orderkey
    """,
    doc="Tagged access-path pair (consolidated q02_point_lookup + q19_topk): "
    "point lookup ≡ records.Find (/root/reference/node/wrapper/records.go:28-33, "
    "parquet min/max skipping replaces the id map) UNION ALL global top-k "
    "(Catalyst compiles ORDER BY + LIMIT to TakeOrderedAndProject — "
    "per-partition heap + driver merge, ≡ ListRecords sort "
    "(node/service/records.go:96-99) without the full sort).",
)
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    point = (
        orders.where(F.col("o_orderkey") == 7)
        .select(F.lit("point").alias("op"), "o_orderkey", "o_totalprice")
    )
    topk = (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
        .select(F.lit("topk").alias("op"), "o_orderkey", "o_totalprice")
    )
    return point.unionAll(topk).orderBy(
        "op", F.col("o_totalprice").desc(), "o_orderkey"
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
    "q06_join_multiway_agg",
    oracle="""
    SELECT n_name, r_name, ROUND(SUM(o_totalprice), 2) AS rev
    FROM orders JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY n_name, r_name ORDER BY n_name
    """,
    doc="Multi-way join + grouped agg ≡ partial/final aggregation the master "
    "hand-rolls (/root/reference/master/mux_runner.go:136-232); absorbs the "
    "former q05_join_inner's nation⋈region broadcast inner join (≡ the "
    "master's record-literal inlining, master/ast_raccoon.go:94-148). "
    "nation and region are broadcast; orders-customer is the only shuffle "
    "join.",
)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
        .orderBy("n_name")
    )


@query(
    "q07_join_left_outer",
    oracle="""
    SELECT 'full' AS op, COALESCE(c_custkey, o_custkey) AS custkey,
           COUNT(o_orderkey) AS n
    FROM (SELECT * FROM customer WHERE c_custkey <= 50) c
    FULL JOIN orders ON c_custkey = o_custkey
    GROUP BY COALESCE(c_custkey, o_custkey)
    UNION ALL
    SELECT 'left', c_custkey, COUNT(o_orderkey)
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    UNION ALL
    SELECT 'right', o_custkey, COUNT(o_orderkey)
    FROM (SELECT * FROM customer WHERE c_custkey <= 50) c
    RIGHT JOIN orders ON c_custkey = o_custkey
    GROUP BY o_custkey
    ORDER BY op, custkey
    """,
    doc="Outer-join family, tagged triple. 'left' ≡ Find-miss -> IsNull "
    "(/root/reference/node/wrapper/record.go:41-44); 'full' and 'right' "
    "complete the outer-join inventory, run against a RESTRICTED "
    "customer side (c_custkey<=50) so both null directions are "
    "non-vacuous: 'full' keeps customers without orders (n=0) AND "
    "order keys outside the restricted set (null customer side, keyed "
    "by COALESCE); 'right' keeps every order group regardless of match.",
)
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    c50 = customer.where(F.col("c_custkey") <= 50)
    left = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy(F.col("c_custkey").alias("custkey"))
        .agg(F.count("o_orderkey").alias("n"))
        .select(F.lit("left").alias("op"), "custkey", "n")
    )
    full = (
        c50.join(orders, c50.c_custkey == orders.o_custkey, "full")
        .groupBy(
            F.coalesce(F.col("c_custkey"), F.col("o_custkey")).alias("custkey")
        )
        .agg(F.count("o_orderkey").alias("n"))
        .select(F.lit("full").alias("op"), "custkey", "n")
    )
    right = (
        c50.join(orders, c50.c_custkey == orders.o_custkey, "right")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count("o_orderkey").alias("n"))
        .select(F.lit("right").alias("op"), "custkey", "n")
    )
    return full.unionAll(left).unionAll(right).orderBy("op", "custkey")


@query(
    "q08_semi_join",
    oracle="""
    SELECT 'exists' AS op, p_partkey FROM part
    WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity > 45)
    UNION ALL
    SELECT 'in', p_partkey FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 49)
    ORDER BY op, p_partkey
    """,
    doc="Tagged semi-join pair (consolidated q08_semi_join + q41_in_subquery): "
    "the EXISTS form as an explicit left-semi join, and the IN-subquery "
    "form Catalyst rewrites to the same left-semi — both legs in one "
    "checked result.",
)
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    exists_keys = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45)
    exists_leg = (
        part.join(exists_keys, part.p_partkey == exists_keys.l_partkey, "left_semi")
        .select(F.lit("exists").alias("op"), "p_partkey")
    )
    in_keys = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") > 49)
        .select(F.col("l_partkey").alias("p_partkey"))
    )
    in_leg = (
        part.join(in_keys, "p_partkey", "left_semi")
        .select(F.lit("in").alias("op"), "p_partkey")
    )
    return exists_leg.unionAll(in_leg).orderBy("op", "p_partkey")


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
    "q11_event_analytics",
    oracle="""
    SELECT user_id, event_id, ts,
           LAG(ts) OVER w AS prev_ts,
           LEAD(ts) OVER w AS next_ts,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS rs,
           CAST(json_extract_string(props, '$.k') AS INT) AS k,
           CAST(extract(year FROM ts) AS INT) AS y,
           CAST(extract(month FROM ts) AS INT) AS mo,
           CAST(extract(day FROM ts) AS INT) AS d,
           CAST(extract(hour FROM ts) AS INT) AS h,
           CAST(ts AS DATE) AS dt
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, ts, event_id LIMIT 100
    """,
    doc="Per-event analytics battery (consolidated q11_lag + q18_lead + "
    "q17_running_sum + q26_json_extract + q36_datetime_parts): LAG/LEAD "
    "as-of-style self references and the running-sum frame over one "
    "user-partitioned window, JSON/map access ≡ Meta "
    "(/root/reference/node/wrapper/record.go:62-66; get_json_object ≡ "
    "json_extract_string), and datetime part extraction — all one "
    "window-shuffle pass over events.",
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        events.select(
            "user_id",
            "event_id",
            "ts",
            F.lag("ts").over(w).alias("prev_ts"),
            F.lead("ts").over(w).alias("next_ts"),
            F.round(F.sum("value").over(wf), 2).alias("rs"),
            F.get_json_object("props", "$.k").cast("int").alias("k"),
            F.year("ts").alias("y"),
            F.month("ts").alias("mo"),
            F.dayofmonth("ts").alias("d"),
            F.hour("ts").alias("h"),
            F.col("ts").cast("date").alias("dt"),
        )
        .orderBy("user_id", "ts", "event_id")
        .limit(100)
    )


# --- Aggregations ----------------------------------------------------------


@query(
    "q12_grouped_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sq, ROUND(AVG(l_extendedprice), 2) AS ap,
           MIN(l_shipdate) AS mn, MAX(l_shipdate) AS mx, COUNT(*) AS c,
           COUNT(DISTINCT l_suppkey) AS cd
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H-Q1-shaped grouped aggregation; Spark executes partial+final "
    "HashAggregate (≡ the master's per-node partials + merge, "
    "/root/reference/master/mux_runner.go:195-232). The COUNT(DISTINCT) "
    "column (formerly q13_count_distinct) exercises Catalyst's two-stage "
    "distinct-aggregate expansion in the same group.",
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
            F.countDistinct("l_suppkey").alias("cd"),
        )
        .orderBy("l_returnflag", "l_linestatus")
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
    "q16_window_rank",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
             NTILE(4) OVER g AS nt,
             ROUND(PERCENT_RANK() OVER g, 4) AS pr,
             ROUND(CUME_DIST() OVER g, 4) AS cd
      FROM orders
      WINDOW g AS (ORDER BY o_totalprice, o_orderkey)) t
    WHERE rn <= 2 ORDER BY o_custkey, rn
    """,
    doc="Analytic-function battery (consolidated q16_rank_per_group + "
    "q34_window_misc): top-K per group via a partitioned ROW_NUMBER plus "
    "ntile / percent_rank / cume_dist over the global ordering, all "
    "computed before the rank filter. The global-ordering functions are "
    "DERIVED from a distributed global row number (two-pass monotone "
    "key buckets + broadcast offsets, sampling.assign_contiguous_ids) "
    "instead of an empty-partitionBy window: the ordering is unique, so "
    "percent_rank = (rn-1)/(n-1), cume_dist = rn/n, and ntile follows the "
    "big-buckets-first rule arithmetically — no Exchange SinglePartition "
    "over the table (guarded in tests/test_plans.py).",
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sum_spark.operators.sampling import assign_contiguous_ids

    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    # __n rides in as a LITERAL from the placement census (exact count,
    # guide §1.2): the old g.agg(count) + broadcast join re-executed the
    # whole placement subtree once more per action just to fetch N.
    g = assign_contiguous_ids(
        orders, ["o_totalprice", "o_orderkey"], id_name="__g", total_name="__n"
    )
    rn = F.col("__g")
    n = F.col("__n")
    tiles = F.lit(4)
    # NTILE(4) big-buckets-first: the first n%4 buckets hold n//4+1 rows.
    big = n % tiles  # number of large buckets
    size_big = (n / tiles).cast("long") + 1
    size_small = (n / tiles).cast("long")
    in_big = rn <= big * size_big
    # n < tiles => size_small = 0: every row lands in a big bucket, so
    # in_big is always true, but guard the otherwise-branch division
    # anyway (NULL via /0 would poison nt on tiny inputs — ADVICE r3).
    nt = F.when(in_big, F.ceil(rn / size_big)).otherwise(
        big
        + F.ceil(
            (rn - big * size_big) / F.when(size_small > 0, size_small)
        )
    )
    return (
        g.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            nt.cast("long").alias("nt"),
            # PERCENT_RANK of a 1-row partition is 0, not NULL from 0/0.
            F.coalesce(
                F.round((rn - 1).cast("double") / (n - 1).cast("double"), 4),
                F.lit(0.0),
            ).alias("pr"),
            F.round(rn.cast("double") / n.cast("double"), 4).alias("cd"),
        )
        .select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w).cast("long").alias("rn"),
            "nt",
            "pr",
            "cd",
        )
        .where(F.col("rn") <= 2)
        .orderBy("o_custkey", "rn")
    )


# --- Set operations ---------------------------------------------------------


@query(
    "q20_set_ops",
    oracle="""
    SELECT 'anti' AS op, c_custkey AS k FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    UNION ALL
    SELECT 'except', k FROM (
      SELECT c_custkey AS k FROM customer EXCEPT SELECT o_custkey FROM orders)
    UNION ALL
    SELECT 'intersect', k FROM (
      SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
    UNION ALL
    SELECT 'union_all', k FROM (
      SELECT n_nationkey AS k FROM nation
      UNION ALL SELECT r_regionkey FROM region)
    UNION ALL
    SELECT 'diff_' || CASE WHEN doc_id % 11 = 0 THEN 'added'
                           WHEN doc_id % 7 = 0 THEN 'removed'
                           ELSE 'changed' END, doc_id
    FROM documents
    WHERE (doc_id % 11 = 0 AND doc_id % 7 <> 0)      -- in new only
       OR (doc_id % 7 = 0 AND doc_id % 11 <> 0)      -- in old only
       OR (doc_id % 13 = 0 AND doc_id % 7 <> 0 AND doc_id % 11 <> 0)
    ORDER BY op, k
    """,
    doc="Tagged set-operation battery (consolidated q20_intersect + "
    "q21_except + q22_union_all + q09_anti_join): INTERSECT and EXCEPT "
    "with distinct semantics, UNION ALL ≡ defaultMerger array "
    "concatenation (/root/reference/master/mux_runner.go:220-226), and "
    "the left-anti NOT EXISTS form of EXCEPT — four operators, one "
    "checked result. The diff_* legs run operators/diff.snapshot_diff — "
    "the corpus-version diff (added/removed/changed id sets from one "
    "full-outer join on map-side content digests; unchanged ids emit "
    "nothing, so output is delta-sized) — over two synthetic document "
    "snapshots: old drops doc_id%11==0 and new drops doc_id%7==0, with "
    "text edited in old where doc_id%13==0; the oracle derives the same "
    "three sets from the membership arithmetic directly.",
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    anti = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select(F.lit("anti").alias("op"), F.col("c_custkey").alias("k"))
    )
    exc = (
        customer.select(F.col("c_custkey").alias("k"))
        .subtract(orders.select(F.col("o_custkey").alias("k")))
        .select(F.lit("except").alias("op"), "k")
    )
    f = orders.where(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    o = orders.where(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("k"))
    inter = f.intersect(o).select(F.lit("intersect").alias("op"), "k")
    nation = _t(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("k"))
    region = _t(spark, sf_dir, "region").select(F.col("r_regionkey").alias("k"))
    uni = nation.unionAll(region).select(F.lit("union_all").alias("op"), "k")

    from sum_spark.operators.diff import snapshot_diff
    from sum_spark.plans.scale import release_with

    docs = _t(spark, sf_dir, "documents")
    old = docs.where(F.col("doc_id") % 11 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")),
    )
    new = docs.where(F.col("doc_id") % 7 != 0)
    # Persist the delta-sized diff once; the three status legs are
    # separate union children with LITERAL tags (a computed
    # concat('diff_', status) tag would make the union un-prunable for
    # bench leg timing — identical union-leg subtrees are NOT merged
    # into one ReusedExchange, see CLAUDE.md).
    diff = snapshot_diff(old, new, id_col="doc_id", content_cols=("text",)).persist()
    legs = [
        diff.where(F.col("status") == st).select(
            F.lit(f"diff_{st}").alias("op"), F.col("id").alias("k")
        )
        for st in ("added", "changed", "removed")
    ]
    out = (
        anti.unionAll(exc).unionAll(inter).unionAll(uni)
        .unionAll(legs[0]).unionAll(legs[1]).unionAll(legs[2])
        .orderBy("op", "k")
    )
    return release_with(out, diff)


# --- Scalar functions -------------------------------------------------------


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


# q26_json_extract was consolidated into q11_event_analytics (the JSON/map
# access column k ≡ Meta, /root/reference/node/wrapper/record.go:62-66).
