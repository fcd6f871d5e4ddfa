"""Measure the q31 ldigq/ldigg counting-pass variants in isolation
(VERDICT r12 #4). Three shapes, noop-sink, labeled jobs, interleaved
rounds so host drift hits all variants equally:

  v0  current: two independent pruned scans (value) / (event_type,value)
  v1  shared fx persist: ONE pruned (event_type, __fx) projection
      persisted, both count passes read the cache
  v2  exploded merge: one scan, rows exploded to (own key, sentinel),
      one broadcast bounds join + one grouped aggregate, tiny persisted
      result read by both branches

Usage: python tools_r13/q31_ldig_variants.py [rounds]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sum_spark.session import get_spark
from sum_spark.sources.tables import load_table
from sum_spark.operators.sketch import (
    log_histogram,
    log_histogram_merge,
    log_histogram_quantile,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PS = [(1, 2), (9, 10), (99, 100)]
ALL = "\x00all"


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("q31_variants")
    sc = spark.sparkContext
    ev = load_table(spark, SF, "events")
    ldig_g = log_histogram(ev, "value", group_cols=["event_type"]).persist()
    ldig_g.count()
    ldig_cells = log_histogram_merge(ldig_g.drop("event_type"))
    qb = log_histogram_quantile(ldig_cells, PS).withColumnRenamed("rank", "__r")
    qbg = log_histogram_quantile(
        ldig_g, PS, group_cols=["event_type"]
    ).withColumnRenamed("rank", "__r")
    qcols = ["p_num", "p_den", "__r", "lo_fp", "hi_fp"]
    below = F.expr(
        "CASE WHEN lo_fp IS NULL THEN 0 ELSE CAST(__fx < lo_fp AS BIGINT) END"
    )
    upto = F.expr("CAST(__fx <= hi_fp AS BIGINT)")

    def fx_cols():
        return ev.where(F.col("value").isNotNull()).selectExpr(
            "event_type", "CAST(ROUND(value * 100) AS BIGINT) AS __fx"
        )

    def both_union(counts, counts_g):
        a = counts.select(
            F.lit(None).cast("string").alias("g"),
            *qcols,
            F.col("__below"),
            F.col("__upto"),
        )
        b = counts_g.select(
            F.col("event_type").alias("g"), *qcols, "__below", "__upto"
        )
        return a.unionByName(b)

    def v0():
        fxw = fx_cols().drop("event_type")
        counts = (
            fxw.crossJoin(F.broadcast(qb))
            .groupBy(*qcols)
            .agg(F.sum(below).alias("__below"), F.sum(upto).alias("__upto"))
        )
        fxg = fx_cols()
        counts_g = (
            fxg.join(F.broadcast(qbg), "event_type")
            .groupBy("event_type", *qcols)
            .agg(F.sum(below).alias("__below"), F.sum(upto).alias("__upto"))
        )
        noop(both_union(counts, counts_g))
        return None

    def v1():
        fxg = fx_cols().persist()
        counts = (
            fxg.drop("event_type")
            .crossJoin(F.broadcast(qb))
            .groupBy(*qcols)
            .agg(F.sum(below).alias("__below"), F.sum(upto).alias("__upto"))
        )
        counts_g = (
            fxg.join(F.broadcast(qbg), "event_type")
            .groupBy("event_type", *qcols)
            .agg(F.sum(below).alias("__below"), F.sum(upto).alias("__upto"))
        )
        noop(both_union(counts, counts_g))
        fxg.unpersist()

    def v2():
        bounds = qbg.select(F.col("event_type").alias("__k"), *qcols).unionByName(
            qb.select(F.lit(ALL).alias("__k"), *qcols)
        )
        fx2 = ev.where(F.col("value").isNotNull()).select(
            F.explode(F.array(F.col("event_type"), F.lit(ALL))).alias("__k"),
            F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("__fx"),
        )
        counts_all = (
            fx2.join(F.broadcast(bounds), "__k")
            .groupBy("__k", *qcols)
            .agg(F.sum(below).alias("__below"), F.sum(upto).alias("__upto"))
            .persist()
        )
        a = counts_all.where(F.col("__k") == ALL).select(
            F.lit(None).cast("string").alias("g"), *qcols, "__below", "__upto"
        )
        b = counts_all.where(F.col("__k") != ALL).select(
            F.col("__k").alias("g"), *qcols, "__below", "__upto"
        )
        noop(a.unionByName(b))
        counts_all.unpersist()

    variants = {"v0": v0, "v1": v1, "v2": v2}

    # result equality first (v0 as reference)
    def rows_of(build):
        import io
        from contextlib import redirect_stdout

        # rebuild the union and collect
        if build is v0:
            fxw = fx_cols().drop("event_type")
            counts = (
                fxw.crossJoin(F.broadcast(qb))
                .groupBy(*qcols)
                .agg(F.sum(below).alias("__below"), F.sum(upto).alias("__upto"))
            )
            fxg = fx_cols()
            counts_g = (
                fxg.join(F.broadcast(qbg), "event_type")
                .groupBy("event_type", *qcols)
                .agg(F.sum(below).alias("__below"), F.sum(upto).alias("__upto"))
            )
            return sorted(map(tuple, both_union(counts, counts_g).collect()), key=repr)
        return None

    ref = rows_of(v0)
    bounds = qbg.select(F.col("event_type").alias("__k"), *qcols).unionByName(
        qb.select(F.lit(ALL).alias("__k"), *qcols)
    )
    fx2 = ev.where(F.col("value").isNotNull()).select(
        F.explode(F.array(F.col("event_type"), F.lit(ALL))).alias("__k"),
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("__fx"),
    )
    counts_all = (
        fx2.join(F.broadcast(bounds), "__k")
        .groupBy("__k", *qcols)
        .agg(F.sum(below).alias("__below"), F.sum(upto).alias("__upto"))
    )
    a = counts_all.where(F.col("__k") == ALL).select(
        F.lit(None).cast("string").alias("g"), *qcols, "__below", "__upto"
    )
    b = counts_all.where(F.col("__k") != ALL).select(
        F.col("__k").alias("g"), *qcols, "__below", "__upto"
    )
    v2_rows = sorted(map(tuple, a.unionByName(b).collect()), key=repr)
    print("v2 rows ==", "v0 rows:", v2_rows == ref, flush=True)

    times = {k: [] for k in variants}
    for r in range(rounds):
        for k, fn in variants.items():
            sc.setJobDescription(f"{k} round {r}")
            t0 = time.perf_counter()
            fn()
            times[k].append(round(time.perf_counter() - t0, 3))
            sc.setJobDescription(None)
    for k, ts in times.items():
        print(k, "min", min(ts), "med", sorted(ts)[len(ts) // 2], ts, flush=True)


if __name__ == "__main__":
    main()
