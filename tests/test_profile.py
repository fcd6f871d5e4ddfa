"""Table profiler (operators/profile): null/distinct/min-max semantics,
portable-type gating, the single-scan plan shape, and the approx path."""

from __future__ import annotations

import io
import contextlib

from pyspark.sql import functions as F

from sum_spark.operators.profile import profile_table


def _df(spark):
    return spark.createDataFrame(
        [
            (1, "a", 1.5, None),
            (2, "b", None, None),
            (2, None, 2.5, None),
            (None, "a", 2.5, None),
        ],
        "k long, s string, v double, z string",
    )


def test_profile_values(spark):
    got = {r["column"]: r for r in profile_table(_df(spark)).collect()}
    assert set(got) == {"k", "s", "v", "z"}
    assert all(r["n_rows"] == 4 for r in got.values())
    k = got["k"]
    assert (k["n_nulls"], k["n_distinct"], k["min_str"], k["max_str"]) == (1, 2, "1", "2")
    s = got["s"]
    assert (s["n_nulls"], s["n_distinct"], s["min_str"], s["max_str"]) == (1, 2, "a", "b")
    v = got["v"]  # double: counts exact, min/max not portable -> NULL
    assert (v["n_nulls"], v["n_distinct"], v["min_str"], v["max_str"]) == (1, 2, None, None)
    z = got["z"]  # all-NULL column
    assert (z["n_nulls"], z["n_distinct"], z["min_str"], z["max_str"]) == (4, 0, None, None)


def test_profile_is_one_scan(spark, sf_smoke):
    from sum_spark.sources.tables import load_table

    ev = load_table(spark, sf_smoke, "events")
    # The plan TREE (not the formatted node-detail echo) holds each
    # operator once: all columns' stats ride a single parquet scan.
    plan = profile_table(ev)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1


def test_profile_approx_mode(spark, sf_smoke):
    from sum_spark.sources.tables import load_table

    ev = load_table(spark, sf_smoke, "events")
    exact = {r["column"]: r["n_distinct"] for r in profile_table(ev).collect()}
    approx = {r["column"]: r["n_distinct"] for r in
              profile_table(ev, exact_distinct=False).collect()}
    for c in exact:
        if exact[c]:
            assert abs(approx[c] - exact[c]) / exact[c] < 0.1
    # The approx plan must avoid the Expand the exact multi-distinct needs.
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        profile_table(ev, exact_distinct=False).explain("formatted")
    assert "Expand" not in buf.getvalue()


def test_corpus_fingerprint_detects_any_change(spark, sf_smoke):
    from pyspark.sql import functions as F

    from sum_spark.operators.profile import corpus_fingerprint
    from sum_spark.sources.tables import load_table

    docs = load_table(spark, sf_smoke, "documents")
    base = corpus_fingerprint(docs).collect()[0]
    assert base["n_docs"] == 500 and base["n_null_texts"] == 0
    # Order/layout-insensitive: shuffled layout, same stamp.
    again = corpus_fingerprint(docs.repartition(13)).collect()[0]
    assert tuple(base) == tuple(again)
    # Any single-doc edit moves fp_sum but not the counts-only columns
    # it shouldn't.
    edited = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 7, F.concat(F.col("text"), F.lit(" zz"))).otherwise(
            F.col("text")
        ),
    )
    mod = corpus_fingerprint(edited).collect()[0]
    assert mod["fp_sum"] != base["fp_sum"]
    assert mod["n_docs"] == base["n_docs"]
    assert mod["n_tokens"] == base["n_tokens"] + 1
    # A dropped doc moves it too.
    dropped = corpus_fingerprint(docs.where(F.col("doc_id") != 7)).collect()[0]
    assert dropped["fp_sum"] != base["fp_sum"]


def test_validate_table_counts_violations_and_uniqueness(spark):
    from pyspark.sql import functions as F

    from sum_spark.operators.profile import validate_table

    df = spark.createDataFrame(
        [
            (1, "en", 10),
            (2, "en", -3),       # negative length
            (3, None, 5),        # null lang -> predicate NULL -> violation
            (3, "de", 7),        # duplicate id
        ],
        "doc_id long, lang string, n_chars long",
    )
    rep = validate_table(
        df,
        rules={
            "n_chars_nonneg": F.col("n_chars") >= 0,
            "lang_known": F.col("lang").isin("en", "de"),
        },
        unique_cols=("doc_id",),
    )
    got = {r["check"]: (r["n_violations"], r["n_rows"]) for r in rep.collect()}
    assert got == {
        "lang_known": (1, 4),
        "n_chars_nonneg": (1, 4),
        "unique:doc_id": (1, 4),
    }


def test_validate_table_clean_gate(spark, sf_smoke):
    from pyspark.sql import functions as F

    from sum_spark.operators.profile import validate_table
    from sum_spark.sources.tables import load_table

    docs = load_table(spark, sf_smoke, "documents")
    rep = validate_table(
        docs,
        rules={
            "id_nonneg": F.col("doc_id") >= 0,
            "has_text": F.col("text").isNotNull(),
        },
        unique_cols=("doc_id",),
    )
    assert rep.where("n_violations > 0").count() == 0


def test_profile_table_escapes_hostile_column_names(spark):
    """Review r8: profile_table is a public operator — column names
    containing quotes/backticks must survive the SQL-string builder."""
    df = spark.createDataFrame(
        [(1, "x"), (2, None)], ["it's", "we`ird"]
    )
    rows = {r["column"]: r for r in profile_table(df).collect()}
    assert set(rows) == {"it's", "we`ird"}
    assert rows["it's"]["n_rows"] == 2 and rows["it's"]["n_nulls"] == 0
    assert rows["we`ird"]["n_nulls"] == 1
