"""SQL-registered vector functions: callable from SQL text, values agree
with the Catalyst column expressions."""

from __future__ import annotations

import pytest

from sum_spark.functions.sql import register_sql_functions


@pytest.fixture(scope="module", autouse=True)
def registered(spark):
    register_sql_functions(spark)


def test_vec_dot_from_sql(spark):
    row = spark.sql(
        "SELECT vec_dot(array(3.0F, 6.0F, 9.0F), array(3.0F, 6.0F, 9.0F)) AS d"
    ).first()
    assert row["d"] == pytest.approx(126.0)


def test_vec_cosine_zero_rule_from_sql(spark):
    row = spark.sql(
        "SELECT vec_cosine(array(1.0F, 1.0F), array(0.0F, 0.0F)) AS c"
    ).first()
    assert row["c"] == 0.0


def test_sql_matches_column_api(spark, sf_smoke):
    from sum_spark.functions.vector import cosine
    from sum_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_smoke, "embeddings").limit(20)
    emb.createOrReplaceTempView("t_sqlfn_emb")
    via_sql = {
        r["vec_id"]: r["c"]
        for r in spark.sql(
            "SELECT vec_id, vec_cosine(embedding, embedding) AS c FROM t_sqlfn_emb"
        ).collect()
    }
    via_col = {
        r["vec_id"]: r["c"]
        for r in emb.select("vec_id", cosine("embedding", "embedding").alias("c")).collect()
    }
    for k in via_col:
        assert via_sql[k] == pytest.approx(via_col[k], abs=1e-9)
