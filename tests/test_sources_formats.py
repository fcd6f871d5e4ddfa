"""Round-trip tests for the non-parquet source/sink formats and the
records <-> embeddings data-model adapter (FIXTURES A1 analog)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sum_spark.sources.formats import delta_available, read_source, write_sink
from sum_spark.sources.tables import load_table
from sum_spark.store import RECORD_SCHEMA, RecordStore


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_roundtrip_formats(spark, sf_smoke, tmp_path, fmt):
    src = load_table(spark, sf_smoke, "customer").limit(50)
    path = str(tmp_path / fmt)
    write_sink(src, fmt, path)
    back = read_source(spark, fmt, path, schema=src.schema)
    assert back.count() == 50
    a = sorted(src.select("c_custkey", "c_name").collect())
    b = sorted(back.select("c_custkey", "c_name").collect())
    assert a == b


def test_csv_requires_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="schema"):
        read_source(spark, "csv", str(tmp_path))
    with pytest.raises(ValueError, match="unsupported"):
        read_source(spark, "avro", str(tmp_path))


def test_delta_gated_not_stubbed(spark):
    assert delta_available(spark) in (True, False)


def test_embeddings_as_records(spark, sf_smoke, tmp_path):
    """The embeddings table maps onto the reference's record model
    (vec_id<->id, embedding<->data, label<->meta; FIXTURES.md §B) and the
    canonical findSimilar runs through the RecordStore's DataFrame."""
    from sum_spark.operators.similarity import find_similar

    emb = load_table(spark, sf_smoke, "embeddings")
    records = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("data"),
        F.array(F.size("embedding").cast("long")).alias("shape"),
        F.create_map(F.lit("label"), F.col("label").cast("string")).alias("meta"),
    )
    path = str(tmp_path / "records")
    records.write.parquet(path, mode="overwrite")
    store = RecordStore(spark, path)
    assert store.count() == emb.count()
    assert [f.name for f in store.df.schema.fields] == [f.name for f in RECORD_SCHEMA.fields]
    top = find_similar(store.df, probe_id=1, threshold=0.0, k=5).collect()
    assert len(top) == 5 and all(r["id"] != 1 for r in top)
    # meta round-trips through the store's find_by_meta path
    label = store.read(1)["meta"]["label"]
    hits = store.find_by_meta("label", label)
    assert any(r["id"] == 1 for r in hits)
