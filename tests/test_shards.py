"""Training-shard export (sources/shards): deterministic placement,
manifest integrity, partition-pruned resume, tamper detection."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from sum_spark.operators import sampling
from sum_spark.sources import shards
from sum_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def serial(spark, sf_smoke):
    """Documents in serialization order: (doc_id, source, n_chars,
    shuffle_pos) — the shape prepare_training_data hands to export."""
    docs = load_table(spark, sf_smoke, "documents").select(
        "doc_id", "source", "n_chars"
    )
    pos = sampling.global_shuffle(docs, seed="export-test")
    df = docs.join(pos, "doc_id").persist()
    df.count()
    yield df
    df.unpersist()


def test_roundtrip_and_exact_shard_sizes(spark, serial, tmp_path):
    path = str(tmp_path / "sh")
    man = shards.write_training_shards(serial, path, rows_per_shard=150)
    rows = man.collect()
    n = serial.count()
    assert sum(r["n_rows"] for r in rows) == n
    # every shard but the last is exactly full, ranks are contiguous
    full = [r for r in rows if r["shard"] < rows[-1]["shard"]]
    assert all(r["n_rows"] == 150 for r in full)
    assert all(r["max_order"] - r["min_order"] + 1 == r["n_rows"] for r in rows)
    back = shards.read_training_shards(spark, path)
    assert back.count() == n
    a = sorted(serial.collect(), key=lambda r: r["shuffle_pos"])
    b = sorted(back.drop("shard").collect(), key=lambda r: r["shuffle_pos"])
    assert [tuple(sorted(r.asDict().items())) for r in a] == [
        tuple(sorted(r.asDict().items())) for r in b
    ]


def test_manifest_is_deterministic_across_writes_and_layouts(spark, serial, tmp_path):
    m1 = shards.write_training_shards(serial, str(tmp_path / "a"), rows_per_shard=128)
    m2 = shards.write_training_shards(
        serial.repartition(17), str(tmp_path / "b"), rows_per_shard=128
    )
    assert sorted(map(tuple, m1.collect())) == sorted(map(tuple, m2.collect()))


def test_resume_read_prunes_partitions(spark, serial, tmp_path):
    path = str(tmp_path / "sh")
    shards.write_training_shards(serial, path, rows_per_shard=100, base=1)
    resumed = shards.read_training_shards(spark, path, from_shard=3)
    plan = resumed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "shard" in pf
    assert resumed.select(F.min("shard")).collect()[0][0] == 3
    named = shards.read_training_shards(spark, path, shards=[0, 2])
    assert {r["shard"] for r in named.select("shard").distinct().collect()} == {0, 2}


def test_verify_detects_tampering(spark, serial, tmp_path):
    path = str(tmp_path / "sh")
    shards.write_training_shards(serial, path, rows_per_shard=200, base=1)
    assert shards.verify_shards(spark, path).count() == 0  # intact
    shutil.rmtree(f"{path}/shard=1")  # lose a shard
    bad = shards.verify_shards(spark, path).collect()
    assert [r["shard"] for r in bad] == [1]
    assert bad[0]["a_rows"] is None


def test_json_shards_with_schema(spark, serial, tmp_path):
    path = str(tmp_path / "js")
    schema = "doc_id long, source string, n_chars long, shuffle_pos long"
    shards.write_training_shards(serial, path, rows_per_shard=200, fmt="json", base=1)
    back = shards.read_training_shards(spark, path, fmt="json", schema=schema)
    assert back.count() == serial.count()
    assert shards.verify_shards(spark, path, fmt="json", schema=schema).count() == 0
