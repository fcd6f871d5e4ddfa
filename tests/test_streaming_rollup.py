"""Streaming continuous aggregate: the stream-maintained hourly table
must equal the batch hourly rollup over the same events (partial rows
are reaggregatable by design), and coarser grains served from it must
equal grains served from the batch partials."""

from __future__ import annotations

from pyspark.sql import functions as F

from sum_spark.operators.rollup_ts import hourly_rollup, rollup_to
from sum_spark.sources.tables import load_table


def _rounded(df):
    # s sums DOUBLEs across rows — partition-order-sensitive in the last
    # ulps (CLAUDE.md); compare at 6 dp, far below any real signal.
    return sorted(
        (r["h"], r["event_type"], r["c"], round(r["s"], 6), r["mn"], r["mx"])
        for r in df.collect()
    )


def test_stream_rollup_equals_batch_rollup(spark, sf_smoke, tmp_path):
    from sum_spark.streaming.rollup import read_hourly_rollup, streaming_hourly_rollup

    ev = load_table(spark, sf_smoke, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    drop_dir = str(tmp_path / "drops")
    ev.where(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(drop_dir)
    ev.where(F.col("event_id") % 2 != 0).coalesce(1).write.mode("append").parquet(
        drop_dir
    )
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop_dir)
    )
    out = str(tmp_path / "rollup")
    q = streaming_hourly_rollup(stream, path=out, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination()

    import glob

    assert len(glob.glob(out + "/batch_id=*")) >= 2  # real accumulation

    accumulated = read_hourly_rollup(spark, out)
    batch = hourly_rollup(ev)
    assert _rounded(accumulated) == _rounded(batch)

    # Coarser grains serve from the stream-maintained partials unchanged.
    day_stream = rollup_to(accumulated, "day").drop("avg_v")
    day_batch = rollup_to(batch, "day").drop("avg_v")
    key = lambda r: (r["g"], r["event_type"])
    a = {key(r): (r["c"], round(r["s"], 6), r["mn"], r["mx"]) for r in day_stream.collect()}
    b = {key(r): (r["c"], round(r["s"], 6), r["mn"], r["mx"]) for r in day_batch.collect()}
    assert a == b and a
