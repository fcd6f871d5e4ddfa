"""Parquet table access for the driver's synthetic star schema.

Reference analog: the full-directory ``.dat`` scan at startup
(/root/reference/node/storage/loader.go:20-46). Here the "storage engine"
is Parquet + Catalyst: columnar scans, predicate pushdown, column pruning
and partition pruning come from the source format instead of a hand-rolled
in-memory index.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Plain ``spark.read.parquet`` — no caching layer, so
    Catalyst sees the raw file scan and can push filters/projections into it.

    ``events.ts`` has shipped in two physical shapes: parquet
    TIMESTAMP(NANOS) (which Spark reads only via nanosAsLong) and plain
    timestamp[us].  The conversion is branched on the type the reader
    actually produced, so either shape — and any future flip between them —
    yields the same microsecond TIMESTAMP_NTZ column:

    - BIGINT (nanosAsLong): integer-div to micros, timestampadd from the
      NTZ epoch.  Pure integer arithmetic, never routed through the session
      timezone (an LTZ intermediate would silently localize under a non-UTC
      caller session).
    - TIMESTAMP_NTZ: already the target type, no arithmetic.
    - TIMESTAMP (LTZ, isAdjustedToUTC data): rebuilt from unix_micros —
      a timezone-independent extraction, unlike a bare cast to NTZ which
      localizes through the session zone.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            return df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ),
            )
        if isinstance(ts_type, TimestampNTZType):
            return df
        if isinstance(ts_type, TimestampType):
            return df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, unix_micros(ts), TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ),
            )
        raise TypeError(f"events.ts read as unsupported type {ts_type}")
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL query surface)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
