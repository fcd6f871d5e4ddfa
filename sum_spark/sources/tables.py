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

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark's reader
    rejects; it is read via nanosAsLong and truncated to a microsecond
    TIMESTAMP_NTZ (integer div — matching DuckDB's ns->us truncation).
    The NTZ value is built with timestampadd from the NTZ epoch — pure
    integer arithmetic, never routed through the session timezone (an LTZ
    intermediate would silently localize under a non-UTC caller session).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return spark.read.parquet(path).withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ),
        )
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL query surface)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
