"""Source/sink format support beyond Parquet (the canonical store).

Parquet is the engine's at-rest format (columnar, pushdown, statistics);
CSV/JSON are ingest formats (schema mandatory — inference is a full
extra pass at 100 TB), ORC an alternative columnar source. Table-format
connectors (Delta/Iceberg/Hudi) need their jars on the classpath and are
gated behind an import/availability check rather than stubbed imports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

READ_FORMATS = ("parquet", "orc", "json", "csv")


def read_source(
    spark: SparkSession,
    fmt: str,
    path: str,
    schema: StructType | str | None = None,
) -> DataFrame:
    """Schema-explicit reader. CSV/JSON REQUIRE a schema: inference reads
    the data twice and types drift run-to-run — never acceptable on a
    production pipeline."""
    if fmt not in READ_FORMATS:
        raise ValueError(f"unsupported source format {fmt!r}; known: {READ_FORMATS}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        raise ValueError(f"{fmt} sources require an explicit schema")
    if fmt == "csv":
        return reader.option("header", "true").csv(path)
    return getattr(reader, fmt)(path)


def write_sink(df: DataFrame, fmt: str, path: str, mode: str = "overwrite") -> None:
    if fmt not in READ_FORMATS:
        raise ValueError(f"unsupported sink format {fmt!r}; known: {READ_FORMATS}")
    writer = df.write.mode(mode)
    if fmt == "csv":
        writer = writer.option("header", "true")
    getattr(writer, fmt)(path)


def delta_available(spark: SparkSession) -> bool:
    """Whether a Delta Lake runtime is on the classpath (not in this
    environment; the store's copy-on-write rewrite is the fallback)."""
    try:
        spark._jvm.org.apache.spark.sql.delta.DeltaLog  # noqa: B018
        return True
    except Exception:
        return False
