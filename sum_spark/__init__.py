"""sum_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of evilsocket/sum, re-expressed Spark-first.

The reference (/root/reference, Go + embedded-JS "oracles") is a gRPC
vector database: float32 records with string metadata, a JS stored-procedure
query surface, and a master/node scatter-gather layer. This package maps
that capability surface onto Spark's execution model:

- records            -> a canonical DataFrame schema (Parquet at rest)
- vector kernels     -> Catalyst column expressions (+ NumPy pandas_udf path)
- oracles            -> a named-query registry of Python functions
- master scatter/gather -> Spark partitioning + broadcast + partial/final agg
- meta inverted index   -> predicate pushdown / partition pruning

Nothing here is a port: architecture follows the DataFrame/Catalyst model,
with the reference cited (file:line) only to pin down *semantics*.
"""

from sum_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
