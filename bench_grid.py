"""findSimilar grid parity benchmark — replicates the reference's
benchmark workloads (BASELINE.md):

- node grid: R records x C float32 dims, probe id=1, threshold 0.9
  (/root/reference/node/service/compiled_benchmark_test.go:134-184)
- distributed shape: 1024 x 475, threshold 0.5
  (/root/reference/master/service_bench_test.go:21-22)

Prints one JSON line: {"metric": "find_similar_grid", "unit": "sec",
"grid": {"RxC": sec_per_query, ...}}. Timings are steady-state (median of
3 runs after a warm-up) since the reference's go-bench loop measures
per-op latency, not cold start.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import pandas as pd

GRID = [(10, 100), (10, 500), (10, 1000), (100, 10), (200, 10), (100, 1), (10000, 50)]
DISTRIBUTED = (1024, 475)


def main() -> None:
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        LongType,
        StructField,
        StructType,
    )

    from sum_spark.operators.similarity import find_similar
    from sum_spark.session import get_spark

    spark = get_spark("sum_spark_bench_grid")
    schema = StructType(
        [
            StructField("id", LongType(), False),
            StructField("data", ArrayType(FloatType()), False),
        ]
    )
    rng = np.random.default_rng(42)
    results: dict[str, float] = {}

    for rows, dims, threshold in [(*g, 0.9) for g in GRID] + [(*DISTRIBUTED, 0.5)]:
        mat = rng.random((rows, dims), dtype=np.float32)
        pdf = pd.DataFrame({"id": np.arange(1, rows + 1), "data": list(mat)})
        # Partition count sized to the data (~100k floats per partition):
        # a 10-row table spread over 32 default partitions pays 32 empty
        # task launches per query — pure scheduling overhead at this scale.
        n_parts = max(1, min(32, rows * dims // 100_000))
        df = spark.createDataFrame(pdf, schema).coalesce(n_parts).cache()
        df.count()  # materialize the cache: the reference holds records in RAM
        t = []
        for i in range(4):
            t0 = time.perf_counter()
            find_similar(df, probe_id=1, threshold=threshold).count()
            t.append(time.perf_counter() - t0)
        results[f"{rows}x{dims}"] = round(statistics.median(t[1:]), 4)
        df.unpersist()

    print(json.dumps({"metric": "find_similar_grid", "unit": "sec", "grid": results}))


if __name__ == "__main__":
    main()
