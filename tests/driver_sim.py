"""Simulate the driver's verify flow against __spark_entry__.py:

- builds its OWN plain SparkSession (no sum_spark tuning, hostile TZ)
- smoke-runs entry(spark)
- runs every queries()[name] at the given sf and compares against
  oracle_sql()[name] via DuckDB (row count + name-sorted columns +
  order-insensitive values)

Usage: python tests/driver_sim.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver_sim")
        # Hostile non-UTC session TZ: the engine must pin what it needs.
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as ent
    from tests.oracle_check import compare, duck_connection

    rows = ent.entry(spark).collect()
    print(f"entry(): {len(rows)} rows; first: {rows[0] if rows else None}")
    assert len(rows) >= 0

    qs = ent.queries()
    oracles = ent.oracle_sql()
    con = duck_connection(sf_dir)
    failures = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            if name in oracles:
                ddf = con.execute(oracles[name]).df()
                # strict: exact float equality, the driver's hash standard
                errs = compare(sdf, ddf, name, strict=True)
            else:
                n = sdf.count()
                errs = [] if n >= 0 else [f"{name}: negative count?"]
            dt = time.time() - t0
            status = "OK " if not errs else "FAIL"
            print(f"{status} {name:28s} {dt:6.2f}s" + ("" if not errs else " | " + errs[0]))
            failures.extend(errs)
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name:28s} {str(e).splitlines()[0][:160]}")
            failures.append(f"{name}: {e}")
    print(f"\n{'ALL MATCH' if not failures else f'{len(failures)} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
