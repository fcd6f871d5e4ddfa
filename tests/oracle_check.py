"""Local replica of the driver's correctness comparison: run a registered
query through Spark and its oracle through DuckDB on the same parquet
tables, then compare row count + (name-sorted) columns + values.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

from sum_spark.sources.tables import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif s.dtype == object:
            import datetime

            import numpy as np

            if s.map(lambda v: v is None or isinstance(v, datetime.date)).all():
                # Spark DATE -> datetime.date objects; DuckDB DATE ->
                # datetime64 at midnight. Canonicalize both to datetime64.
                df[c] = pd.to_datetime(s).astype("datetime64[us]")
            elif s.map(lambda v: v is None or isinstance(v, (list, np.ndarray))).all():
                # Array columns: Spark gives lists, DuckDB ndarrays.
                df[c] = s.map(lambda v: str(tuple(v)) if v is not None else None)
            else:
                df[c] = s.map(lambda v: str(v) if v is not None else None)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(
    spark_df, duck_df: pd.DataFrame, name: str = "query", strict: bool = False
) -> list[str]:
    """Return a list of mismatch descriptions (empty = match).

    strict=True compares floats by EXACT bit equality — the same standard
    as the external driver's canonicalized value hash. The default
    tolerance mode (abs_tol=1e-9) exists only for exploratory diffing; it
    hid the corpus_mixture last-bit divergence in round 3 (VERDICT r3 #3),
    so everything that gates on "matches the driver" must pass strict.
    """
    errs: list[str] = []
    sp = _normalize(spark_df.toPandas())
    du = _normalize(duck_df)
    if len(sp) != len(du):
        errs.append(f"{name}: row count spark={len(sp)} duckdb={len(du)}")
    if list(sp.columns) != list(du.columns):
        errs.append(f"{name}: columns spark={list(sp.columns)} duckdb={list(du.columns)}")
    if errs:
        return errs
    for c in sp.columns:
        a, b = sp[c], du[c]
        if pd.api.types.is_float_dtype(a):
            bad = [
                i
                for i, (x, y) in enumerate(zip(a, b))
                if not (
                    (pd.isna(x) and pd.isna(y))
                    or (
                        not pd.isna(x)
                        and not pd.isna(y)
                        and (
                            x == y
                            if strict
                            else math.isclose(x, y, rel_tol=0, abs_tol=1e-9)
                        )
                    )
                )
            ]
        else:
            bad = [
                i
                for i, (x, y) in enumerate(zip(a, b))
                if not ((pd.isna(x) and pd.isna(y)) or x == y)
            ]
        if bad:
            i = bad[0]
            errs.append(
                f"{name}.{c}: {len(bad)} mismatches, first at row {i}: "
                f"spark={sp[c][i]!r} duckdb={du[c][i]!r}"
            )
    return errs
