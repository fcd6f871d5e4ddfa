"""Keyword retrieval: BM25 top-k scoring over the documents table — the
lexical complement to the vector ANN operators (similarity.py).

Shape at scale: ONE aggregate pass builds the corpus statistics (N,
avg doc length, per-term document frequencies) as a single row that
broadcasts to the scoring scan; scoring is per-row column math; the
top-k is a TakeOrderedAndProject, not a full sort. No shuffle touches
the corpus beyond the stats aggregate's partial-combine.

The per-term score sum is written as a FIXED left-associative chain (not
an aggregate over an exploded term table) so double addition order is
deterministic and the DuckDB oracle — generated from the same constants
by duck_bm25_sql — reproduces values to the last bit (modulo ln(), whose
libm vs JVM 1-ulp differences are absorbed by ROUND to 4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sum_spark.functions.text import tokens
from sum_spark.plans.scale import spread_for_compute

BM25_K1 = 1.2
BM25_B = 0.75


def _tf(term: str) -> Column:
    # Factory closure: capturing the term via a lambda default arg would
    # break HOF arity introspection (see functions/hashing.py).
    return F.size(F.filter(F.col("__w"), lambda x: x == F.lit(term)))


def bm25_search(
    df: DataFrame,
    terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents by BM25(k1=1.2, b=0.75) for the given terms.

    idf(t) = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))   (Lucene form)
    score  = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    Output: (rank, doc_id, score) — score rounded to 4, ties broken by
    doc_id, zero-score documents excluded.
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    df = spread_for_compute(df)
    words = df.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("__w")
    ).select("doc_id", "__w", F.size("__w").alias("__dl"))
    stats = words.agg(
        F.count("*").alias("__n"),
        (F.sum("__dl").cast("double") / F.count("*")).alias("__avgdl"),
        *[
            F.sum(F.array_contains("__w", t).cast("int")).alias(f"__df{i}")
            for i, t in enumerate(terms)
        ],
    )
    scored = words.join(F.broadcast(stats))
    score: Column | None = None
    for i, t in enumerate(terms):
        n, dft = F.col("__n"), F.col(f"__df{i}")
        idf = F.log(
            F.lit(1) + (n - dft + F.lit(0.5)) / (dft + F.lit(0.5))
        )
        tf = _tf(t).cast("double")
        denom = tf + F.lit(BM25_K1) * (
            F.lit(1) - F.lit(BM25_B) + F.lit(BM25_B) * F.col("__dl") / F.col("__avgdl")
        )
        contrib = idf * (tf * (F.lit(BM25_K1) + F.lit(1))) / denom
        score = contrib if score is None else score + contrib
    ranked = (
        scored.select("doc_id", score.alias("__score"))
        .where(F.col("__score") > 0)
        .orderBy(F.col("__score").desc(), "doc_id")
        .limit(k)
    )
    w = Window.orderBy(F.col("__score").desc(), "doc_id")
    return ranked.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "doc_id",
        F.round("__score", 4).alias("score"),
    ).orderBy("rank")


def duck_bm25_sql(terms: list[str], k: int = 10) -> str:
    """DuckDB twin of bm25_search over the ``documents`` view, generated
    from the same constants and the same expression structure (bare
    float literals CAST to DOUBLE — DuckDB parses them as DECIMAL)."""
    k1, b = f"CAST({BM25_K1} AS DOUBLE)", f"CAST({BM25_B} AS DOUBLE)"
    half = "CAST(0.5 AS DOUBLE)"
    dfs = ",\n             ".join(
        f"SUM(CASE WHEN list_contains(w, '{t}') THEN 1 ELSE 0 END) AS df{i}"
        for i, t in enumerate(terms)
    )
    contribs = []
    for i, t in enumerate(terms):
        idf = f"ln(1 + (n - df{i} + {half}) / (df{i} + {half}))"
        tf = f"CAST(len(list_filter(w, x -> x = '{t}')) AS DOUBLE)"
        denom = f"({tf} + {k1} * (1 - {b} + {b} * dl / avgdl))"
        contribs.append(f"({idf} * ({tf} * ({k1} + 1)) / {denom})")
    score = " + ".join(contribs)
    return f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    d AS (SELECT doc_id, w, len(w) AS dl FROM t),
    st AS (SELECT COUNT(*) AS n,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
             {dfs}
           FROM d),
    sc AS (SELECT doc_id, {score} AS s FROM d CROSS JOIN st),
    top AS (SELECT doc_id, s FROM sc WHERE s > 0
            ORDER BY s DESC, doc_id LIMIT {k})
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS BIGINT) AS rank,
           doc_id, ROUND(s, 4) AS score
    FROM top ORDER BY rank
    """
