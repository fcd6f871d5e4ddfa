"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set (the GPT-3/PaLM-style
"n-gram overlap" contamination check every pretraining pipeline runs
before training).

Scale shape: the benchmark side is tiny by construction (eval sets are
megabytes against a 100 TB corpus), so its distinct shingle hashes are
BROADCAST and the corpus side never shuffles — the explode + hash is
map-side, the broadcast hash join is map-side, and the only exchange is
the groupBy over *matching* shingles (a vanishingly small subset). The
60-bit portable hash (functions/hashing.py) keeps the oracle exact.

No reference analog (the reference has no corpus-hygiene surface); this
extends the dedup family per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sum_spark.functions.hashing import duck_hash60, hash60
from sum_spark.functions.text import SHINGLE_N, duck_word_shingles, tokens, word_shingles
from sum_spark.plans.scale import spread_for_compute


def _shingle_hashes(
    df: DataFrame | None,
    n: int,
    text_col: str,
    id_col: str | None,
    words: DataFrame | None = None,
) -> DataFrame:
    """(doc_id?, __h) rows: one per DISTINCT word n-shingle per document.

    Staged projections (words, then shingles, then hashes) on purpose:
    inlining tokens() into word_shingles' element_at lambdas re-evaluates
    split(text) per shingle element — quadratic in document length (the
    Catalyst re-inlining pitfall shingle_sets documents).

    Pass ``words`` — a (doc_id, __w: array<string>) frame, typically a
    PERSISTED shared tokenization — to skip the tokenize (and the scan
    behind it) entirely; ``df``/``text_col`` are then unused."""
    if words is not None:
        w = words.select("doc_id", "__w").where(F.size("__w") >= n)
        ex = w.select(
            "doc_id",
            F.explode(F.array_distinct(word_shingles(F.col("__w"), n))).alias("__s"),
        )
        return ex.select("doc_id", hash60(F.col("__s")).alias("__h"))
    ids = [F.col(id_col).alias("doc_id")] if id_col else []
    w = spread_for_compute(df).select(*ids, tokens(text_col).alias("__w"))
    w = w.where(F.size("__w") >= n)
    id_names = ["doc_id"] if id_col else []
    ex = w.select(
        *id_names, F.explode(F.array_distinct(word_shingles(F.col("__w"), n))).alias("__s")
    )
    return ex.select(*id_names, hash60(F.col("__s")).alias("__h"))


def decontaminate(
    corpus: DataFrame | None,
    benchmark: DataFrame | None,
    n: int = SHINGLE_N,
    text_col: str = "text",
    id_col: str = "doc_id",
    corpus_hashes: DataFrame | None = None,
    benchmark_hashes: DataFrame | None = None,
    ordered: bool = True,
) -> DataFrame:
    """Contamination report: corpus documents sharing at least one word
    n-gram with any benchmark document, with the count of distinct
    overlapping n-grams. Downstream removal is an anti-join of the
    corpus against these doc_ids.

    Pass ``corpus_hashes`` — (doc_id, __h) rows of per-doc DISTINCT
    shingle hashes, e.g. ``minhash_signatures``'s ``hh`` column exploded
    — to reuse hashes already computed for dedup instead of re-scanning
    corpus text (``corpus`` may then be None). The benchmark side is
    tiny and is hashed here unless ``benchmark_hashes`` supplies the
    DISTINCT (__h) rows precomputed — a repeated caller (the streaming
    corpus-state sink, which decontaminates every micro-batch against
    the SAME static benchmark) persists them once instead of re-hashing
    the benchmark per call; ``benchmark`` may then be None. HARD
    PRECONDITION: any supplied hashes must have been built at the SAME
    shingle width as ``n`` — widths are not validated, and a mismatch
    silently produces a near-empty contamination report (the equi-join
    finds no overlaps).

    Output: (doc_id, n_hits) ordered by doc_id.
    """
    if corpus is None and corpus_hashes is None:
        raise ValueError("decontaminate needs corpus or corpus_hashes")
    if benchmark is None and benchmark_hashes is None:
        raise ValueError("decontaminate needs benchmark or benchmark_hashes")
    bench = (
        benchmark_hashes
        if benchmark_hashes is not None
        else _shingle_hashes(benchmark, n, text_col, None).distinct()
    )
    corp = (
        corpus_hashes
        if corpus_hashes is not None
        else _shingle_hashes(corpus, n, text_col, id_col)
    )
    return (
        corp.join(F.broadcast(bench), "__h")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
        .transform(lambda d: d.orderBy("doc_id") if ordered else d)
    )


def duck_decontaminate_sql(
    bench_pred: str,
    n: int = SHINGLE_N,
    table: str = "documents",
) -> str:
    """DuckDB twin: benchmark = rows WHERE bench_pred, corpus = the rest."""
    sh = duck_word_shingles("w", n)
    h = duck_hash60("s")
    return f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM {table}),
    sh AS (SELECT doc_id, unnest(list_distinct({sh})) AS s FROM d),
    hh AS (SELECT doc_id, {h} AS h FROM sh),
    bench AS (SELECT DISTINCT h FROM hh WHERE {bench_pred}),
    corp AS (SELECT * FROM hh WHERE NOT ({bench_pred}))
    SELECT corp.doc_id, COUNT(*) AS n_hits
    FROM corp JOIN bench USING (h)
    GROUP BY corp.doc_id ORDER BY doc_id
    """


def decontaminate_bloom(
    corpus: DataFrame | None,
    benchmark: DataFrame,
    n: int = SHINGLE_N,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int | None = None,
    k: int | None = None,
    corpus_hashes: DataFrame | None = None,
    ordered: bool = True,
) -> DataFrame:
    """Contamination report via a Bloom filter of the benchmark's shingle
    hashes — the fixed-size form of ``decontaminate`` for when even the
    exact hash set is too big to broadcast comfortably (a large eval
    union, or decontaminating against another full corpus): the filter
    is ``m_bits`` bits regardless of benchmark size, membership is k
    getbit lookups per corpus shingle (pure map-side expression — no
    join at all on the corpus side), and the one-sided error means NO
    missed contamination: every exact hit is reported (possibly with a
    slightly inflated n_hits), plus a ~(set_bits/m_bits)^k rate of
    false-positive shingles. Filter bloom-flagged docs with the exact
    operator when precision matters — the standard two-phase shape.

    Same surface and preconditions as ``decontaminate`` (including the
    shingle-width contract on ``corpus_hashes``); output (doc_id,
    n_hits) where n_hits counts the doc's DISTINCT maybe-overlapping
    shingles (>= the exact n_hits for every exactly-contaminated doc).
    """
    from sum_spark.operators.sketch import (
        BLOOM_K,
        BLOOM_M_BITS,
        bloom_build_bits,
        bloom_member,
    )

    if corpus is None and corpus_hashes is None:
        raise ValueError("decontaminate_bloom needs corpus or corpus_hashes")
    m_bits = m_bits or BLOOM_M_BITS
    k = k or BLOOM_K
    bench = _shingle_hashes(benchmark, n, text_col, None).distinct()
    words = bloom_build_bits(bench, "__h", m_bits, k)
    corp = (
        corpus_hashes
        if corpus_hashes is not None
        else _shingle_hashes(corpus, n, text_col, id_col)
    )
    flagged = bloom_member(corp, "__h", words, m_bits, k)
    return (
        flagged.where(F.col("maybe"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
        .transform(lambda d: d.orderBy("doc_id") if ordered else d)
    )


def duck_decontaminate_tagged_sql(
    bench_pred: str,
    n: int = SHINGLE_N,
    table: str = "documents",
) -> str:
    """DuckDB twin of the tagged exact+bloom pair: same CTEs as
    duck_decontaminate_sql plus the bloom-filter rebuild
    (sketch.duck_bloom_member_sql) over the benchmark hash set."""
    from sum_spark.operators.sketch import duck_bloom_member_sql

    sh = duck_word_shingles("w", n)
    h = duck_hash60("s")
    bloom_cte, bloom_pred = duck_bloom_member_sql("SELECT h AS x FROM bench")
    return f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM {table}),
    sh AS (SELECT doc_id, unnest(list_distinct({sh})) AS s FROM d),
    hh AS (SELECT doc_id, {h} AS h FROM sh),
    bench AS (SELECT DISTINCT h FROM hh WHERE {bench_pred}),
    corp AS (SELECT * FROM hh WHERE NOT ({bench_pred})),
    {bloom_cte.strip()}
    SELECT 'exact' AS mode, corp.doc_id, COUNT(*) AS n_hits
    FROM corp JOIN bench USING (h)
    GROUP BY corp.doc_id
    UNION ALL
    SELECT 'bloom', doc_id, COUNT(*)
    FROM corp WHERE {bloom_pred.format(x="h")}
    GROUP BY doc_id
    ORDER BY mode, doc_id
    """
