"""Text-analysis operators over the ``documents`` table: heuristic
language ID, quality scoring, token counting, document fingerprinting.

Every operator has an exact DuckDB twin (registered in queries/llm.py):
the logic is deliberately restricted to engine-portable primitives
(split / list_filter / greatest / md5) so correctness is hash-checkable.
All of it is single-pass, shuffle-free column work — the shape that
streams through a 100 TB scan at I/O speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sum_spark.functions.hashing import hash60
from sum_spark.functions.text import LANG_STOPWORDS, stopword_hits, tokens


def _lang_hit_cols(toks: Column) -> list[Column]:
    return [stopword_hits(toks, words).cast("long") for _, words in LANG_STOPWORDS]


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-table language classifier: argmax of per-language stopword
    hits, ties broken by table order (en first). Output:
    (doc_id, pred_lang, hits).
    """
    toks = tokens(text_col)
    hits = _lang_hit_cols(toks)
    best = F.greatest(*hits)
    pred = F.lit(None).cast("string")
    # Build the when-chain in reverse so the FIRST language wins ties.
    for (lang, _), h in zip(reversed(LANG_STOPWORDS), reversed(hits)):
        pred = F.when(h == best, F.lit(lang)).otherwise(pred)
    return df.select(
        F.col(id_col).alias("doc_id"), pred.alias("pred_lang"), best.alias("hits")
    ).orderBy("doc_id")


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality score: length saturation + stopword ratio.

    score = 0.5 * min(1, n_words/100) + 0.5 * (en_stopword_hits / n_words),
    rounded to 4. Output: (doc_id, n_words, stop_ratio, score).
    """
    toks = tokens(text_col)
    n_words = F.size(toks).cast("long")
    en_hits = stopword_hits(toks, LANG_STOPWORDS[0][1]).cast("double")
    stop_ratio = F.round(en_hits / n_words.cast("double"), 4)
    score = F.round(
        F.least(F.lit(1.0), n_words.cast("double") / 100.0) * 0.5
        + (en_hits / n_words.cast("double")) * 0.5,
        4,
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("n_words"),
        stop_ratio.alias("stop_ratio"),
        score.alias("score"),
    ).orderBy("doc_id")


def token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token statistics: whitespace tokens, distinct tokens, characters.
    Output: (doc_id, n_tokens, n_distinct, n_chars)."""
    toks = tokens(text_col)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.length(text_col).cast("long").alias("n_chars"),
    ).orderBy("doc_id")


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic document fingerprint: md5 hex of the normalized text
    plus its 60-bit integer form (the portable hash used across the
    dedup family). Output: (doc_id, fp, fp60)."""
    norm = F.lower(F.trim(F.col(text_col)))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.md5(norm).alias("fp"),
        hash60(norm).alias("fp60"),
    ).orderBy("doc_id")
