"""Text featurization shared by the LLM-pipeline operators: tokenization,
word shingles, stopword tables. Every helper has an exact DuckDB-SQL twin
so the dedup/text operators are value-checkable end to end.

Tokenization is deliberately the simplest portable rule — split on single
spaces (the synthetic corpus is single-space separated; for real corpora
swap in a regexp tokenizer, which both engines also support).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SHINGLE_N = 3  # word 3-shingles for near-dup detection

# Tiny per-language stopword tables for the heuristic language classifier.
# Order matters: it is the deterministic tie-break (first max wins).
LANG_STOPWORDS: list[tuple[str, tuple[str, ...]]] = [
    ("en", ("the", "a", "and", "of", "to", "in", "is", "it")),
    ("fr", ("le", "la", "et", "les", "des", "un", "une", "du")),
    ("de", ("der", "die", "und", "das", "ein", "nicht", "ist", "zu")),
    ("es", ("el", "la", "y", "los", "de", "que", "un", "una")),
    ("zh", ("的", "是", "了", "在", "我", "有", "和", "不")),
]


def regex_quote(sep: str) -> str:
    """Java ``Pattern.quote`` of a literal separator: ``F.split`` treats
    its pattern as a regex, so a caller passing '|' or '.' as a line
    separator would otherwise get per-character splits that no longer
    round-trip with the literal ``array_join`` reassembly (or the DuckDB
    twin's literal string_split). \\Q...\\E quoting, with embedded \\E
    spliced exactly as java.util.regex.Pattern.quote does."""
    return "\\Q" + sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"


def tokens(text: Column | str) -> Column:
    """Whitespace tokens. DuckDB twin: string_split(text, ' ')."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def word_shingles(toks: Column, n: int = SHINGLE_N) -> Column:
    """Overlapping word n-shingles as space-joined strings.

    DuckDB twin:
      list_transform(range(1, len(w) - n + 2), i -> w[i]||' '||...||w[i+n-1])
    Empty when the document has fewer than n words.
    """
    idx = F.sequence(F.lit(0), F.size(toks) - n)  # 0-based start positions
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + k + 1) for k in range(n)]),
    )
    return F.when(F.size(toks) >= n, sh).otherwise(F.array().cast("array<string>"))


def word_shingles_sql(toks_expr: str, n: int = SHINGLE_N) -> str:
    """Spark-SQL string form of :func:`word_shingles` — same expression
    tree via the parser instead of ~20 py4j Column round trips per build
    (the band_struct_array batching pattern, VERDICT r8 #4)."""
    parts = ", ".join(f"element_at({toks_expr}, i + {k + 1})" for k in range(n))
    return (
        f"CASE WHEN size({toks_expr}) >= {n} "
        f"THEN transform(sequence(0, size({toks_expr}) - {n}), "
        f"i -> concat_ws(' ', {parts})) "
        f"ELSE CAST(array() AS array<string>) END"
    )


def duck_word_shingles(words_expr: str, n: int = SHINGLE_N) -> str:
    """DuckDB list expression producing the same shingles (1-based lists)."""
    parts = " || ' ' || ".join(f"{words_expr}[i + {k}]" for k in range(n))
    return (
        f"CASE WHEN len({words_expr}) >= {n} "
        f"THEN list_transform(range(1, len({words_expr}) - {n} + 2), i -> {parts}) "
        f"ELSE [] END"
    )


def stopword_hits(toks: Column, words: tuple[str, ...]) -> Column:
    """Number of tokens that are in the stopword list (with multiplicity).

    DuckDB twin: len(list_filter(w, t -> t IN (...))).
    """
    lst = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(lst, t)))


def duck_stopword_hits(words_expr: str, words: tuple[str, ...]) -> str:
    quoted = ", ".join("'" + w.replace("'", "''") + "'" for w in words)
    return f"len(list_filter({words_expr}, t -> t IN ({quoted})))"
