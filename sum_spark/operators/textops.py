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
from sum_spark.plans.scale import spread_for_compute
from sum_spark.functions.text import (
    LANG_STOPWORDS,
    SHINGLE_N,
    regex_quote,
    stopword_hits,
    tokens,
    word_shingles,
)


def _lang_hit_cols(toks: Column) -> list[Column]:
    return [stopword_hits(toks, words).cast("long") for _, words in LANG_STOPWORDS]


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-table language classifier: argmax of per-language stopword
    hits, ties broken by table order (en first). Output:
    (doc_id, pred_lang, hits).
    """
    df = spread_for_compute(df)
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


def quality_score_expr(toks) -> F.Column:
    """THE quality-score Column over a token-array column — the single
    expression both :func:`quality_score` and the incremental pipeline's
    stored doc meta (operators/pipeline._doc_meta) derive from, so the
    identical-expression-tree guarantee (stored scores == a full
    rebuild's, bit-for-bit) is structural rather than by copy (ADVICE
    r6): score = 0.5 * min(1, n_words/100) + 0.5 * (en_stopword_hits /
    n_words), rounded to 4."""
    n_words = F.size(toks).cast("long")
    en_hits = stopword_hits(toks, LANG_STOPWORDS[0][1]).cast("double")
    return F.round(
        F.least(F.lit(1.0), n_words.cast("double") / 100.0) * 0.5
        + (en_hits / n_words.cast("double")) * 0.5,
        4,
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality score: length saturation + stopword ratio.

    score = 0.5 * min(1, n_words/100) + 0.5 * (en_stopword_hits / n_words),
    rounded to 4. Output: (doc_id, n_words, stop_ratio, score).
    """
    df = spread_for_compute(df)
    toks = tokens(text_col)
    n_words = F.size(toks).cast("long")
    en_hits = stopword_hits(toks, LANG_STOPWORDS[0][1]).cast("double")
    stop_ratio = F.round(en_hits / n_words.cast("double"), 4)
    score = quality_score_expr(toks)
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("n_words"),
        stop_ratio.alias("stop_ratio"),
        score.alias("score"),
    ).orderBy("doc_id")


# BPE-style pre-tokenizer: letter runs, single digits, single punctuation
# marks — the split GPT-2-family tokenizers apply before merges. RE2/Java
# common syntax so Spark regexp_count and DuckDB regexp_extract_all agree.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"


def token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token statistics: whitespace tokens, distinct tokens, characters,
    and a BPE-pre-tokenizer count (letter runs / digits / punctuation —
    the length a GPT-2-family tokenizer sees before merges, a cheap upper
    bound on subword count). Output: (doc_id, n_tokens, n_distinct,
    n_chars, n_bpe)."""
    df = spread_for_compute(df)
    toks = tokens(text_col)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.length(text_col).cast("long").alias("n_chars"),
        F.regexp_count(F.col(text_col), F.lit(BPE_TOKEN_RE)).cast("long").alias("n_bpe"),
    ).orderBy("doc_id")


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic document fingerprint: md5 hex of the normalized text
    plus its 60-bit integer form (the portable hash used across the
    dedup family). Output: (doc_id, fp, fp60)."""
    df = spread_for_compute(df)
    norm = F.lower(F.trim(F.col(text_col)))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.md5(norm).alias("fp"),
        hash60(norm).alias("fp60"),
    ).orderBy("doc_id")


def text_profile(
    df: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokenized: DataFrame | None = None,
) -> DataFrame:
    """One-scan per-document profile combining every per-doc text signal:
    language ID (argmax stopword hits), token statistics, quality score,
    repetition signals, and the md5/60-bit fingerprints.

    Contract: documents with NULL text are EXCLUDED from the profile
    (they carry no text signal and every ratio would be NULL); callers
    joining the profile back to the corpus should left-join, or filter
    NULL text upstream as a hygiene stage.

    Composition of lang_id + token_count + quality_score +
    repetition_stats + fingerprint semantics in a single pass: the token
    array is staged once and every column derives from it (CollapseProject
    keeps the split materialized — it is non-cheap and multiply
    referenced), so a 100 TB corpus is profiled at scan speed instead of
    five separate scans. The only shuffle is the top-word count
    (explode + two-level groupBy), exactly as in repetition_stats.
    Output: (doc_id, pred_lang, hits, n_tokens, n_distinct, n_chars,
    n_bpe, stop_ratio, score, dup_word_frac, top_word_frac,
    dup_3gram_frac, fp, fp60) ordered.

    Pass ``tokenized`` — a (doc_id, __text, __w) frame, typically the
    PERSISTED shared tokenization the text_profile registry entry stages
    across all four of its components — and this function performs no
    scan or tokenize of its own (``df`` may then be None).
    """
    if tokenized is not None:
        words = tokenized.select(
            "doc_id", "__text", F.col("__w").alias("__words")
        )
    else:
        df = spread_for_compute(df)
        words = df.select(
            F.col(id_col).alias("doc_id"),
            F.col(text_col).alias("__text"),
            tokens(text_col).alias("__words"),
        )
    toks = F.col("__words")
    hits = _lang_hit_cols(toks)
    best = F.greatest(*hits)
    pred = F.lit(None).cast("string")
    for (lang, _), h in zip(reversed(LANG_STOPWORDS), reversed(hits)):
        pred = F.when(h == best, F.lit(lang)).otherwise(pred)
    n_long = F.size(toks).cast("long")
    n = F.size(toks).cast("double")
    en_hits = stopword_hits(toks, LANG_STOPWORDS[0][1]).cast("double")
    norm = F.lower(F.trim(F.col("__text")))
    n3 = F.greatest(F.size(toks) - (SHINGLE_N - 1), F.lit(0))
    base = words.select(
        "doc_id",
        pred.alias("pred_lang"),
        best.alias("hits"),
        n_long.alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.length("__text").cast("long").alias("n_chars"),
        F.regexp_count(F.col("__text"), F.lit(BPE_TOKEN_RE)).cast("long").alias("n_bpe"),
        F.round(en_hits / n, 4).alias("stop_ratio"),
        F.round(F.least(F.lit(1.0), n / 100.0) * 0.5 + (en_hits / n) * 0.5, 4).alias(
            "score"
        ),
        ((F.size(toks) - F.size(F.array_distinct(toks))).cast("double") / n).alias(
            "dup_word_frac"
        ),
        F.when(
            n3 > 0,
            (n3 - F.size(F.array_distinct(word_shingles(toks)))).cast("double")
            / n3.cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_3gram_frac"),
        F.md5(norm).alias("fp"),
        hash60(norm).alias("fp60"),
    )
    top = (
        words.select("doc_id", F.explode(toks).alias("__w"))
        .groupBy("doc_id", "__w")
        .agg(F.count("*").alias("__c"))
        .groupBy("doc_id")
        .agg(F.max("__c").alias("__mx"))
    )
    return (
        base.join(top, "doc_id")
        .withColumn("top_word_frac", F.col("__mx").cast("double") / F.col("n_tokens").cast("double"))
        .select(
            "doc_id", "pred_lang", "hits", "n_tokens", "n_distinct", "n_chars",
            "n_bpe", "stop_ratio", "score", "dup_word_frac", "top_word_frac",
            "dup_3gram_frac", "fp", "fp60",
        )
        .orderBy("doc_id")
    )


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
    ordered: bool = True,
) -> DataFrame:
    """Overlapping token-window chunking — the context-length prep step of
    a training pipeline (split each document into chunk_size-token windows
    every stride tokens; the final window may be shorter).

    Map-side only: sequence + posexplode + slice, no shuffle — row
    amplification is ~n_tokens/stride per document, streamed through the
    scan. Output: (doc_id, chunk_id, chunk_text, n_tokens) ordered.
    DuckDB twin: generate_series(1, len(w), stride) + list_slice.
    """
    df = spread_for_compute(df)
    if chunk_size < 1 or stride < 1:
        raise ValueError("chunk_size and stride must be >= 1")
    words = df.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("__words"))
    starts = words.select(
        "doc_id",
        "__words",
        F.posexplode(
            F.sequence(F.lit(1), F.size("__words"), F.lit(stride))
        ).alias("chunk_id", "__st"),
    )
    # Stage the sliced chunk before deriving text+count from it, so the
    # slice is evaluated once per chunk row (Catalyst would re-inline it
    # into each consumer).
    chunks = starts.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.slice("__words", F.col("__st"), F.lit(chunk_size)).alias("__chunk"),
    )
    return chunks.select(
        "doc_id",
        "chunk_id",
        F.array_join("__chunk", " ").alias("chunk_text"),
        F.size("__chunk").cast("long").alias("n_tokens"),
    ).transform(lambda d: d.orderBy("doc_id", "chunk_id") if ordered else d)


def chunk_by_lines(
    df: DataFrame,
    budget: int = 64,
    line_sep: str = "\n",
    text_col: str = "text",
    id_col: str = "doc_id",
    ordered: bool = True,
) -> DataFrame:
    """Boundary-aware chunking: pack CONSECUTIVE LINES (paragraphs) into
    chunks of ~``budget`` tokens without ever splitting a line — the
    retrieval/context-prep variant of chunk_documents (token windows cut
    mid-sentence; line chunks keep semantic units whole). Assignment
    follows the pack_sequences rule — chunk_id = floor(tokens-before /
    budget) over the doc's running line-token sum — so a single line
    longer than the budget still forms its own chunk (no line is ever
    split), and the rule has an exact SQL-window twin.

    Per-doc window over exploded lines (shuffle keyed by doc — the same
    shape as the profile's top-word count), then one (doc, chunk)
    reassembly groupBy. Output: (doc_id, chunk_id, chunk_text, n_tokens)
    ordered; NULL-text docs carry no lines and are excluded.
    """
    from pyspark.sql import Window as W

    if budget < 1:
        raise ValueError("budget must be >= 1")
    lines = spread_for_compute(df).select(
        F.col(id_col).alias("doc_id"),
        # line_sep is a LITERAL separator (reassembly + DuckDB twin treat
        # it literally); quote it for split's regex argument.
        F.posexplode(F.split(F.col(text_col), regex_quote(line_sep))).alias(
            "__idx", "__line"
        ),
    )
    ltok = lines.withColumn("__nt", F.size(F.split(F.col("__line"), " ")).cast("long"))
    w = W.partitionBy("doc_id").orderBy("__idx")
    cum = ltok.withColumn(
        "__before", F.coalesce(F.sum("__nt").over(w), F.lit(0)) - F.col("__nt")
    )
    assigned = cum.withColumn(
        "chunk_id", F.floor(F.col("__before") / F.lit(int(budget))).cast("long")
    )
    return (
        assigned.groupBy("doc_id", "chunk_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__idx", "__line"))),
                    lambda x: x["__line"],
                ),
                line_sep,
            ).alias("chunk_text"),
            F.sum("__nt").cast("long").alias("n_tokens"),
        )
        .transform(lambda d: d.orderBy("doc_id", "chunk_id") if ordered else d)
    )


def repetition_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition/boilerplate signals per document:

    - dup_word_frac: fraction of tokens that are repeats (1 - distinct/n)
    - top_word_frac: frequency of the most common token / n
    - dup_3gram_frac: fraction of word 3-grams that are repeats

    Array-side where possible (distinct counts — shuffle-free); the top
    token count is the word-count shape (explode + two-level groupBy),
    the honest distributed form at corpus scale. All ratios are SINGLE
    integer divisions — bit-identical across engines, no rounding needed.
    Output: (doc_id, n_tokens, dup_word_frac, top_word_frac,
    dup_3gram_frac) ordered.
    """
    df = spread_for_compute(df)
    words = df.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("__words"))
    base = words.select(
        "doc_id",
        F.size("__words").alias("__n"),
        F.size(F.array_distinct("__words")).alias("__d"),
        # 3-gram count is n - 2 arithmetically (no second shingle pass);
        # the shingle array itself is consumed exactly once (distinct).
        F.size(F.array_distinct(word_shingles(F.col("__words")))).alias("__d3"),
    )
    top = (
        words.select("doc_id", F.explode("__words").alias("__w"))
        .groupBy("doc_id", "__w")
        .agg(F.count("*").alias("__c"))
        .groupBy("doc_id")
        .agg(F.max("__c").alias("__mx"))
    )
    n = F.col("__n").cast("double")
    n3 = F.greatest(F.col("__n") - (SHINGLE_N - 1), F.lit(0))
    return (
        base.join(top, "doc_id")
        .select(
            "doc_id",
            F.col("__n").cast("long").alias("n_tokens"),
            ((F.col("__n") - F.col("__d")).cast("double") / n).alias("dup_word_frac"),
            (F.col("__mx").cast("double") / n).alias("top_word_frac"),
            F.when(
                n3 > 0, (n3 - F.col("__d3")).cast("double") / n3.cast("double")
            )
            .otherwise(F.lit(0.0))
            .alias("dup_3gram_frac"),
        )
        .orderBy("doc_id")
    )


# Conservative patterns shared with the DuckDB twin — RE2/Java-common
# syntax only (no lookaround/backrefs).
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_URL_RE = r"https?://[^ ]+"


URL_DOMAIN_RE = r"https?://([^/ ]+)"


def url_domain(col: Column | str) -> Column:
    """Lower-cased host of the FIRST URL in a text column ('' when none)
    — the key for domain-level corpus curation (per-domain stats,
    blocklist filtering, domain mixture caps). Identical semantics in
    DuckDB (duck twin below): both engines return '' on no match."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_extract(c, URL_DOMAIN_RE, 1))


def duck_url_domain(expr: str) -> str:
    return f"lower(regexp_extract({expr}, '{URL_DOMAIN_RE}', 1))"


def pii_scan(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """PII detection + scrubbing: counts of emails / IPv4s / URLs, the
    md5 of the scrubbed text (URLs replaced first — they may embed the
    other patterns — then emails, then IPs), and the first URL's
    lower-cased domain (the per-domain curation key). Single-pass column
    work. Output: (doc_id, n_emails, n_ips, n_urls, scrubbed_md5,
    domain) ordered.
    """
    df = spread_for_compute(df)
    t = F.col(text_col)
    scrub = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_URL_RE, "<URL>"), PII_EMAIL_RE, "<EMAIL>"
        ),
        PII_IPV4_RE,
        "<IP>",
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.regexp_count(t, F.lit(PII_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(PII_IPV4_RE)).cast("long").alias("n_ips"),
        F.regexp_count(t, F.lit(PII_URL_RE)).cast("long").alias("n_urls"),
        F.md5(scrub).alias("scrubbed_md5"),
        url_domain(t).alias("domain"),
    ).orderBy("doc_id")


# --- HTML -> text extraction (web-corpus ingest) ----------------------------
# Web pretraining corpora start as HTML; the extraction step (strip
# script/style, drop tags, decode entities, collapse whitespace) is the
# first stage of every CommonCrawl-style pipeline. Regexes are written
# for the RE2/Java common subset (no backreferences; (?s) inline dotall)
# so the transform is bit-identical in Spark and DuckDB — checked as
# q35_string_scalars' html column.
HTML_SCRIPT_RE = r"(?s)<script[^>]*>.*?</script>"
HTML_STYLE_RE = r"(?s)<style[^>]*>.*?</style>"
HTML_TAG_RE = r"<[^>]*>"
WS_RE = r"\s+"
# &amp; decodes LAST: '&amp;lt;' is the ESCAPED text '&lt;' and must not
# double-decode into '<'.
HTML_ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def html_to_text(col: Column | str) -> Column:
    """Expression: plain text extracted from an HTML column — script and
    style blocks removed (content and all), remaining tags replaced by a
    space (block boundaries must not glue words), the common entities
    decoded, whitespace collapsed, trimmed. Map-side; whole-stage
    codegen (chained regexp_replace/replace, no Python)."""
    c = F.col(col) if isinstance(col, str) else col
    # Block removal and tag stripping both substitute a SPACE: removed
    # boundaries must not glue adjacent words ('a<script>..</script>b'
    # is 'a b', not 'ab'); the trailing collapse absorbs the extras.
    c = F.regexp_replace(c, HTML_SCRIPT_RE, " ")
    c = F.regexp_replace(c, HTML_STYLE_RE, " ")
    c = F.regexp_replace(c, HTML_TAG_RE, " ")
    for ent, ch in HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(c, WS_RE, " "))


def duck_html_to_text(expr: str) -> str:
    """DuckDB twin of html_to_text (regexp_replace needs the explicit
    'g' flag there — it replaces only the first match by default)."""
    c = f"regexp_replace({expr}, '{HTML_SCRIPT_RE}', ' ', 'g')"
    c = f"regexp_replace({c}, '{HTML_STYLE_RE}', ' ', 'g')"
    c = f"regexp_replace({c}, '{HTML_TAG_RE}', ' ', 'g')"
    for ent, ch in HTML_ENTITIES:
        lit = ch.replace("'", "''")
        c = f"replace({c}, '{ent}', '{lit}')"
    return f"trim(regexp_replace({c}, '{WS_RE}', ' ', 'g'))"


def extract_html(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, text): the extracted plain text of each HTML document —
    the ingest front of the pipeline (feed the result to
    prepare_training_data). One map-side projection."""
    return df.select(
        F.col(id_col).alias("doc_id"), html_to_text(text_col).alias("text")
    )


def normalize_text(col: Column | str) -> Column:
    """Canonical text normalization for dedup/fingerprint preprocessing:
    lowercase, every non-alphanumeric run collapsed to a single space,
    trimmed. Written in the RE2/Java common regex subset (no classes
    DuckDB's RE2 lacks); the DuckDB twin is duck_normalize_text — note
    DuckDB regexp_replace needs the explicit 'g' flag (CLAUDE.md), Spark
    always replaces all."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "))


def duck_normalize_text(expr: str) -> str:
    return f"trim(regexp_replace(lower({expr}), '[^a-z0-9]+', ' ', 'g'))"
