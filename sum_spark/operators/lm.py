"""Corpus n-gram language-model scoring — the CCNet-style quality
signal: train bigram counts on a (clean) corpus, score every document by
its mean bigram negative log-likelihood; high-NLL docs are gibberish,
boilerplate soup, or the wrong language, and get filtered or
down-weighted before training.

No reference analog (the reference has no corpus-level text statistics);
this is the quality-filtering extension of the LLM-pipeline layer.

Spark shape: ONE tokenize pass feeds the count aggregates (bigram
counts, then w1 totals derived FROM the bigram table — never a second
corpus scan); scoring is an equi-join of exploded doc bigrams against
the count table (many-to-one: the counts side has one row per distinct
bigram, so hot bigrams like "of the" skew nothing — each probe row
matches exactly once), then one per-doc integer sum.

Reproducibility: the per-bigram NLL is quantized to integer micro-nats
(floor(-ln(p)*1e6 + 0.5)) BEFORE the cross-row per-doc sum — summing
doubles across rows follows partition order (CLAUDE.md), integer sums
are exact on any layout and engine. p = (c12 + 1)/(c1 + V) is a ratio
of exact integers (add-one smoothing over the vocabulary), so both
engines evaluate ln() on bit-identical inputs; a quantization-boundary
flip would need ln's last-ulp disagreement to land within one ulp of a
0.5e-6 boundary (measure-zero; pinned by the sf0.01 hash check).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sum_spark.functions.text import tokens


def _doc_bigrams(
    df: DataFrame | None,
    text_col: str,
    id_col: str,
    words: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, w1, w2) — one row per bigram OCCURRENCE. NULL/short texts
    contribute no rows (split(NULL) explodes to nothing, single-word docs
    have no bigram), matching the SQL twin's unnest semantics. Pass
    ``words`` — a (doc_id, __w) frame — to skip the tokenize."""
    if words is not None:
        w = words.select("doc_id", "__w")
    else:
        w = df.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("__w"))
    # size(split(NULL)) is NULL on Spark 3.0+ defaults (legacy sizeOfNull
    # off — NOT -1; no compensation needed) and sequence(1, 0) DESCENDS —
    # the >= 2 filter drops both NULL and single-word docs in one predicate.
    w = w.where(F.size("__w") >= 2)
    return w.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(__w) - 1), i -> struct(__w[i-1] AS w1, __w[i] AS w2))"
            )
        ).alias("g"),
    ).select("doc_id", F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))


def bigram_lm(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, int]:
    """Train: returns (counts, vocab_size). ``counts`` is one row per
    distinct bigram: (w1, w2, c12, c1) where c1 = total bigram
    occurrences starting with w1 (derived from the bigram table via a
    window-style re-aggregation, NOT a second corpus pass). vocab_size
    is the distinct word-type count — the add-one smoothing denominator.

    At 100 TB the counts table is vocabulary-sized (orders of magnitude
    smaller than the corpus); write it out once and score any corpus
    against it (the train/apply split scoring real pipelines use).
    """
    bg = _doc_bigrams(df, text_col, id_col)
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    counts = c12.join(c1, "w1").select("w1", "w2", "c12", "c1")
    v = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .agg(F.countDistinct("w").alias("v"))
        .collect()[0]["v"]
    )
    return counts, int(v)


def lm_score(
    df: DataFrame,
    counts: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document against a trained bigram LM: one row per doc,
    (doc_id, n_bigrams, nll_micro) where nll_micro is the BIGINT sum of
    per-bigram micro-nat NLLs under add-one smoothing — unseen bigram
    (or unseen w1) degrades to p = 1/(c1 + V) resp. 1/V via the left
    join's zero fill. Mean NLL = nll_micro / n_bigrams / 1e6; perplexity
    = exp of that (left to the consumer — derived doubles aren't stored).
    Docs with < 2 tokens (or NULL text) score (0, 0).
    """
    bg = _doc_bigrams(df, text_col, id_col)
    return _score_bigrams(df, bg, counts, int(vocab_size), id_col)


def _score_bigrams(
    df: DataFrame, bg: DataFrame, counts: DataFrame, vocab_size: int, id_col: str
) -> DataFrame:
    # TWO left joins, not one: an unseen bigram whose first word IS
    # attested must still smooth against that word's continuation total
    # (p = 1/(c1 + V)), so c1 resolves at the w1 level independently of
    # the bigram hit. Self-scoring never exercises the difference (every
    # scored bigram was trained on) — test_lm's train/apply split does.
    small = _is_small(counts)
    c12_tab = counts.select("w1", "w2", "c12")
    c1_tab = counts.select("w1", "c1").distinct()
    joined = bg.join(F.broadcast(c12_tab) if small else c12_tab, ["w1", "w2"], "left").join(
        F.broadcast(c1_tab) if small else c1_tab, ["w1"], "left"
    )
    p = F.col("__n") / F.col("__d")
    nll = F.floor(-F.log(p) * 1000000 + F.lit(0.5)).cast("long")
    per = (
        joined.select(
            "doc_id",
            (F.coalesce(F.col("c12"), F.lit(0)) + 1).cast("double").alias("__n"),
            (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(int(vocab_size))).cast("double").alias("__d"),
        )
        .select("doc_id", nll.alias("__nll"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_bigrams"), F.sum("__nll").alias("nll_micro"))
    )
    ids = df.select(F.col(id_col).alias("doc_id")).distinct()
    return (
        ids.join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("nll_micro", F.lit(0)).cast("long").alias("nll_micro"),
        )
        .orderBy("doc_id")
    )


def _is_small(counts: DataFrame) -> bool:
    """Broadcast the count table when the optimizer's size estimate fits
    the default broadcast threshold — a corpus-trained vocabulary often
    does at test scale; at real scale the estimate exceeds it and the
    join falls back to a plain shuffled hash join (still many-to-one)."""
    from sum_spark.plans.scale import is_broadcastable

    return is_broadcastable(counts)


def score_self(
    df: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokenized: DataFrame | None = None,
) -> DataFrame:
    """Convenience: train on ``df`` and score ``df`` (the registry's
    checked configuration). Production pipelines train on a clean
    reference corpus instead — call bigram_lm + lm_score directly.

    The bigram table is tokenized ONCE and persisted: counts and scoring
    both read it (calling bigram_lm + lm_score separately re-tokenizes
    the corpus — at 100 TB the text scan is the cost that matters). The
    cache's lifetime is tied to the returned plan (release_with).

    Pass ``tokenized`` — a (doc_id, __w) frame, typically the persisted
    shared tokenization of text_profile's one-scan contract — and the
    bigram/vocab/id passes all read it instead of re-scanning ``df``
    (which may then be None)."""
    from sum_spark.plans.scale import release_with

    bg = _doc_bigrams(df, text_col, id_col, words=tokenized).persist()
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    counts = c12.join(c1, "w1").select("w1", "w2", "c12", "c1")
    if tokenized is not None:
        word_src = tokenized.select(F.explode("__w").alias("w"))
        ids_src, ids_col = tokenized, "doc_id"
    else:
        word_src = df.select(F.explode(tokens(text_col)).alias("w"))
        ids_src, ids_col = df, id_col
    v = word_src.agg(F.countDistinct("w").alias("v")).collect()[0]["v"]
    out = _score_bigrams(ids_src, bg, counts, int(v), ids_col)
    return release_with(out, bg)
