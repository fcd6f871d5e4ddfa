"""BPE tokenizer training + application — the missing half of the
token-counting story (textops counts tokens with a BPE-ish regex; this
trains an actual merge table and encodes with it).

No reference analog. The shape follows how production tokenizer training
actually distributes: the corpus collapses to a WORD-FREQUENCY table in
one distributed count (vocabulary-sized — orders of magnitude smaller
than the corpus, the only part that touches 100 TB), and the merge loop
runs over that table driver-side, exactly like HuggingFace tokenizers'
train-from-word-counts. Encoding fans back out as an Arrow-batched
pandas_udf with a per-batch word->pieces memo (corpora repeat words;
the memo makes encoding ~vocabulary-bound, not token-bound).

Everything is deterministic: ties in pair frequency break
lexicographically, so the merge table is a pure function of the word
counts — reproducible across runs, clusters, and samples shipped to the
driver in any order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sum_spark.functions.text import tokens

END = "▁"  # end-of-word sentinel appended as a distinct symbol


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over whitespace tokens — the one corpus-sized pass.
    NULL texts contribute nothing; empty-string tokens are kept (they
    tokenize to just the end-of-word sentinel)."""
    return (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def train_bpe(
    counts: DataFrame,
    num_merges: int = 100,
    max_vocab_rows: int = 2_000_000,
) -> list[tuple[str, str]]:
    """Classic BPE over a word-frequency table: start from characters
    (+ end sentinel), repeatedly merge the most frequent adjacent symbol
    pair (ties -> lexicographically smallest pair), ``num_merges`` times
    or until no pair repeats. Returns the ordered merge list.

    The collect is bounded by ``max_vocab_rows`` (a natural-language
    vocabulary is millions of rows at web scale — driver-sized by
    nature; the guard turns a mis-pointed corpus column into an error
    instead of an OOM)."""
    n = counts.limit(max_vocab_rows + 1).count()
    if n > max_vocab_rows:
        raise ValueError(
            f"train_bpe: word-count table exceeds max_vocab_rows={max_vocab_rows}; "
            "is the input really a word-frequency table?"
        )
    vocab = {r["word"]: int(r["cnt"]) for r in counts.collect()}
    words = {w: tuple(w) + (END,) for w in vocab}
    merges: list[tuple[str, str]] = []
    for _ in range(int(num_merges)):
        pairs: dict[tuple[str, str], int] = {}
        for w, syms in words.items():
            c = vocab[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        # Highest count; ties to the lexicographically SMALLEST pair
        # (tuple-of-strings order) — deterministic everywhere.
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        a, b = best[0]
        merges.append((a, b))
        ab = a + b
        new_words = {}
        for w, syms in words.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[w] = tuple(out)
        words = new_words
    return merges


def train_bpe_distributed(
    counts: DataFrame,
    num_merges: int = 100,
) -> list[tuple[str, str]]:
    """:func:`train_bpe` with the per-merge pair count DISTRIBUTED
    (VERDICT r7 #5): the word->symbols state lives as a Spark frame
    (word, cnt, syms), each merge runs ONE aggregation over it (explode
    adjacent pairs, weight by cnt, TakeOrdered-1 for the argmax — the
    driver sees one row per merge, never the vocabulary), and the
    chosen merge applies as a map-side array fold. The collected-dict
    trainer recounts pairs in O(merges x vocab) single-core Python;
    here that work is an executor aggregation, so web-scale
    vocabularies train without any max_vocab_rows guard or driver
    materialization.

    Merges are IDENTICAL to train_bpe's (unit-pinned): integer pair
    counts are layout-exact, ties break on the lexicographically
    smallest (a, b) — Spark's UTF8 binary string order equals Python's
    code-point tuple order (UTF-8 byte order preserves code points) —
    and the left-to-right non-overlapping merge application is the same
    fold. State lineage is truncated per merge with an eager
    localCheckpoint (vocab-sized), or the plan would deepen by one fold
    per merge and the 100th aggregation would pay 100 stacked
    projections."""
    # split(word, '') has no empty-string element for non-empty words
    # but yields [''] for the empty word — the Python trainer's tuple('')
    # is (), so the empty word is just the sentinel.
    syms0 = F.expr(
        f"CASE WHEN word = '' THEN array('{END}')"
        f" ELSE concat(split(word, ''), array('{END}')) END"
    )
    # localCheckpoint persists its RDD outside the DataFrame cache —
    # df.unpersist() does NOT release it, so a train would leave one
    # cached RDD per merge in the session (a query server leaks). Track
    # the ids THIS function creates by snapshotting the persistent-RDD
    # set around each eager checkpoint (the tightest window available —
    # a concurrent query persisting a frame in that instant could be
    # misattributed, but never a frame cached before or after the
    # checkpoint call), and release only those on return.
    jsc = counts.sparkSession.sparkContext._jsc

    def _ids() -> set[int]:
        return {int(i) for i in jsc.getPersistentRDDs().keySet().toArray()}

    ours: set[int] = set()

    def _checkpoint(df: DataFrame) -> DataFrame:
        pre = _ids()
        out = df.localCheckpoint(True)
        ours.update(_ids() - pre)
        return out

    state = _checkpoint(
        counts.select(F.col("cnt").cast("long").alias("cnt"), syms0.alias("syms"))
    )
    merges: list[tuple[str, str]] = []
    # adjacent pairs: element j with element j+1 ([] is 0-BASED in
    # Spark SQL; transform's i counts from 0 over the first n-1 slice)
    pair_counts = (
        "transform(slice(syms, 1, size(syms) - 1),"
        " (s, i) -> struct(s AS a, syms[i + 1] AS b))"
    )
    try:
        for _ in range(int(num_merges)):
            best = (
                state.where(F.expr("size(syms) > 1"))
                .select(F.explode(F.expr(pair_counts)).alias("p"), "cnt")
                .groupBy("p.a", "p.b")
                .agg(F.sum("cnt").alias("n"))
                .orderBy(F.col("n").desc(), "a", "b")
                .limit(1)
                .collect()
            )
            if not best or int(best[0]["n"]) < 2:
                break
            a, b = best[0]["a"], best[0]["b"]
            merges.append((a, b))
            a_sql = a.replace("\\", "\\\\").replace("'", "\\'")
            b_sql = b.replace("\\", "\\\\").replace("'", "\\'")
            # left-to-right non-overlapping replacement of adjacent
            # (a, b) with their concatenation — the train_bpe loop as a
            # fold: merge iff the accumulator's LAST element is a and
            # the incoming one is b (a merged element never re-matches
            # a: that would need b = '').
            apply_sql = (
                "aggregate(slice(syms, 2, size(syms) - 1), array(syms[0]),"
                " (acc, x) -> CASE"
                f" WHEN element_at(acc, -1) = '{a_sql}' AND x = '{b_sql}'"
                f" THEN concat(slice(acc, 1, size(acc) - 1),"
                f" array('{a_sql}{b_sql}'))"
                " ELSE concat(acc, array(x)) END)"
            )
            state = _checkpoint(
                state.select(
                    "cnt",
                    F.expr(
                        f"CASE WHEN size(syms) > 1 THEN {apply_sql}"
                        " ELSE syms END"
                    ).alias("syms"),
                )
            )
    finally:
        mp = jsc.getPersistentRDDs()
        for rid in list(mp.keySet().toArray()):
            if int(rid) in ours:
                mp.get(rid).rdd().unpersist(False)
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a trained merge table: (doc_id, n_words, n_pieces, pieces)
    where pieces is the space-joined BPE segmentation of the document.
    Arrow-batched with a word->pieces memo per batch; merges ship in the
    task closure (they are the tokenizer — a few thousand entries).
    NULL text encodes to (0, 0, '')."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ranks = {tuple(m): i for i, m in enumerate(merges)}

    def _enc(texts):
        memo: dict[str, list[str]] = {}
        out = []
        for t in texts:
            if t is None:
                out.append((0, 0, ""))
                continue
            ws = t.split(" ")
            pieces: list[str] = []
            for w in ws:
                got = memo.get(w)
                if got is None:
                    got = _encode_word(w, ranks)
                    memo[w] = got
                pieces.extend(got)
            out.append((len(ws), len(pieces), " ".join(pieces)))
        return pd.DataFrame(out, columns=["n_words", "n_pieces", "pieces"])

    _enc.__annotations__ = {"texts": pd.Series, "return": pd.DataFrame}
    enc = pandas_udf(_enc, "n_words long, n_pieces long, pieces string")
    return (
        df.select(F.col(id_col).alias("doc_id"), enc(F.col(text_col)).alias("e"))
        .select("doc_id", "e.n_words", "e.n_pieces", "e.pieces")
        .orderBy("doc_id")
    )
