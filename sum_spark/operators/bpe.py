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
