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
    tokenized: DataFrame | None = None,
) -> DataFrame:
    """Top-k documents by BM25(k1=1.2, b=0.75) for the given terms.

    idf(t) = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))   (Lucene form)
    score  = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    Output: (rank, doc_id, score) — score rounded to 4, ties broken by
    doc_id, zero-score documents excluded.

    ``tokenized`` — a (doc_id, __w) frame, typically persisted — skips
    the tokenize scan (the textops shared-scan contract): callers
    running several token consumers over one corpus tokenize once.
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    if tokenized is not None:
        words = tokenized.select("doc_id", "__w", F.size("__w").alias("__dl"))
    else:
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


def duck_bm25_sql(terms: list[str], k: int = 10, source: str = "documents") -> str:
    """DuckDB twin of bm25_search over the ``documents`` view (or any
    CTE/relation named by ``source`` exposing (doc_id, text)), generated
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
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM {source}),
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


# ---------------------------------------------------------------------------
# Inverted index — stored posting lists, BM25 served from the index
# ---------------------------------------------------------------------------

II_BUCKETS = 64


def _term_bucket(term: F.Column, n_buckets: int = II_BUCKETS) -> F.Column:
    # Engine-internal partition key (never oracle-checked): xxhash64,
    # not md5 (CLAUDE.md hash-key rule).
    return F.pmod(F.xxhash64(term), F.lit(n_buckets)).cast("int")


def build_inverted_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokenized: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The three frames of a text inverted index:

    - postings (term, doc_id, tf, dl): one row per distinct term per
      document — the posting lists, with the document length
      denormalized so scoring never joins back to the corpus;
    - terms (term, df): per-term document frequency;
    - meta (n, sum_dl): corpus size and total token count, from which
      avgdl derives exactly (integer sum, one double division).

    This is the lexical twin of the IVF index (similarity.py): the
    corpus tokenization happens ONCE at build time, and a query then
    touches only its terms' postings instead of re-tokenizing 100 TB
    per search. n/sum_dl come from the DOCUMENT frame (a zero-token
    document has no postings but still counts toward N and avgdl).
    """
    if tokenized is not None:
        words = tokenized.select("doc_id", F.size("__w").alias("dl"), F.col("__w"))
    else:
        words = df.select(
            F.col(id_col).alias("doc_id"), tokens(text_col).alias("__w")
        ).select("doc_id", F.size("__w").alias("dl"), F.col("__w"))
    postings = (
        words.select("doc_id", "dl", F.explode("__w").alias("term"))
        .groupBy("term", "doc_id", "dl")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    terms = postings.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    meta = words.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("dl").cast("long").alias("sum_dl"),
    )
    return postings, terms, meta


def _write_index_frames(
    postings: DataFrame,
    terms: DataFrame,
    meta: DataFrame,
    path: str,
    n_buckets: int,
    mode: str,
    sub: str = "",
) -> None:
    """Common write path for build/append/retire: postings and terms go
    out PARTITIONED BY the term-hash bucket (queries prune to their
    terms' buckets via PartitionFilters), postings term-sorted within
    partitions (row-group pruning via PushedFilters). ``sub`` nests the
    frames one level down (e.g. ``/batch_id=-1`` for maintenance writes
    into a batch-laid-out index — parquet partition discovery requires
    every leaf at the same depth, so flat and batch layouts must never
    mix under one family dir)."""
    (
        postings.withColumn("bucket", _term_bucket(F.col("term"), n_buckets))
        .repartition("bucket")
        .sortWithinPartitions("term", "doc_id")
        .write.partitionBy("bucket")
        .parquet(f"{path}/postings{sub}", mode=mode)
    )
    (
        terms.withColumn("bucket", _term_bucket(F.col("term"), n_buckets))
        .write.partitionBy("bucket")
        .parquet(f"{path}/terms{sub}", mode=mode)
    )
    meta.write.mode(mode).parquet(f"{path}/meta{sub}")


def write_inverted_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = II_BUCKETS,
) -> None:
    """Persist the inverted index PARTITIONED BY a term-hash bucket —
    the write-time half of the contract: a query's scan reads only the
    buckets its terms hash to (PartitionFilters), and within a bucket
    the term equality predicate prunes row groups (PushedFilters,
    postings are written sorted by term). Layout mirrors write_ivf_index:
    <path>/postings, <path>/terms (both bucketed), <path>/meta (1 row).
    """
    postings, terms, meta = build_inverted_index(df, text_col, id_col)
    _write_index_frames(postings, terms, meta, path, n_buckets, "overwrite")


def _bm25_over_postings(
    matched: DataFrame,
    terms: list[str],
    dfs: dict[str, int],
    n: int,
    sum_dl: int,
    k: int,
) -> DataFrame:
    """Score matched posting rows (term, doc_id, tf, dl) with the SAME
    fixed left-associative per-term chain as bm25_search — matched terms
    pivot to fixed per-term tf columns first, so double addition order
    is identical and the two paths agree to the last bit."""
    pivoted = matched.groupBy("doc_id", "dl").agg(
        *[
            F.max(F.when(F.col("term") == F.lit(t), F.col("tf"))).alias(f"__tf{i}")
            for i, t in enumerate(terms)
        ]
    )
    avgdl = F.lit(sum_dl).cast("double") / F.lit(n)
    score: Column | None = None
    for i, t in enumerate(terms):
        dft = F.lit(dfs.get(t, 0))
        idf = F.log(F.lit(1) + (F.lit(n) - dft + F.lit(0.5)) / (dft + F.lit(0.5)))
        tf = F.coalesce(F.col(f"__tf{i}"), F.lit(0)).cast("double")
        denom = tf + F.lit(BM25_K1) * (
            F.lit(1) - F.lit(BM25_B) + F.lit(BM25_B) * F.col("dl") / avgdl
        )
        contrib = idf * (tf * (F.lit(BM25_K1) + F.lit(1))) / denom
        score = contrib if score is None else score + contrib
    ranked = (
        pivoted.select("doc_id", score.alias("__score"))
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


def _collect_stats(
    terms_df: DataFrame, meta: DataFrame, terms: list[str]
) -> tuple[dict[str, int], int, int]:
    """Bounded collects (<= len(terms) * appends + appends rows — the
    knn probe-bucket pattern): per-query-term document frequencies and
    the corpus meta, inlined as literals into the scoring expression.
    Both frames are read as MERGEABLE PARTIALS (summed here), so
    append_to_inverted_index can add delta rows without rewriting —
    the same merge-at-read contract as the streaming sketches."""
    dfs: dict[str, int] = {}
    for r in terms_df.where(F.col("term").isin(terms)).collect():
        dfs[r["term"]] = dfs.get(r["term"], 0) + r["df"]
    [m] = meta.agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("sum_dl").cast("long").alias("sum_dl"),
    ).collect()
    return dfs, m["n"], m["sum_dl"]


def bm25_postings_search(
    df: DataFrame,
    terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokenized: DataFrame | None = None,
) -> DataFrame:
    """BM25 through an in-flight inverted index: build the posting
    frames, then score only rows whose term is in the query. Returns
    exactly bm25_search's rows — the equality the registry leg checks;
    the point of the path is that tf/df/dl come from the POSTINGS
    representation (what a stored index serves), not from re-tokenizing
    every document per query."""
    if not terms:
        raise ValueError("terms must be non-empty")
    postings, terms_df, meta = build_inverted_index(
        df, text_col, id_col, tokenized=tokenized
    )
    dfs, n, sum_dl = _collect_stats(terms_df, meta, terms)
    matched = postings.where(F.col("term").isin(terms))
    return _bm25_over_postings(matched, terms, dfs, n, sum_dl, k)


def _ii_generation(path: str) -> tuple:
    """On-disk generation fingerprint of an inverted index — the
    pq_serve_context pattern (similarity._index_generation) adapted to
    the II layout: flat-layout maintenance appends files INSIDE existing
    ``bucket=`` dirs (which leaves the family dir's own mtime untouched),
    so the fingerprint stats each family's immediate children — bucket=/
    batch_id= dirs and meta files — whose mtimes every engine mutation
    (build, append, retire, compaction's staged swap) does update."""
    import os

    ents: list[tuple] = []
    for fam in _II_FAMILIES:
        d = os.path.join(path, fam)
        try:
            for n in sorted(os.listdir(d)):
                st = os.stat(os.path.join(d, n))
                ents.append((fam, n, st.st_mtime_ns, st.st_size))
        except OSError:
            ents.append((fam, "missing"))
    return tuple(ents)


# (session id, index realpath) -> {"gen", "spark", "postings", "terms",
# "meta", "stats": {(terms...): (dfs, n, sum_dl)}}. Serving state for
# REPEATED queries of one stored index: the three schema-discovery reads
# (~100 ms each) and the two bounded stats collects are invariant while
# the index is unchanged, and a query service pays them per request
# without this (measured via the BENCH_LEGS construct split, VERDICT r8
# #4/#7). Invalidated by the generation fingerprint; holds the session
# strongly (the load_table memo aliasing rule); FIFO-bounded.
_II_SERVE_MEMO: dict[tuple, dict] = {}
_II_SERVE_MEMO_MAX = 32
_II_STATS_MEMO_MAX = 256


def _ii_serve_ctx(spark, path: str) -> dict:
    import os

    key = (id(spark), os.path.realpath(path))
    gen = _ii_generation(path)
    ctx = _II_SERVE_MEMO.get(key)
    if ctx is not None and ctx["spark"] is spark and ctx["gen"] == gen:
        return ctx
    ctx = {
        "spark": spark,
        "gen": gen,
        "postings": spark.read.parquet(f"{path}/postings"),
        "terms": spark.read.parquet(f"{path}/terms"),
        "meta": spark.read.parquet(f"{path}/meta"),
        "stats": {},
    }
    while len(_II_SERVE_MEMO) >= _II_SERVE_MEMO_MAX:
        _II_SERVE_MEMO.pop(next(iter(_II_SERVE_MEMO)))
    _II_SERVE_MEMO[key] = ctx
    return ctx


def bm25_from_index(
    spark,
    path: str,
    terms: list[str],
    k: int = 10,
    n_buckets: int = II_BUCKETS,
) -> DataFrame:
    """BM25 against a write-time inverted index (write_inverted_index):
    the query terms' buckets become a LITERAL isin filter on the
    partition column, so the scan reads ONLY those buckets' files
    (PartitionFilters — asserted in tests) and the term predicate
    prunes row groups within them (PushedFilters, term-sorted layout).
    Results equal bm25_search / bm25_postings_search exactly.

    Per-query driver cost is O(terms): buckets are computed DRIVER-SIDE
    (hashing.xxh64_str is bit-equal to the engine's xxhash64 — no
    planning job), and the index reads + per-term stats collects are
    memoized per (session, index, generation) via _ii_serve_ctx."""
    if not terms:
        raise ValueError("terms must be non-empty")
    from sum_spark.functions.hashing import xxh64_str

    buckets = sorted({xxh64_str(t) % n_buckets for t in terms})
    prune = F.col("bucket").isin(buckets) & F.col("term").isin(terms)
    ctx = _ii_serve_ctx(spark, path)
    # Posting rows are MERGEABLE PARTIALS, same contract as terms/meta:
    # append_to_inverted_index adds positive rows, retire_from_inverted_
    # index adds negated ones. Summing per (term, doc_id) nets deletions
    # out exactly; tf <= 0 means the doc no longer contains the term.
    # The groupBy touches only the query terms' pruned rows.
    matched = (
        ctx["postings"]
        .where(prune)
        .groupBy("term", "doc_id")
        .agg(
            F.sum("tf").cast("long").alias("tf"),
            F.sum("dl").cast("int").alias("dl"),
        )
        .where(F.col("tf") > 0)
    )
    # _collect_stats is order-insensitive, so key on the SORTED term set
    # (an order-sensitive key multiplies entries for the same set), and
    # FIFO-bound the memo like _II_SERVE_MEMO — a long-running query
    # service with many distinct term sets must not grow driver memory
    # for the lifetime of an index generation.
    stats_key = tuple(sorted(set(terms)))
    if stats_key not in ctx["stats"]:
        while len(ctx["stats"]) >= _II_STATS_MEMO_MAX:
            ctx["stats"].pop(next(iter(ctx["stats"])))
        ctx["stats"][stats_key] = _collect_stats(
            ctx["terms"].where(prune), ctx["meta"], terms
        )
    dfs, n, sum_dl = ctx["stats"][stats_key]
    return _bm25_over_postings(matched, terms, dfs, n, sum_dl, k)


def _maint_sub(batch_dir: int | None) -> tuple[str, str]:
    """(sub-path, write mode) for a maintenance write — the ONE place
    the batch-layout rule lives (similarity.py's index maintenance
    imports it). ``batch_dir`` targets a BATCH-LAID-OUT index (one
    written by the streaming sinks, or compacted with
    keep_batch_layout=True): partials land under
    ``batch_id=<batch_dir>`` so every parquet leaf stays at the same
    depth (flat and batch layouts must never mix — the read fails).
    Use a NEGATIVE id unique to the operation: stream checkpoints only
    ever commit ids >= 0, so no future micro-batch can collide, and the
    overwrite mode makes RE-RUNNING the same operation idempotent
    (distinct operations need distinct ids)."""
    if batch_dir is None:
        return "", "append"
    return f"/batch_id={int(batch_dir)}", "overwrite"


def _batch_fold_plan(
    scan_dir: str, checkpoint: str | None, partial: bool = False
) -> tuple[str, list[int]]:
    """The fold plan of a keep_batch_layout compaction:
    ``(fold sub-path, pending batch ids to leave untouched)``.

    The fold target is the highest FOLDABLE batch id present under
    ``scan_dir``. SAFETY: folding a batch the stream has WRITTEN but not
    yet COMMITTED is silent data loss — on resume the checkpoint
    redelivers that batch and the sink's idempotent overwrite replaces
    the folded directory with one micro-batch's rows. At most the
    highest-id batches can be in that state (commits are sequential), so
    when ``checkpoint`` is given, the sink's commit log
    (``<checkpoint>/commits``) is consulted; on-disk ids above the last
    committed one either abort the compaction (``partial=False``:
    resume the stream to commit, stop cleanly, compact again) or —
    ``partial=True`` (VERDICT r6 #3) — are returned as ``pending`` so
    the caller folds only the COMMITTED PREFIX and carries the tail
    dirs through the swap untouched: compaction stays available for a
    crash-prone long-lived stream, and the redelivery still lands in
    its own directory on resume. Without ``checkpoint`` the caller owns
    the clean-termination guarantee (an availableNow query that
    returned from awaitTermination has committed every batch it wrote)
    and ``partial`` has nothing to act on.

    An index with NO ``batch_id=*`` dirs is flat (never streamed) —
    folding it "into batch layout" would irreversibly change its layout
    class, so that's an error directing the caller to the default flat
    compaction (ADVICE r6)."""
    import os

    ids = [
        int(n.split("=", 1)[1])
        for n in os.listdir(scan_dir)
        if n.startswith("batch_id=")
    ]
    if not ids:
        raise ValueError(
            f"no batch_id=* dirs under {scan_dir}: this index is flat — "
            "use the default flat compaction (keep_batch_layout=False)"
        )
    if partial and checkpoint is None:
        raise ValueError(
            "partial=True needs the stream's checkpoint to know which "
            "batches are committed"
        )
    pending: list[int] = []
    if checkpoint is not None:
        commits_dir = os.path.join(checkpoint, "commits")
        committed = [
            int(n) for n in os.listdir(commits_dir) if n.isdigit()
        ] if os.path.isdir(commits_dir) else []
        top = max(committed, default=-1)
        pending = sorted(i for i in ids if i > top)
        if pending and not partial:
            raise ValueError(
                f"batch dirs {pending} are newer than the last "
                f"committed micro-batch ({top}): the stream stopped "
                "mid-batch; resume it to commit, stop cleanly, then "
                "compact — or pass partial=True to fold the committed "
                "prefix and leave the tail in place"
            )
    foldable = [i for i in ids if i not in set(pending)]
    if not foldable:
        raise ValueError(
            "every batch dir is newer than the last committed "
            "micro-batch — nothing committed to fold"
        )
    return f"/batch_id={max(foldable)}", pending


def _batch_fold_sub(scan_dir: str, checkpoint: str | None) -> str:
    """Refuse-on-pending form of :func:`_batch_fold_plan` (the
    pre-partial-fold surface, kept for callers that fold everything)."""
    return _batch_fold_plan(scan_dir, checkpoint, partial=False)[0]


def append_to_inverted_index(
    new_docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = II_BUCKETS,
    batch_dir: int | None = None,
) -> None:
    """O(delta) index maintenance: tokenize ONLY the arriving documents
    and append their posting/df/meta rows — the indexed corpus is never
    re-read or re-tokenized (the append_to_pq_index contract for the
    lexical index). Correct without any rewrite because the read side
    treats terms and meta as mergeable partials: df sums across appended
    rows per term, n/sum_dl sum across meta rows (_collect_stats).
    Callers own id uniqueness, exactly as with any parquet append.
    ``batch_dir`` (negative, per-operation) targets a batch-laid-out
    index — see _maint_sub."""
    postings, terms, meta = build_inverted_index(new_docs, text_col, id_col)
    sub, mode = _maint_sub(batch_dir)
    _write_index_frames(postings, terms, meta, path, n_buckets, mode, sub)


def retire_from_inverted_index(
    old_docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = II_BUCKETS,
    batch_dir: int | None = None,
) -> None:
    """O(delta) index DELETION: deletion as NEGATION of the mergeable
    partials. ``old_docs`` must carry the retired documents with the
    text that was indexed (the previous snapshot's rows — exactly what
    snapshot_diff's 'removed'/'changed' ids select from the old
    snapshot); their posting/df/meta partials are appended NEGATED, so
    the read-side merge (bm25_from_index sums tf/dl per (term, doc_id),
    _collect_stats sums df/n/sum_dl) cancels them exactly: a removed
    doc's tf sums to 0 and is dropped, a changed doc re-appended via
    append_to_inverted_index nets out to its new-text partials, and the
    corpus stats equal a from-scratch rebuild bit-for-bit. The indexed
    corpus is never re-read; compact_inverted_index folds tombstone
    partials into base files offline without changing any query result.
    ``batch_dir`` (negative, per-operation) targets a batch-laid-out
    index — see _maint_sub.
    """
    postings, terms, meta = build_inverted_index(old_docs, text_col, id_col)
    sub, mode = _maint_sub(batch_dir)
    _write_index_frames(
        postings.select(
            "term",
            "doc_id",
            (-F.col("tf")).alias("tf"),
            (-F.col("dl")).alias("dl"),
        ),
        terms.select("term", (-F.col("df")).alias("df")),
        meta.select((-F.col("n")).alias("n"), (-F.col("sum_dl")).alias("sum_dl")),
        path,
        n_buckets,
        mode,
        sub,
    )


_II_FAMILIES = ("postings", "terms", "meta")


def _finish_index_swap(path: str, tmp: str) -> None:
    """Swap the compacted family dirs into place. Idempotent: a family
    whose ``tmp`` copy is gone was already swapped by an earlier
    (crashed) attempt and is skipped, so re-running after a crash at
    ANY point of the loop completes the remaining renames. The ``tmp``
    dir (with its ``_DONE`` marker) is removed only at the very end —
    its presence is what tells a re-run the merged data is durable."""
    import os
    import shutil

    for fam in _II_FAMILIES:
        src = os.path.join(tmp, fam)
        dst = os.path.join(path, fam)
        if not os.path.isdir(src):
            continue  # already swapped before a crash
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        os.rename(src, dst)
    shutil.rmtree(tmp)


def compact_inverted_index(
    spark,
    path: str,
    n_buckets: int = II_BUCKETS,
    keep_batch_layout: bool = False,
    checkpoint: str | None = None,
    partial: bool = False,
) -> dict:
    """Fold an index's accumulated partials into canonical base files —
    the background compaction retire_from_inverted_index's contract
    defers to. Query results are UNCHANGED by construction: the read
    side already nets partials per key (bm25_from_index sums tf/dl per
    (term, doc_id), _collect_stats sums df/n/sum_dl), and compaction
    materializes exactly those sums — positive appends net against
    negated tombstones, rows netting to tf <= 0 / df <= 0 disappear,
    and the meta collapses to one row. What changes is the COST: a
    long-lived index accumulates one file set per append/retire (or,
    for streaming_index_documents, one ``batch_id=N`` directory per
    micro-batch), so every query's pruned scan opens ever more files;
    after compaction the layout is exactly write_inverted_index's —
    one bucketed, term-sorted file set.

    This is also the SNAPSHOT-BOUNDARY step of the streaming story
    (streaming/state.py): the stream itself is append-only; at a
    snapshot boundary, stop the stream, compact, apply snapshot_diff's
    retirements with retire_from_inverted_index, resume. Parquet
    partition discovery rejects MIXED layouts (flat ``bucket=`` dirs
    next to ``batch_id=N/bucket=`` dirs fail to read), so the two
    endgames are:

    - ``keep_batch_layout=False`` (default): normalize into the flat
      write_inverted_index layout — the HANDOFF to pure batch
      maintenance (plain retire/append). The stream must NOT resume on
      this path afterwards.
    - ``keep_batch_layout=True``: fold everything into
      ``batch_id=<max id>``, manual-maintenance dirs (negative ids)
      included. The stream CAN resume — a restarted checkpoint only
      redelivers batches it never COMMITTED, so pass the stream's
      ``checkpoint`` and the compaction refuses if the stream stopped
      mid-batch (folding an uncommitted batch would be silently
      overwritten by its redelivery — see _batch_fold_plan); with
      ``partial=True`` it instead folds the COMMITTED PREFIX and
      carries the uncommitted tail dirs through the swap untouched
      (VERDICT r6 #3) — compaction stays available however often the
      stream crashes, and the resumed stream's redelivery overwrites
      exactly its own tail dir. Without ``checkpoint`` the caller owns
      the clean-termination guarantee. Snapshot retirements/appends
      target the batch layout via their ``batch_dir`` (negative id)
      parameter.

    Run OFFLINE (no concurrent writer). Crash-safe the same way as
    streaming/compact.compact_batches: the netted frames land under
    ``<path>/_compacted`` (an underscore dir — invisible to readers)
    with a ``_DONE`` marker before anything is deleted, so a re-run
    after a crash mid-swap just finishes the renames.

    Returns {"n_docs", "postings_rows"} of the compacted index.
    """
    import os
    import shutil

    tmp = os.path.join(path, "_compacted")
    done = os.path.join(tmp, "_DONE")
    if os.path.isfile(done):
        # Crash happened mid-swap: merged data is durable (the marker is
        # written strictly after it), some old dirs may already be gone —
        # finishing the renames is the only safe move.
        _finish_index_swap(path, tmp)
    elif os.path.isdir(tmp):
        shutil.rmtree(tmp)  # incomplete earlier attempt; merged data not
        # yet durable, old partials untouched — safe to redo from scratch
        return compact_inverted_index(
            spark, path, n_buckets, keep_batch_layout, checkpoint, partial
        )
    else:
        sub, pending = "", []
        if keep_batch_layout:
            sub, pending = _batch_fold_plan(f"{path}/postings", checkpoint, partial)
        drop = ["batch_id", "bucket"]

        def _committed(raw):
            # the uncommitted tail stays OUT of the fold (partition-
            # pruned: batch_id is the partition column) and survives
            # in its own dirs, copied into the staging area below
            if pending and "batch_id" in raw.columns:
                return raw.where(~F.col("batch_id").isin(pending))
            return raw

        raw_p = _committed(spark.read.parquet(f"{path}/postings"))
        postings = (
            raw_p.drop(*[c for c in drop if c in raw_p.columns])
            .groupBy("term", "doc_id")
            .agg(
                F.sum("tf").cast("long").alias("tf"),
                F.sum("dl").cast("int").alias("dl"),
            )
            .where(F.col("tf") > 0)
        )
        raw_t = _committed(spark.read.parquet(f"{path}/terms"))
        terms = (
            raw_t.drop(*[c for c in drop if c in raw_t.columns])
            .groupBy("term")
            .agg(F.sum("df").cast("long").alias("df"))
            .where(F.col("df") > 0)
        )
        raw_m = _committed(spark.read.parquet(f"{path}/meta"))
        meta = raw_m.drop(*[c for c in drop if c in raw_m.columns]).agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("sum_dl").cast("long").alias("sum_dl"),
        )
        if not postings.head(1):
            # An all-retired index nets to nothing; the swap would strand
            # an unreadable empty layout. Deleting the index is the
            # caller's explicit move, never a compaction side effect.
            raise ValueError(
                "index nets to empty — nothing to compact; delete the "
                "index directory instead"
            )
        _write_index_frames(postings, terms, meta, tmp, n_buckets, "overwrite", sub)
        # Uncommitted tail batches ride through the swap by value: their
        # dirs are copied into the staging area BEFORE the durability
        # marker, so a crash-replay restores them too, and the resumed
        # stream's redelivery overwrites them idempotently.
        for fam in _II_FAMILIES:
            for i in pending:
                src = os.path.join(path, fam, f"batch_id={i}")
                if os.path.isdir(src):
                    shutil.copytree(src, os.path.join(tmp, fam, f"batch_id={i}"))
        with open(done, "w") as fh:
            fh.write("1")
        _finish_index_swap(path, tmp)
    out_p = spark.read.parquet(f"{path}/postings")
    # meta stays a sum of partials after a partial fold (fold row + the
    # uncommitted tail's rows), so the stat aggregates like any reader
    [m] = spark.read.parquet(f"{path}/meta").agg(
        F.sum("n").cast("long").alias("n")
    ).collect()
    return {"n_docs": m["n"], "postings_rows": out_p.count()}
