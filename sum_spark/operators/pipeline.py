"""End-to-end training-data preparation: the composition of the
engine's LLM-pipeline operators into the standard corpus -> training
examples flow. Each stage is an existing, oracle-checked operator; this
module only wires them so a corpus goes through one declarative plan
chain (no driver-side loops, no collect on the data path):

    0. line dedup         (opt-in: line_dedup_min_df) remove lines
                          occurring in >= min_df docs (CCNet paragraph
                          dedup — headers/footers/boilerplate); docs
                          with no surviving line drop out
    0b. span dedup        (opt-in: span_dedup_min_df) ExactSubstr-style
                          removal of tokens covered by cross-document
                          duplicated n-grams; empty survivors drop out
    1. exact dedup        keep one doc per identical text
    2. near-dup dedup     MinHash+LSH pairs -> connected components ->
                          keep each cluster's keeper (min doc_id)
    2b. semantic dedup    (opt-in: pass embeddings + semantic_threshold)
                          SemDeDup — k-means clusters, within-cluster
                          embedding near-dups, keep each keeper
    3. decontamination    drop docs sharing an n-gram with the eval set
    4. quality filter     drop docs under a quality-score floor
    4b. perplexity filter (opt-in: max_mean_nll, nats) drop docs whose
                          mean bigram-LM NLL is too high — CCNet-style;
                          scored against lm_counts/lm_vocab or
                          self-trained on the survivors
    4c. classifier gate   (opt-in: clf_weights + min_clf_prob) drop docs
                          the trained quality classifier scores below
                          the probability floor — the fastText-style
                          model gate (DCLM/FineWeb-Edu pattern)
    5. stratified sample  per-source hash-Bernoulli rates (reproducible)
    6. sequence packing   fixed token-budget packs in doc_id order
    7. global shuffle     deterministic seeded order for serialization

The serialized output feeds sources/shards.write_training_shards
(order_col='shuffle_pos') for the manifest-checked shard export a
trainer consumes.

Every stage is individually deterministic, so the whole pipeline is
reproducible run-to-run and across clusters — the property a training
run needs for restartable data loading.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from sum_spark.operators import clustering, dedup, lm, sampling, textops
from sum_spark.operators.decontam import decontaminate
from sum_spark.plans.scale import release_with


def prepare_training_data(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    near_dup_threshold: float = 0.8,
    min_quality: float = 0.0,
    rates: dict[str, float] | None = None,
    default_rate: float = 1.0,
    pack_budget: int = 2048,
    shuffle_seed: str = "epoch-0",
    text_col: str = "text",
    id_col: str = "doc_id",
    strat_col: str = "source",
    embeddings: DataFrame | None = None,
    semantic_threshold: float | None = None,
    semantic_k: int | str = 8,
    vec_col: str = "embedding",
    max_mean_nll: float | None = None,
    lm_counts: DataFrame | None = None,
    lm_vocab: int | None = None,
    clf_weights: DataFrame | None = None,
    clf_intercept_micro: int = 0,
    min_clf_prob: float | None = None,
    line_dedup_min_df: int | None = None,
    line_sep: str = "\n",
    span_dedup_min_df: int | None = None,
) -> DataFrame:
    """Run the full preparation flow; returns one row per surviving
    document: (doc_id, text, source, n_tokens, pack_id, shuffle_pos),
    ordered by shuffle_pos (the serialization order).

    ``benchmark`` is the eval corpus to decontaminate against (None
    skips the stage). ``rates`` are per-stratum sampling rates as in
    sample_stratified. Packing runs in doc_id order (stable across
    reruns); the output order is the seeded global shuffle.

    ``embeddings`` (a (doc_id, vec_col) table) together with
    ``semantic_threshold`` enables the SemDeDup stage: text near-dup
    misses paraphrases and translations that embed close together;
    clustering + within-cluster cosine catches them without any global
    pair search. Both default off — the stage needs an embedding table
    the text corpus alone doesn't have.
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        F.col(strat_col).alias("source"),
    )

    # 0. optional CCNet-style line dedup: scrub cross-document
    #    boilerplate lines BEFORE any document-level signal is computed
    #    (a shared footer otherwise drags unrelated docs toward each
    #    other in every downstream similarity). Docs left with no line
    #    drop out here.
    if line_dedup_min_df is not None:
        cleaned = dedup.dedup_lines(
            base, min_df=line_dedup_min_df, line_sep=line_sep
        )
        base = (
            base.drop("text")
            .join(
                cleaned.where(F.col("clean_text") != "").select(
                    "doc_id", F.col("clean_text").alias("text")
                ),
                "doc_id",
            )
            .select("doc_id", "text", "source")
        )

    # 0b. optional ExactSubstr-style span dedup: strip tokens covered by
    #     cross-document duplicated n-grams (after line dedup, so
    #     boilerplate lines don't inflate the duplicated-gram set).
    if span_dedup_min_df is not None:
        stripped = dedup.remove_duplicate_spans(base, min_df=span_dedup_min_df)
        base = (
            base.drop("text")
            .join(
                stripped.where(F.col("clean_text") != "").select(
                    "doc_id", F.col("clean_text").alias("text")
                ),
                "doc_id",
            )
            .select("doc_id", "text", "source")
        )

    # 1. exact dedup: keep each identical-text group's min doc_id.
    keepers = dedup.dedup_exact(base).select(F.col("keep_id").alias("doc_id"))
    survivors = base.join(keepers, "doc_id", "left_semi")

    # ONE text-processing pass for stages 2 and 3: the MinHash signature
    # table's hh column is each doc's distinct shingle hash60s — exactly
    # what decontamination needs — so the corpus is shingled and hashed
    # once, not once per stage (at 100 TB the text scan is the cost that
    # matters; everything downstream reads the persisted signatures).
    sig = dedup.minhash_signatures(survivors, "text", "doc_id").persist(
        StorageLevel.MEMORY_AND_DISK
    )

    # 2. near-dup dedup: LSH pairs over the exact-deduped corpus, cluster,
    #    drop every member that is not its cluster's keeper.
    pairs = dedup.minhash_lsh_from_sig(sig, threshold=near_dup_threshold)
    clusters = dedup.dedup_clusters(pairs)
    losers = clusters.where(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    survivors = survivors.join(losers, "doc_id", "left_anti")

    # 2b. optional SemDeDup: embedding-space near-dups among the text
    #     survivors (clusters -> within-cluster pairs -> keep keepers).
    if embeddings is not None and semantic_threshold is not None:
        emb_live = embeddings.select(
            F.col(id_col).alias("doc_id"), F.col(vec_col).alias("__emb")
        ).join(survivors.select("doc_id"), "doc_id", "left_semi")
        spairs = clustering.semantic_dedup(
            emb_live,
            threshold=semantic_threshold,
            k=semantic_k,
            id_col="doc_id",
            vec_col="__emb",
        )
        sclusters = dedup.dedup_clusters(spairs, src_col="id_a", dst_col="id_b")
        slosers = sclusters.where(F.col("doc_id") != F.col("cluster_id")).select(
            "doc_id"
        )
        survivors = survivors.join(slosers, "doc_id", "left_anti")

    # 3. decontamination against the benchmark's shingles. The corpus
    #    side reuses the signature hashes; contaminated near-dup losers
    #    in the report are harmless (already removed above).
    if benchmark is not None:
        corpus_hashes = sig.select("doc_id", F.explode("hh").alias("__h"))
        contaminated = decontaminate(
            None, benchmark, corpus_hashes=corpus_hashes
        ).select("doc_id")
        survivors = survivors.join(contaminated, "doc_id", "left_anti")

    # 4. quality floor.
    if min_quality > 0.0:
        quality = textops.quality_score(survivors).where(
            F.col("score") >= F.lit(float(min_quality))
        )
        survivors = survivors.join(quality.select("doc_id"), "doc_id", "left_semi")

    # 4b. optional CCNet-style perplexity ceiling: drop docs whose mean
    #     bigram NLL (nats) exceeds max_mean_nll. Scored against the
    #     provided LM (lm_counts + lm_vocab — the clean-reference-corpus
    #     pattern) or self-trained on the survivors when none is given.
    #     Docs with no bigram (0 or 1 token) carry no LM signal and pass.
    if max_mean_nll is not None:
        if lm_counts is not None:
            if lm_vocab is None:
                raise ValueError("lm_counts needs lm_vocab (the trained V)")
            scored = lm.lm_score(survivors, lm_counts, lm_vocab)
        else:
            scored = lm.score_self(survivors)
        keep = scored.where(
            (F.col("n_bigrams") == 0)
            | (
                F.col("nll_micro")
                <= F.lit(float(max_mean_nll)) * 1_000_000 * F.col("n_bigrams")
            )
        )
        survivors = survivors.join(keep.select("doc_id"), "doc_id", "left_semi")

    # 4c. optional model-based quality gate: the trained hashed-linear
    #     classifier (operators/classifier.train_text_classifier). The
    #     probability floor is applied as an integer micro-logit
    #     threshold so the gate is exact on any layout; weights come
    #     from a labeled sample the caller curated — the pipeline never
    #     trains on the corpus it is filtering.
    if clf_weights is not None and min_clf_prob is not None:
        import math

        from sum_spark.operators.classifier import score_text_classifier

        p = float(min_clf_prob)
        if not 0.0 < p < 1.0:
            raise ValueError("min_clf_prob must be in (0, 1)")
        min_logit_micro = int(math.ceil(math.log(p / (1.0 - p)) * 1_000_000))
        scored = score_text_classifier(
            survivors, clf_weights, clf_intercept_micro
        ).where(F.col("logit_micro") >= F.lit(min_logit_micro))
        survivors = survivors.join(scored.select("doc_id"), "doc_id", "left_semi")

    # 5. reproducible stratified sampling.
    if rates is not None or default_rate < 1.0:
        picked = sampling.sample_stratified(
            survivors, rates or {}, default_rate=default_rate
        ).select("doc_id")
        survivors = survivors.join(picked, "doc_id", "left_semi")

    # The survivor set's lineage now contains the whole dedup (LSH +
    # connected components) and decontamination; stages 6, 7, and the
    # final assembly join each scan it. Persist once so those scans hit
    # a materialized table instead of re-running the dedup per branch —
    # on a cluster this is where a pipeline would checkpoint to storage.
    # Lifetime is tied to the returned plan (release_with): dropped after
    # the caller's action.
    survivors = survivors.persist(StorageLevel.MEMORY_AND_DISK)

    # 6. pack into token budgets (doc_id order — stable across reruns).
    packed = sampling.pack_sequences(survivors, pack_budget)

    # 7. deterministic global shuffle for serialization order.
    shuffled = sampling.global_shuffle(survivors, seed=shuffle_seed)

    result = (
        survivors.join(packed.select("doc_id", "n_tokens", "pack_id"), "doc_id")
        .join(shuffled, "doc_id")
        .select("doc_id", "text", "source", "n_tokens", "pack_id", "shuffle_pos")
        .orderBy("shuffle_pos")
    )
    return release_with(result, survivors, sig)


# ---------------------------------------------------------------------------
# Incremental preparation — reprocess the DELTA between snapshots only
# ---------------------------------------------------------------------------
#
# The cost model of a versioned 100 TB corpus: each new snapshot changes a
# sliver of documents, and every stage of prepare_training_data above is
# either per-document (digest, token count, quality, contamination,
# sampling — pure functions of one row, stored at ingest and reused while
# the text is unchanged) or graph/metadata-sized (exact-dup groups over
# stored digests, near-dup clusters over the maintained pair set, packing
# and shuffling over survivor metadata). So the only TEXT the incremental
# run reads is the delta's — everything else is joins over stored
# artifacts, and the output equals a full rebuild over the new snapshot
# bit-for-bit (tests/test_incremental_pipeline.py).
#
# Out of scope for the incremental path (documented, not silently wrong):
# the opt-in corpus-global stages — line/span dedup (cross-document df
# thresholds), SemDeDup, self-trained LM and classifier gates — change
# their statistics with ANY corpus change and need their own stored-state
# design; prepare_incremental raises if asked for them implicitly by the
# caller composing around it.


def _doc_meta(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    strat_col: str = "source",
) -> DataFrame:
    """Per-document stored metadata, ONE map-side pass over text —
    (doc_id, source, md5h, n_tokens, score): md5h matches dedup_exact's
    grouping hash; n_tokens matches pack_sequences' split-on-space
    count; score is textops.quality_score's heuristic, written with the
    IDENTICAL expression tree (same functions, same order, same ROUND)
    so the delta path's stored scores equal a full rebuild's freshly
    computed ones bit-for-bit. No joins, no second scan: at delta scale
    the text read is the cost that matters."""
    from sum_spark.functions.text import tokens
    from sum_spark.operators.textops import quality_score_expr

    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(strat_col).alias("source"),
        F.col(text_col).alias("__text"),
        tokens(text_col).alias("__w"),
    )
    # the ONE score expression (textops.quality_score_expr): identical
    # tree by construction, so stored scores == a full rebuild's
    score = quality_score_expr(F.col("__w"))
    return staged.select(
        "doc_id",
        "source",
        F.md5(F.col("__text")).alias("md5h"),
        F.coalesce(
            F.size(F.split(F.col("__text"), " ")).cast("long"), F.lit(0)
        ).alias("n_tokens"),
        score.alias("score"),
    )


def corpus_state(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    near_dup_threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    strat_col: str = "source",
) -> dict[str, DataFrame]:
    """The stored artifacts one snapshot leaves behind for the next
    incremental run: per-doc metadata, MinHash signatures, the verified
    near-dup pair set over the WHOLE snapshot (restricting to any
    survivor subset is a filter, never a recompute), and the
    contaminated-id set against ``benchmark``. In production each frame
    is a parquet table (write_corpus_state/read_corpus_state)."""
    meta = _doc_meta(docs, text_col, id_col, strat_col)
    sig = dedup.minhash_signatures(docs, text_col, id_col).persist()
    # The persisted signature cache lives as long as the pair frame (its
    # only multi-read consumer): release_with ties the unpersist to the
    # pairs object the returned dict holds — dropping the state dict
    # frees the cache (the repo's finalizer convention).
    pairs = release_with(
        dedup.minhash_lsh_from_sig(sig, threshold=near_dup_threshold), sig
    )
    state = {"meta": meta, "sig": sig, "pairs": pairs}
    if benchmark is not None:
        state["contaminated"] = decontaminate(
            None,
            benchmark,
            corpus_hashes=sig.select("doc_id", F.explode("hh").alias("__h")),
        ).select("doc_id")
    return state


def write_corpus_state(state: dict[str, DataFrame], path: str) -> None:
    """Materialize a corpus_state to parquet (one dir per frame) — the
    ingest-time artifact an incremental run reads back."""
    for name, df in state.items():
        df.write.mode("overwrite").parquet(f"{path}/{name}")


def read_corpus_state(spark, path: str) -> dict[str, DataFrame]:
    import os

    out = {}
    for name in ("meta", "sig", "pairs", "contaminated"):
        p = f"{path}/{name}"
        if os.path.isdir(p):
            out[name] = spark.read.parquet(p)
    return out


def prepare_training_data_incremental(
    state_a: dict[str, DataFrame],
    b_docs: DataFrame,
    delta_docs: DataFrame,
    retired_ids: DataFrame,
    benchmark: DataFrame | None = None,
    near_dup_threshold: float = 0.8,
    min_quality: float = 0.0,
    rates: dict[str, float] | None = None,
    default_rate: float = 1.0,
    pack_budget: int = 2048,
    shuffle_seed: str = "epoch-0",
    text_col: str = "text",
    id_col: str = "doc_id",
    strat_col: str = "source",
) -> tuple[DataFrame, dict[str, DataFrame]]:
    """prepare_training_data for snapshot B, computed from snapshot A's
    ``corpus_state`` plus the delta only — and the advanced state for
    the NEXT transition.

    ``delta_docs`` = added+changed rows WITH B's text (snapshot_diff's
    delta_ids semi-joined against B); ``retired_ids`` = removed+changed
    ids. ``benchmark`` must be the same eval corpus the stored
    contaminated set was built against (contamination verdicts are
    per-doc and text-keyed, so they stay valid exactly as long as both
    the doc and the benchmark are unchanged).

    Text access: ONE pass over delta text (metadata + signatures) plus
    the final text fetch for surviving docs (a storage column read, not
    a recompute). Output is identical to
    ``prepare_training_data(b_docs, ...)`` with the same options —
    property-tested, not assumed.

    Returns (result, state_b).
    """
    retired = retired_ids.select(F.col(retired_ids.columns[0]).alias("__rid"))

    def _anti(df: DataFrame, col: str = "doc_id") -> DataFrame:
        return df.join(retired, F.col(col) == F.col("__rid"), "left_anti")

    # --- advance the stored per-doc artifacts (the only delta text pass)
    delta_meta = _doc_meta(delta_docs, text_col, id_col, strat_col)
    meta_b = _anti(state_a["meta"]).unionByName(delta_meta)
    sig_delta = dedup.minhash_signatures(delta_docs, text_col, id_col).persist()
    sig_b = _anti(state_a["sig"]).unionByName(sig_delta)
    state_b: dict[str, DataFrame] = {"meta": meta_b, "sig": sig_b}

    pairs_b = dedup.incremental_pairs(
        state_a["sig"],
        state_a["pairs"],
        None,
        retired_ids,
        threshold=near_dup_threshold,
        delta_sig=sig_delta,
    )
    state_b["pairs"] = pairs_b

    cont_b = None
    if benchmark is not None:
        if "contaminated" not in state_a:
            raise ValueError(
                "state_a lacks a contaminated set; build corpus_state with "
                "the same benchmark"
            )
        cont_delta = decontaminate(
            None,
            benchmark,
            corpus_hashes=sig_delta.select(
                "doc_id", F.explode("hh").alias("__h")
            ),
        ).select("doc_id")
        cont_b = _anti(state_a["contaminated"]).unionByName(cont_delta)
        state_b["contaminated"] = cont_b

    # --- the B prepare, over metadata only from here on
    # 1. exact dedup: keeper = min doc_id per stored digest group.
    keepers = meta_b.groupBy("md5h").agg(F.min("doc_id").alias("doc_id"))
    surv = meta_b.join(keepers.select("doc_id"), "doc_id", "left_semi")

    # 2. near-dup: the maintained pair set restricted to exact-survivors
    #    (signatures are per-doc, so restriction IS the survivor-built
    #    pair set), clustered; drop non-keepers.
    surv_ids = surv.select("doc_id")
    pairs_surv = (
        pairs_b.join(
            surv_ids.select(F.col("doc_id").alias("doc_a")), "doc_a", "left_semi"
        ).join(
            surv_ids.select(F.col("doc_id").alias("doc_b")), "doc_b", "left_semi"
        )
    )
    clusters = dedup.dedup_clusters(pairs_surv)
    losers = clusters.where(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    surv = surv.join(losers, "doc_id", "left_anti")

    # 3. decontamination (stored verdicts + delta verdicts).
    if cont_b is not None:
        surv = surv.join(cont_b, "doc_id", "left_anti")

    # 4. quality floor over the stored score.
    if min_quality > 0.0:
        surv = surv.where(F.col("score") >= F.lit(float(min_quality)))

    # 5. stratified sampling — a pure (source, doc_id) hash.
    if rates is not None or default_rate < 1.0:
        picked = sampling.sample_stratified(
            surv, rates or {}, default_rate=default_rate
        ).select("doc_id")
        surv = surv.join(picked, "doc_id", "left_semi")

    surv = surv.persist(StorageLevel.MEMORY_AND_DISK)

    # 6/7. pack + shuffle over survivor METADATA (stored token counts).
    packed = sampling.pack_sequences(surv, pack_budget, n_tokens_col="n_tokens")
    shuffled = sampling.global_shuffle(surv, seed=shuffle_seed)

    # final assembly: fetch surviving text from the B snapshot (storage
    # column read — the only non-delta text access).
    text_src = b_docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    result = (
        surv.join(text_src, "doc_id")
        .join(packed.select("doc_id", "pack_id"), "doc_id")
        .join(shuffled, "doc_id")
        .select("doc_id", "text", "source", "n_tokens", "pack_id", "shuffle_pos")
        .orderBy("shuffle_pos")
    )
    return release_with(result, surv, sig_delta), state_b
