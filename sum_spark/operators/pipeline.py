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
    semantic_k: int = 8,
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
