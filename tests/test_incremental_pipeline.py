"""End-to-end incremental reprocessing: the delta path must equal a full
rebuild. Composes the versioned-corpus primitives — snapshot_diff finds
added/changed/removed, incremental_pairs maintains the near-dup pair set,
retire_from_inverted_index + append_to_inverted_index maintain the lexical
index, append_to_pq_index grows the ANN index — and checks every
delta-maintained artifact against its from-scratch twin over the new
snapshot. This is the reprocessing story a versioned 100 TB corpus lives
with: between snapshots, only delta text is ever re-read."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sum_spark.operators import dedup
from sum_spark.operators.diff import delta_ids, snapshot_diff
from sum_spark.operators.search import (
    append_to_inverted_index,
    bm25_from_index,
    bm25_search,
    retire_from_inverted_index,
    write_inverted_index,
)
from sum_spark.sources.tables import load_table

TERMS = ["data", "model", "learning"]


def _snapshots(docs):
    """The synthetic A->B transition — the SAME helpers the
    dedup_incremental / bm25_search 'incr' registry legs use (imported,
    not re-implemented, so the test and the oracle-checked legs cannot
    drift apart): removed = A-members with doc_id%13=2, changed =
    doc_id%13=1 (' rev2' appended), added = doc_id%10=0."""
    from sum_spark.queries.llm import _snapshot_a, _snapshot_b

    return _snapshot_a(docs), _snapshot_b(docs)


def test_snapshot_diff_statuses_match_construction(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    a, b = _snapshots(docs)
    got = {(r["id"], r["status"]) for r in snapshot_diff(a, b).collect()}
    want = set()
    for r in docs.select("doc_id").collect():
        i = r["doc_id"]
        if i % 10 == 0:
            want.add((i, "added"))
        elif i % 13 == 2:
            want.add((i, "removed"))
        elif i % 13 == 1:
            want.add((i, "changed"))
    assert got == want and want


def test_incremental_pairs_equals_full_rebuild(spark, sf_smoke):
    """Stored A artifacts + delta-only processing == dedup_minhash_lsh
    over the full new snapshot."""
    docs = load_table(spark, sf_smoke, "documents")
    a, b = _snapshots(docs)

    a_sig = dedup.minhash_signatures(a).persist()
    a_pairs = dedup.minhash_lsh_from_sig(a_sig, threshold=0.8)

    d = snapshot_diff(a, b)
    delta = b.join(
        delta_ids(d).select(F.col("id").alias("doc_id")), "doc_id", "left_semi"
    )
    retired = d.where(F.col("status").isin("removed", "changed")).select("id")

    incr = dedup.incremental_pairs(a_sig, a_pairs, delta, retired, threshold=0.8)
    got = sorted(map(tuple, incr.collect()))
    want = sorted(map(tuple, dedup.dedup_minhash_lsh(b, threshold=0.8).collect()))
    a_sig.unpersist()
    assert got == want and got  # non-empty: the corpus has planted near-dups


def test_retire_then_append_index_equals_rebuild(spark, sf_smoke, tmp_path):
    """Index maintenance across the transition: retire old partials for
    changed+removed, append delta with new text; every query over the
    maintained index equals a scan of snapshot B bit-for-bit."""
    docs = load_table(spark, sf_smoke, "documents")
    a, b = _snapshots(docs)
    d = snapshot_diff(a, b)
    retired_ids = d.where(F.col("status").isin("removed", "changed")).select(
        F.col("id").alias("doc_id")
    )
    delta = b.join(
        delta_ids(d).select(F.col("id").alias("doc_id")), "doc_id", "left_semi"
    )

    path = str(tmp_path / "ii_incr")
    write_inverted_index(a, path)
    retire_from_inverted_index(a.join(retired_ids, "doc_id", "left_semi"), path)
    append_to_inverted_index(delta, path)

    got = sorted(map(tuple, bm25_from_index(spark, path, TERMS, k=10).collect()))
    want = sorted(map(tuple, bm25_search(b, TERMS, k=10).collect()))
    assert got == want and got


def test_retire_drops_docs_and_cancels_stats_exactly(spark, tmp_path):
    """Deletion-as-negation edge cases: a removed doc that was a top hit
    disappears; a term whose df drops to zero scores as if it never
    existed; a changed doc scores with its NEW text only."""
    old = spark.createDataFrame(
        [
            (1, "data data data data"),  # top hit, will be REMOVED
            (2, "data model"),  # unchanged
            (3, "unicorn data"),  # CHANGED -> loses 'unicorn'
            (4, "model learning"),  # unchanged
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (2, "data model"),
            (3, "banana data"),
            (4, "model learning"),
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "ii_edge")
    write_inverted_index(old, path)
    retire_from_inverted_index(old.where(F.col("doc_id").isin(1, 3)), path)
    append_to_inverted_index(new.where(F.col("doc_id") == 3), path)

    for terms in (["data"], ["unicorn"], ["banana", "data"], TERMS):
        got = sorted(map(tuple, bm25_from_index(spark, path, terms, k=10).collect()))
        want = sorted(map(tuple, bm25_search(new, terms, k=10).collect()))
        assert got == want, terms
    # the removed doc is gone from every result set
    assert not any(
        r["doc_id"] == 1
        for r in bm25_from_index(spark, path, ["data"], k=10).collect()
    )


def test_full_incremental_composition_pq_leg(spark, sf_smoke, tmp_path):
    """The ANN half of the incremental story: embeddings for delta ids
    append into the stored PQ index (codebook frozen), retired rows are
    filtered at read via the maintained id set, and search results equal
    an index rebuilt from the surviving vectors with the same codebook."""
    from sum_spark.operators.similarity import (
        append_to_pq_index,
        knn_ivfpq_from_index,
        write_pq_index,
    )

    emb = load_table(spark, sf_smoke, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("data")
    )
    old = emb.where(F.col("vec_id") % 10 != 0)
    delta = emb.where(F.col("vec_id") % 10 == 0)

    p1 = str(tmp_path / "pq_grown")
    book = write_pq_index(old.withColumnRenamed("vec_id", "id"), p1, m=2, n_codes=4)
    append_to_pq_index(delta.withColumnRenamed("vec_id", "id"), p1, m=2)

    p2 = str(tmp_path / "pq_rebuilt")
    write_pq_index(
        emb.withColumnRenamed("vec_id", "id"), p2, m=2, n_codes=4, centroids=book
    )

    probes = delta.withColumnRenamed("vec_id", "id").limit(3)
    s1 = sorted(
        map(tuple, knn_ivfpq_from_index(spark, p1, probes, k=5, round_to=4).collect())
    )
    s2 = sorted(
        map(tuple, knn_ivfpq_from_index(spark, p2, probes, k=5, round_to=4).collect())
    )
    assert s1 == s2 and s1


def test_prepare_incremental_equals_full_rebuild(spark, sf_smoke, tmp_path):
    """The headline composition: snapshot A's corpus_state (round-tripped
    through parquet — the real stored artifact), advanced with the diff
    delta, must produce EXACTLY prepare_training_data(B) with the same
    options — and the advanced state must equal corpus_state(B)."""
    from sum_spark.operators.pipeline import (
        corpus_state,
        prepare_training_data,
        prepare_training_data_incremental,
        read_corpus_state,
        write_corpus_state,
    )

    docs = load_table(spark, sf_smoke, "documents").select(
        "doc_id", "text", "source"
    )
    a, b = _snapshots(docs)
    a = a.join(docs.select("doc_id", "source"), "doc_id")
    b = b.join(docs.select("doc_id", "source"), "doc_id")
    bench = docs.where(F.col("doc_id") % 41 == 3).select("doc_id", "text")

    opts = dict(
        near_dup_threshold=0.8,
        min_quality=0.3,
        rates={"src0": 1.0, "src1": 0.5},
        default_rate=0.7,
        pack_budget=256,
        shuffle_seed="epoch-7",
    )

    # ingest-time artifact for A, persisted like production would
    sp = str(tmp_path / "state_a")
    write_corpus_state(corpus_state(a, benchmark=bench), sp)
    state_a = read_corpus_state(spark, sp)

    d = snapshot_diff(a, b)
    delta = b.join(
        delta_ids(d).select(F.col("id").alias("doc_id")), "doc_id", "left_semi"
    )
    retired = d.where(F.col("status").isin("removed", "changed")).select("id")

    got_df, state_b = prepare_training_data_incremental(
        state_a, b, delta, retired, benchmark=bench, **opts
    )
    got = sorted(map(tuple, got_df.collect()))
    want = sorted(map(tuple, prepare_training_data(b, benchmark=bench, **opts).collect()))
    assert got == want and got

    # the advanced state equals a from-scratch state over B
    fresh = corpus_state(b, benchmark=bench)
    for name in ("meta", "pairs", "contaminated"):
        sa = sorted(map(tuple, state_b[name].collect()))
        sb = sorted(map(tuple, fresh[name].collect()))
        assert sa == sb and (sa or name == "contaminated"), name
    # signatures: compare per-doc hh arrays (sig arrays are derived)
    key = lambda df: sorted(
        (r["doc_id"], tuple(r["hh"])) for r in df.select("doc_id", "hh").collect()
    )
    assert key(state_b["sig"]) == key(fresh["sig"])


def test_incremental_pairs_refilters_stored_pairs_at_higher_threshold(spark):
    """Raising the threshold above the stored build's must drop stored
    sub-threshold pairs (they are re-filtered, not trusted); and the
    call validates its delta inputs."""
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "z y x w v u t s")],
        "doc_id long, text string",
    )
    sig = dedup.minhash_signatures(docs)
    stored = spark.createDataFrame(
        [(1, 2, 0.85), (1, 3, 0.95)], "doc_a long, doc_b long, jaccard double"
    )
    empty_delta = docs.where(F.lit(False))
    retired = spark.createDataFrame([], "id long")
    out = dedup.incremental_pairs(sig, stored, empty_delta, retired, threshold=0.9)
    assert [tuple(r) for r in out.collect()] == [(1, 3, 0.95)]
    with pytest.raises(ValueError):
        dedup.incremental_pairs(sig, stored, None, retired, threshold=0.9)
