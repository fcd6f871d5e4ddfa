"""Null/empty-text robustness: the driver tables contain no NULLs, but a
real 100 TB corpus always does — these tests pin each operator's declared
contract so a hygiene regression is loud.

Contracts: dedup treats a NULL text as its own exact group and excludes
it from shingle-based pair detection (no shingles => no pairs);
pack_sequences assigns EVERY doc a pack (NULL text = 0 tokens);
text_profile excludes NULL-text docs (documented; every ratio would be
NULL); sampling keys on ids, independent of text."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sum_spark.operators import dedup, sampling, textops
from sum_spark.operators.decontam import decontaminate


@pytest.fixture(scope="module")
def nullish(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon", "s0"),
        (2, None, "s0"),
        (3, "", "s1"),
        (4, "alpha beta gamma delta epsilon", "s1"),
        (5, "x", "s1"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_dedup_exact_groups_null_separately(nullish):
    out = sorted(tuple(r) for r in dedup.dedup_exact(nullish).collect())
    assert out == [(1, 2), (2, 1), (3, 1), (5, 1)]


def test_pair_detectors_skip_nulls_without_error(nullish):
    assert [tuple(r) for r in dedup.dedup_minhash_lsh(nullish).collect()] == [
        (1, 4, 1.0)
    ]
    assert [
        tuple(r) for r in dedup.dedup_ngram_jaccard(nullish, max_df=None).collect()
    ] == [(1, 4, 1.0)]
    assert [tuple(r) for r in dedup.dedup_simhash(nullish).collect()] == [(1, 4, 0)]


def test_pack_sequences_assigns_every_doc_a_pack(nullish):
    out = {r["doc_id"]: r for r in sampling.pack_sequences(nullish, 10).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    assert out[2]["n_tokens"] == 0 and out[2]["pack_id"] is not None
    assert all(r["pack_id"] is not None for r in out.values())


def test_text_profile_excludes_null_text_only(nullish):
    ids = {r["doc_id"] for r in textops.text_profile(nullish).collect()}
    assert ids == {1, 3, 4, 5}


def test_decontam_and_span_stats_handle_nulls(nullish):
    bench = nullish.where(F.col("doc_id") == 1)
    hits = {r["doc_id"] for r in decontaminate(nullish, bench).collect()}
    assert hits == {1, 4}
    spans = {r["doc_id"] for r in dedup.duplicated_span_stats(nullish).collect()}
    assert spans == {1, 4}  # only shingle-eligible docs appear


def test_sampling_is_text_independent(nullish):
    out = {
        r["doc_id"]
        for r in sampling.sample_stratified(
            nullish, {"s0": 1.0, "s1": 1.0}
        ).collect()
    }
    assert out == {1, 2, 3, 4, 5}


def test_line_and_span_dedup_null_contract(nullish):
    # dedup_lines: NULL text -> no lines -> excluded; empty string is one
    # (empty) line and participates normally.
    got = {r["doc_id"]: r for r in dedup.dedup_lines(nullish).collect()}
    assert 2 not in got
    assert set(got) == {1, 3, 4, 5}
    # remove_duplicate_spans: NULL excluded; sub-n-token docs pass
    # through untouched.
    got = {r["doc_id"]: r for r in dedup.remove_duplicate_spans(nullish).collect()}
    assert 2 not in got
    assert got[5]["n_removed"] == 0 and got[5]["clean_text"] == "x"
    # docs 1 and 4 are identical: every 3-gram is cross-doc duplicated.
    assert got[1]["clean_text"] == "" and got[1]["n_removed"] == 5


def test_classifier_and_html_null_contract(spark, nullish):
    from sum_spark.operators.classifier import score_with_hash_weights
    from sum_spark.operators.textops import extract_html

    got = {r["doc_id"]: r for r in score_with_hash_weights(nullish).collect()}
    assert 2 not in got  # NULL text contributes no features
    assert got[5]["n_feats"] == 1  # single word: unigram only
    h = {r["doc_id"]: r["text"] for r in extract_html(nullish).collect()}
    assert h[2] is None and h[3] == ""  # map-side op: NULL in, NULL out
