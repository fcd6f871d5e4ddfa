"""Count-min sketch properties: the one-sided error guarantee (never
under-counts), weighted vs raw-occurrence build equivalence, and
phantom-item behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from sum_spark.functions.text import tokens
from sum_spark.operators.sketch import count_min_build, count_min_estimate
from sum_spark.sources.tables import load_table


def _tok(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(F.explode(tokens("text")).alias("w"))


def test_cms_never_undercounts(spark, sf_smoke):
    tok = _tok(spark, sf_smoke)
    # Tiny grid on purpose: collisions guaranteed, so the assertion
    # est >= tf is exercised where overcount is real, not vacuous.
    sk = count_min_build(tok, "w", width=16, depth=3)
    truth = tok.groupBy("w").agg(F.count("*").cast("long").alias("tf"))
    est = count_min_estimate(sk, truth, "w", width=16, depth=3)
    bad = est.where(F.col("est") < F.col("tf")).count()
    assert bad == 0
    # And the grid genuinely collides at width 16 (some overcount > 0).
    assert est.where(F.col("est") > F.col("tf")).count() > 0


def test_cms_weighted_build_equals_occurrence_build(spark, sf_smoke):
    tok = _tok(spark, sf_smoke)
    raw = count_min_build(tok, "w", width=64, depth=4)
    per = tok.groupBy("w").agg(F.count("*").cast("long").alias("n"))
    weighted = count_min_build(per, "w", width=64, depth=4, weight_col="n")
    assert raw.exceptAll(weighted).count() == 0
    assert weighted.exceptAll(raw).count() == 0


def test_cms_phantom_item_nonnegative_and_null_skipped(spark, sf_smoke):
    tok = _tok(spark, sf_smoke)
    sk = count_min_build(tok, "w", width=256, depth=4)
    phantom = spark.createDataFrame(
        [("zz-definitely-not-a-corpus-token-zz",)], "w string"
    )
    [r] = count_min_estimate(sk, phantom, "w", width=256, depth=4).collect()
    assert r["est"] >= 0  # may carry collision mass, never negative
    # NULL items are excluded from the build: total sketch mass per depth
    # row equals the non-null occurrence count.
    with_null = tok.unionByName(
        spark.createDataFrame([(None,)], "w string")
    )
    sk2 = count_min_build(with_null, "w", width=256, depth=4)
    n = tok.count()
    per_depth = sk2.groupBy("depth").agg(F.sum("c").alias("m")).collect()
    assert all(row["m"] == n for row in per_depth)


def test_cap_domain_tokens_respects_cap_and_matches_flat_window(spark, sf_smoke):
    """The two-level prefix sum must equal the naive flat window (the
    oracle form), and the kept set must satisfy the budget exactly:
    kept tokens <= cap, and the first excluded doc would overflow it."""
    from pyspark.sql import Window as W

    from sum_spark.functions.hashing import hash60
    from sum_spark.operators.sampling import cap_domain_tokens

    docs = load_table(spark, sf_smoke, "documents")
    cap = 1500
    out = cap_domain_tokens(docs, cap)
    # Flat-window reference.
    h = hash60(
        F.concat_ws(":", F.lit("cap"), F.col("source"), F.col("doc_id").cast("string"))
    )
    nt = F.coalesce(F.size(F.split(F.col("text"), " ")).cast("long"), F.lit(0))
    flat_w = (
        W.partitionBy("stratum").orderBy("__h", "doc_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    flat = (
        docs.select(
            F.col("doc_id"), F.col("source").alias("stratum"),
            nt.alias("n_tok"), h.alias("__h"),
        )
        .withColumn("cum_tokens", F.sum("n_tok").over(flat_w))
        .withColumn("kept", F.col("cum_tokens") <= F.lit(cap))
        .select("doc_id", "stratum", "n_tok", "cum_tokens", "kept")
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, flat.collect()))
    # Budget semantics: kept totals fit the cap; adding the cheapest
    # excluded doc's tokens would not have fit at its position.
    agg = (
        out.groupBy("stratum")
        .agg(
            F.sum(F.when(F.col("kept"), F.col("n_tok")).otherwise(F.lit(0))).alias("kt"),
            F.min(F.when(~F.col("kept"), F.col("cum_tokens"))).alias("first_over"),
        )
        .collect()
    )
    assert len(agg) > 0
    for r in agg:
        assert r["kt"] <= cap
        if r["first_over"] is not None:
            assert r["first_over"] > cap
    # The cap genuinely binds somewhere at this scale.
    assert out.where(~F.col("kept")).count() > 0


def test_bloom_no_false_negatives_and_bounded_fp(spark, sf_smoke):
    from sum_spark.operators.sketch import bloom_build_bits, bloom_member

    docs = load_table(spark, sf_smoke, "documents")
    members = docs.select(F.col("doc_id").alias("x")).where(F.col("x") % 3 == 0)
    words = bloom_build_bits(members, "x", m_bits=4096, k=3)
    probes = docs.select(F.col("doc_id").alias("x"))
    out = bloom_member(probes, "x", words, m_bits=4096, k=3)
    # One-sided error: every true member answers maybe=true.
    misses = out.where((F.col("x") % 3 == 0) & ~F.col("maybe")).count()
    assert misses == 0
    # False positives exist but are a small minority of non-members
    # (set_bits/m_bits ~ 0.11 at this sizing -> fp ~ 0.1-0.2%; allow 5%).
    non = out.where(F.col("x") % 3 != 0)
    fp = non.where(F.col("maybe")).count()
    assert fp <= max(2, int(0.05 * non.count()))
    # Output schema: input columns preserved, staging columns dropped.
    assert out.columns == ["x", "maybe"]


def test_bloom_packing_roundtrip(spark):
    from sum_spark.operators.sketch import (
        bloom_build_bits,
        bloom_member,
        bloom_positions,
    )

    items = spark.createDataFrame([(i,) for i in range(50)], "x long")
    words = bloom_build_bits(items, "x", m_bits=512, k=2)
    assert len(words) == 8 and all(-(1 << 63) <= w < (1 << 63) for w in words)
    # The packed words contain exactly the positions the items hash to.
    # Python ints are infinite two's complement, so (w >> b) & 1 reads
    # the stored bit correctly for negative (bit-63-set) words too.
    got_bits = {
        (wi * 64 + b)
        for wi, w in enumerate(words)
        for b in range(64)
        if (w >> b) & 1
    }
    want_bits = {
        int(r["p"])
        for r in items.select(
            F.explode(F.array(*bloom_positions(F.col("x"), 512, 2))).alias("p")
        ).distinct().collect()
    }
    assert got_bits == want_bits
    # Membership of the build set is total.
    assert bloom_member(items, "x", words, 512, 2).where(~F.col("maybe")).count() == 0


def test_decontaminate_bloom_superset_of_exact(spark, sf_smoke):
    from sum_spark.operators.decontam import decontaminate, decontaminate_bloom

    docs = load_table(spark, sf_smoke, "documents")
    bench = docs.where(F.col("doc_id") % 11 == 0)
    corpus = docs.where(F.col("doc_id") % 11 != 0)
    exact = {r["doc_id"]: r["n_hits"] for r in decontaminate(corpus, bench).collect()}
    bloom = {
        r["doc_id"]: r["n_hits"] for r in decontaminate_bloom(corpus, bench).collect()
    }
    assert set(exact) <= set(bloom)
    for d, n in exact.items():
        assert bloom[d] >= n


def test_kmv_mergeability_and_accuracy(spark, sf_smoke):
    """sketch(A) merge sketch(B) == sketch(A union B) — the roll-up
    property that lets per-shard sketches combine without re-reading
    data — and the estimator lands within its ~1/sqrt(k-2) error band."""
    from sum_spark.operators.sketch import kmv_estimate, kmv_merge, kmv_sketch

    docs = load_table(spark, sf_smoke, "documents")
    items = docs.select(F.col("doc_id").alias("x"))
    a = items.where(F.col("x") % 2 == 0)
    b = items.where(F.col("x") % 2 != 0)
    merged = kmv_merge(kmv_sketch(a, "x"), kmv_sketch(b, "x"))
    full = kmv_sketch(items, "x")
    assert [r["h"] for r in merged.collect()] == [r["h"] for r in full.collect()]
    # Accuracy: within 4 standard errors of exact (k=32 -> se ~ 18%).
    [e] = kmv_estimate(full).collect()
    exact = items.where(F.col("x").isNotNull()).distinct().count()
    assert e["n_vals"] == 32
    assert abs(e["est"] - exact) <= 4 * exact / (30 ** 0.5)


def test_kmv_exact_fallback_under_k(spark):
    from sum_spark.operators.sketch import kmv_estimate, kmv_sketch

    items = spark.createDataFrame(
        [(f"v{i % 7}",) for i in range(100)] + [(None,)], "x string"
    )
    sk = kmv_sketch(items, "x", k=32)
    [e] = kmv_estimate(sk, k=32).collect()
    assert e["n_vals"] == 7 and e["est"] == 7  # exact when under k; NULL skipped


def test_histogram_exact_counts_sums_and_merge(spark, sf_smoke):
    """Fixed-bucket histogram: cells match an exact per-bucket reference,
    and hist(A) merge hist(B) == hist(A union B) — the per-shard roll-up
    property (cell-wise BIGINT sums, so equality is exact)."""
    from sum_spark.operators.sketch import histogram_fixed, histogram_merge

    ev = load_table(spark, sf_smoke, "events")
    got = {
        r["bucket"]: (r["n"], r["s_fixed"])
        for r in histogram_fixed(ev, "value", width=50.0).collect()
    }
    expected: dict[int, list[int]] = {}
    for r in ev.select("value").collect():
        cents = round(r["value"] * 100)
        b = cents // 5000
        cell = expected.setdefault(b, [0, 0])
        cell[0] += 1
        cell[1] += cents
    assert got == {b: (n, s) for b, (n, s) in expected.items()}

    a = histogram_fixed(ev.where(F.col("event_id") % 2 == 0), "value", width=50.0)
    b = histogram_fixed(ev.where(F.col("event_id") % 2 != 0), "value", width=50.0)
    merged = {
        r["bucket"]: (r["n"], r["s_fixed"]) for r in histogram_merge(a, b).collect()
    }
    assert merged == got


def test_histogram_layout_invariant(spark, sf_smoke):
    """Bucket placement and per-bucket sums are integer arithmetic, so the
    histogram is identical under hostile partition layouts (the property
    a cross-row DOUBLE sum would not have)."""
    from sum_spark.operators.sketch import histogram_fixed

    ev = load_table(spark, sf_smoke, "events").select("value")
    rows = lambda d: sorted(
        tuple(r) for r in histogram_fixed(d, "value", width=50.0).collect()
    )
    assert rows(ev.coalesce(1)) == rows(ev.repartition(17, F.col("value")))


def test_histogram_quantile_within_bucket_width(spark, sf_smoke):
    """Quantiles answered FROM the histogram land within one bucket
    width of the exact quantile — the value-units error bound the
    fixed-bucket profile trades for its bounded size."""
    from sum_spark.operators.sketch import histogram_fixed, histogram_quantile

    ev = load_table(spark, sf_smoke, "events")
    width = 50.0
    h = histogram_fixed(ev, "value", width=width)
    got = {
        r["p"]: r["est"]
        for r in histogram_quantile(h, [0.1, 0.5, 0.9], width=width).collect()
    }
    vals = sorted(r["value"] for r in ev.select("value").collect())
    for p in (0.1, 0.5, 0.9):
        exact = vals[min(len(vals) - 1, int(p * len(vals)))]
        assert abs(got[p] - exact) <= width + 1e-9, (p, got[p], exact)


def test_histogram_quantile_fixed_matches_float_form(spark, sf_smoke):
    """The integer fixed-point quantile (the hash-checkable form) agrees
    with the float interpolation to fixed-point resolution, and carries
    the same one-bucket-width bound vs the exact quantile."""
    from sum_spark.operators.sketch import (
        histogram_fixed,
        histogram_quantile,
        histogram_quantile_fixed,
    )

    ev = load_table(spark, sf_smoke, "events")
    width = 50.0
    h = histogram_fixed(ev, "value", width=width)
    fx = {
        (r["p_num"], r["p_den"]): r["est_fp"]
        for r in histogram_quantile_fixed(h, [(1, 2), (9, 10)], width=width).collect()
    }
    fl = {
        r["p"]: r["est"]
        for r in histogram_quantile(h, [0.5, 0.9], width=width).collect()
    }
    vals = sorted(r["value"] for r in ev.select("value").collect())
    for (pn, pd), est_fp in fx.items():
        p = pn / pd
        est = est_fp / (1000 * 100)  # 1/(1000*scale) value units
        assert abs(est - fl[p]) < 1e-3  # same interpolation, integer floor
        exact = vals[min(len(vals) - 1, int(p * len(vals)))]
        assert abs(est - exact) <= width + 1e-9


def test_histogram_grouped_reaggregates_to_ungrouped(spark, sf_smoke):
    """Per-group cells merge (group dropped) into exactly the ungrouped
    histogram — the property that lets one grouped pass serve both the
    per-domain and the corpus-wide distribution view."""
    from sum_spark.operators.sketch import histogram_fixed, histogram_merge

    ev = load_table(spark, sf_smoke, "events")
    grouped = histogram_fixed(ev, "value", width=50.0, group_cols=["event_type"])
    collapsed = sorted(
        tuple(r) for r in histogram_merge(grouped.drop("event_type")).collect()
    )
    direct = sorted(
        tuple(r) for r in histogram_fixed(ev, "value", width=50.0).collect()
    )
    assert collapsed == direct
    # Grouped cells themselves match per-group direct builds.
    types = [r["event_type"] for r in ev.select("event_type").distinct().collect()]
    for t in types[:2]:
        sub = sorted(
            tuple(r)
            for r in histogram_fixed(
                ev.where(F.col("event_type") == t), "value", width=50.0
            ).collect()
        )
        got = sorted(
            (r["bucket"], r["n"], r["s_fixed"])
            for r in grouped.where(F.col("event_type") == t)
            .select("bucket", "n", "s_fixed")
            .collect()
        )
        assert got == sub


def test_histogram_quantile_fixed_grouped(spark, sf_smoke):
    """Grouped quantiles from grouped cells == the ungrouped operator run
    per group — no cross-group leakage in the cumulative windows."""
    from sum_spark.operators.sketch import histogram_fixed, histogram_quantile_fixed

    ev = load_table(spark, sf_smoke, "events")
    grouped = histogram_fixed(ev, "value", width=50.0, group_cols=["event_type"])
    got = {
        (r["event_type"], r["p_num"], r["p_den"]): r["est_fp"]
        for r in histogram_quantile_fixed(
            grouped, [(1, 2), (9, 10)], width=50.0, group_cols=["event_type"]
        ).collect()
    }
    types = [r["event_type"] for r in ev.select("event_type").distinct().collect()]
    expected = {}
    for t in types:
        sub = histogram_fixed(
            ev.where(F.col("event_type") == t), "value", width=50.0
        )
        for r in histogram_quantile_fixed(sub, [(1, 2), (9, 10)], width=50.0).collect():
            expected[(t, r["p_num"], r["p_den"])] = r["est_fp"]
    assert got == expected and len(got) == 2 * len(types)


def test_histogram_drift_total_variation(spark, sf_smoke):
    """TV drift between snapshots: 0 for identical distributions, the
    exact integer-ppm half-L1 for differing ones (checked against a
    Python fraction reference), 1e6 for disjoint supports."""
    from fractions import Fraction

    from sum_spark.operators.sketch import histogram_drift, histogram_fixed

    ev = load_table(spark, sf_smoke, "events")
    h_all = histogram_fixed(ev, "value", width=50.0)
    [same] = histogram_drift(h_all, h_all).collect()
    assert same["tv_ppm"] == 0 and same["n_a"] == same["n_b"]

    lo = histogram_fixed(ev.where(F.col("value") < 100), "value", width=50.0)
    [d] = histogram_drift(h_all, lo).collect()
    cells_a = {r["bucket"]: r["n"] for r in h_all.collect()}
    cells_b = {r["bucket"]: r["n"] for r in lo.collect()}
    na, nb = sum(cells_a.values()), sum(cells_b.values())
    tv = sum(
        abs(Fraction(cells_a.get(k, 0), na) - Fraction(cells_b.get(k, 0), nb))
        for k in set(cells_a) | set(cells_b)
    ) / 2
    assert d["tv_ppm"] == int(tv * 1_000_000)
    assert 0 < d["tv_ppm"] < 1_000_000

    hi = histogram_fixed(ev.where(F.col("value") >= 100), "value", width=50.0)
    # Disjoint only if no bucket straddles the cut: 100.00 is a bucket
    # boundary at width 50, so lo and hi supports are disjoint.
    [x] = histogram_drift(lo, hi).collect()
    assert x["tv_ppm"] == 1_000_000


def test_histogram_drift_by_group_matches_per_group(spark, sf_smoke):
    """Grouped drift vs the merged corpus reference == running the
    ungrouped drift once per group against that reference."""
    from sum_spark.operators.sketch import (
        histogram_drift,
        histogram_drift_by_group,
        histogram_fixed,
        histogram_merge,
    )

    ev = load_table(spark, sf_smoke, "events")
    grouped = histogram_fixed(ev, "value", width=50.0, group_cols=["event_type"])
    corpus = histogram_merge(grouped.drop("event_type"))
    got = {
        r["event_type"]: (r["n_g"], r["n_ref"], r["tv_ppm"])
        for r in histogram_drift_by_group(
            grouped, ["event_type"], corpus
        ).collect()
    }
    types = [r["event_type"] for r in ev.select("event_type").distinct().collect()]
    for t in types:
        own = grouped.where(F.col("event_type") == t).select(
            "bucket", "n", "s_fixed"
        )
        [d] = histogram_drift(own, corpus).collect()
        # histogram_drift(a, b) reports (n_a, n_b); by_group reports vs
        # the reference — same quantities, same exact ppm.
        assert got[t] == (d["n_a"], d["n_b"], d["tv_ppm"])
    assert len(got) == len(types)


def test_hll_mergeability_registers_and_accuracy(spark, sf_smoke):
    """sketch(A) merge sketch(B) == sketch(A union B) (register-exact:
    MAX is the HLL merge law), estimate within 5% at m=4096, and the
    regsum digest matches the DuckDB rebuild of the same registers."""
    import duckdb

    from sum_spark.operators.sketch import (
        duck_hll_sql,
        hll_estimate,
        hll_merge,
        hll_regsum,
        hll_sketch,
    )

    docs = load_table(spark, sf_smoke, "documents")
    items = docs.select(F.col("doc_id").alias("x"))
    a = items.where(F.col("x") % 2 == 0)
    b = items.where(F.col("x") % 2 != 0)
    merged = hll_merge(hll_sketch(a, "x"), hll_sketch(b, "x"))
    full = hll_sketch(items, "x")
    key = lambda df: sorted((r["idx"], r["rho"]) for r in df.collect())
    assert key(merged) == key(full)

    exact = items.distinct().count()
    [e] = hll_estimate(full).collect()
    assert abs(e["est"] - exact) <= 0.05 * exact

    [rs] = hll_regsum(full).collect()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_smoke}/documents.parquet')"
    )
    cte = duck_hll_sql("SELECT doc_id AS x FROM documents", "t")
    [(duck_rs,)] = con.sql(
        f"WITH {cte} SELECT regsum FROM hllsum_t"
    ).fetchall()
    assert rs["regsum"] == duck_rs


def test_hll_grouped_layout_invariant(spark, sf_smoke):
    """Grouped registers are identical under a different partition
    layout (pure integer MAX aggregation — no float, no order
    sensitivity), and null items are skipped."""
    from sum_spark.operators.sketch import hll_sketch

    docs = load_table(spark, sf_smoke, "documents").select(
        "source", F.col("doc_id").alias("x")
    )
    with_null = docs.unionByName(
        docs.limit(1).select("source", F.lit(None).cast("long").alias("x"))
    )
    sk1 = hll_sketch(with_null, "x", ("source",))
    sk2 = hll_sketch(with_null.repartition(17, "x"), "x", ("source",))
    key = lambda df: sorted(
        (r["source"], r["idx"], r["rho"]) for r in df.collect()
    )
    assert key(sk1) == key(sk2)
    assert key(hll_sketch(docs, "x", ("source",))) == key(sk1)  # NULL skipped


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ---------------------------------------------------------------------------


def _mg_check_guarantee(exact_rows, summary_rows, n, k):
    """The mergeable-summaries guarantee against exact counts: est never
    exceeds true, any item's undercount <= n/(k+1), summary size <= k,
    and every item heavier than the bound is present."""
    bound = n // (k + 1)
    est = dict(summary_rows)
    assert len(est) <= k
    for w, true in exact_rows:
        e = est.get(w, 0)
        assert e <= true, (w, e, true)
        assert true - e <= bound, (w, e, true, bound)
        if true > bound:
            assert w in est, (w, true, bound)


def test_mg_guarantee_on_corpus_tokens(spark, sf_smoke):
    from sum_spark.operators.sketch import mg_summary

    toks = _tok(spark, sf_smoke)
    k = 16  # small capacity so prunes genuinely fire at smoke scale
    summary = [
        (r["item"], r["est"]) for r in mg_summary(toks, "w", k=k).collect()
    ]
    exact = [
        (r["w"], r["n"])
        for r in toks.groupBy("w").agg(F.count("*").alias("n")).collect()
    ]
    n = sum(c for _, c in exact)
    _mg_check_guarantee(exact, summary, n, k)


def test_mg_layout_invariant_guarantee(spark):
    """The guarantee must hold under ANY partition layout (which prunes
    fire differs; the bound may not)."""
    from sum_spark.operators.sketch import mg_summary

    rows = [(f"hot{i % 3}",) for i in range(600)] + [
        (f"tail{i}",) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "item string")
    exact = [
        (r["item"], r["n"])
        for r in df.groupBy("item").agg(F.count("*").alias("n")).collect()
    ]
    n = 1000
    for parts in (1, 13):
        got = [
            (r["item"], r["est"])
            for r in mg_summary(df.repartition(parts), "item", k=8).collect()
        ]
        _mg_check_guarantee(exact, got, n, 8)
        # the hot items dominate the tail and must always surface
        items = {w for w, _ in got}
        assert {"hot0", "hot1", "hot2"} <= items


def test_mg_merge_keeps_combined_guarantee(spark):
    from sum_spark.operators.sketch import mg_merge, mg_summary

    a = spark.createDataFrame(
        [(f"a{i % 5}",) for i in range(300)] + [(f"t{i}",) for i in range(100)],
        "item string",
    )
    b = spark.createDataFrame(
        [(f"a{i % 5}",) for i in range(200)] + [(f"u{i}",) for i in range(100)],
        "item string",
    )
    k = 8
    merged = [
        (r["item"], r["est"])
        for r in mg_merge(
            mg_summary(a, "item", k=k), mg_summary(b, "item", k=k), k=k
        ).collect()
    ]
    exact = [
        (r["item"], r["n"])
        for r in a.unionByName(b)
        .groupBy("item")
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    _mg_check_guarantee(exact, merged, 700, k)


def test_mg_weighted_build_equals_guarantee_on_weights(spark):
    """weight_col folds pre-aggregated counts: the bound is over total
    WEIGHT, and a <= k-distinct input reproduces counts exactly (no
    prune ever fires)."""
    from sum_spark.operators.sketch import mg_summary

    pre = spark.createDataFrame(
        [(f"w{i}", (i + 1) * 10) for i in range(6)], "item string, tf long"
    )
    got = {
        r["item"]: r["est"]
        for r in mg_summary(pre, "item", k=8, weight_col="tf").collect()
    }
    assert got == {f"w{i}": (i + 1) * 10 for i in range(6)}


# ---------------------------------------------------------------------------
# Log-bucketed digest (unknown-range mergeable quantiles)
# ---------------------------------------------------------------------------


def _py_log_bucket(fx: int, bits: int) -> int:
    """Pure-Python reference for the log2 bucket mapping."""
    if fx <= 0:
        return -1
    s = max(fx.bit_length() - 1 - bits, 0)
    return s * (1 << bits) + (fx >> s)


def _py_bucket_bounds(bucket: int, bits: int) -> tuple[int, int]:
    s = max(bucket // (1 << bits) - 1, 0)
    lo = (bucket - s * (1 << bits)) << s
    return lo, lo + (1 << s) - 1


def test_log_histogram_matches_python_reference(spark):
    """Bucket mapping equals the bit-arithmetic reference over a torture
    domain: exact small region, powers of two, boundary +/-1, huge
    magnitudes, zero and negatives."""
    from sum_spark.operators.sketch import log_histogram

    vals = sorted(
        {v for p in range(0, 50) for v in (2**p - 1, 2**p, 2**p + 1)}
        | set(range(0, 300))
        | {-5, -1, 10**14, 3**20}
    )
    df = spark.createDataFrame([(float(v),) for v in vals], "value double")
    got = {
        r["bucket"]: r["n"]
        for r in log_histogram(df, "value", bits=7, scale=1).collect()
    }
    from collections import Counter

    want = Counter(_py_log_bucket(v, 7) for v in vals)
    assert got == dict(want)
    # monotone: bucket order equals value order on positives
    pos = [v for v in vals if v > 0]
    bks = [_py_log_bucket(v, 7) for v in pos]
    assert bks == sorted(bks)
    # every positive value lies inside its bucket's bounds, and the
    # bounds are relative-error-tight
    for v in pos:
        lo, hi = _py_bucket_bounds(_py_log_bucket(v, 7), 7)
        assert lo <= v <= hi, v
        assert (hi - lo) <= lo / (1 << 7) or hi == lo, v


def test_log_histogram_merge_equals_direct_build(spark, sf_smoke):
    """merge(build(A), build(B)) == build(A ∪ B) cell-for-cell — the
    mergeability contract, on real data split three ways."""
    from sum_spark.operators.sketch import log_histogram, log_histogram_merge
    from sum_spark.sources.tables import load_table

    ev = load_table(spark, sf_smoke, "events")
    parts = [ev.where(F.pmod(F.col("event_id"), F.lit(3)) == i) for i in range(3)]
    merged = sorted(
        map(
            tuple,
            log_histogram_merge(
                *[log_histogram(p, "value") for p in parts]
            ).collect(),
        )
    )
    direct = sorted(map(tuple, log_histogram(ev, "value").collect()))
    assert merged == direct and merged


def _round_half_away(x: float, scale: int = 100) -> int:
    """Spark ROUND semantics (half away from zero) — Python's round()
    is banker's and diverges on .5 midpoints, which would make the
    reference disagree with the engine's fixed-point image."""
    import math

    m = abs(x) * scale
    return int(math.floor(m + 0.5)) * (1 if x >= 0 else -1)


def test_log_quantile_bounds_contain_exact_rank_value(spark):
    """For adversarial distributions (heavy skew, ties, 12 orders of
    magnitude, nonpositives) every quantile interval contains the exact
    integer-rank value and honors the relative-width bound."""
    import random

    from sum_spark.operators.sketch import log_histogram, log_histogram_quantile

    rng = random.Random(7)
    vals = (
        [0.0] * 5
        + [-3.5] * 4
        + [rng.lognormvariate(0, 4) for _ in range(500)]
        + [10.0**9] * 3
        + [1e-2] * 50
    )
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    ps = [(1, 100), (1, 4), (1, 2), (3, 4), (99, 100)]
    cells = log_histogram(df, "value", scale=100).persist()
    got = {
        (r["p_num"], r["p_den"]): (r["lo_fp"], r["hi_fp"])
        for r in log_histogram_quantile(cells, ps).collect()
    }
    fx = sorted(_round_half_away(v) for v in vals)
    n = len(fx)
    for pn, pd in ps:
        e = fx[(n * pn + pd - 1) // pd - 1]  # exact integer-rank value
        lo, hi = got[(pn, pd)]
        if lo is None:  # nonpositive bucket: value known only as <= 0
            assert e <= 0 and hi == 0, (pn, pd, e)
        else:
            assert lo <= e <= hi, (pn, pd, e, lo, hi)
            assert hi - lo <= max(lo >> 7, 0) + 1, (pn, pd)
    cells.unpersist()


def test_log_quantile_grouped_bounds_per_group(spark, sf_smoke):
    """Grouped digests answer per-group quantile intervals: each group's
    bounds bracket that group's own exact integer-rank value (the
    per-domain length/score-quantile view of curation)."""
    from sum_spark.operators.sketch import log_histogram, log_histogram_quantile
    from sum_spark.sources.tables import load_table

    ev = load_table(spark, sf_smoke, "events")
    cells = log_histogram(ev, "value", group_cols=["event_type"]).persist()
    ps = [(1, 2), (9, 10)]
    got = {
        (r["event_type"], r["p_num"], r["p_den"]): (r["rank"], r["lo_fp"], r["hi_fp"])
        for r in log_histogram_quantile(
            cells, ps, group_cols=["event_type"]
        ).collect()
    }
    rows = ev.select("event_type", "value").collect()
    by_g: dict = {}
    for r in rows:
        by_g.setdefault(r["event_type"], []).append(_round_half_away(r["value"]))
    assert set(g for g, _, _ in got) == set(by_g)
    for (g, pn, pd), (rank, lo, hi) in got.items():
        fx = sorted(by_g[g])
        r = (len(fx) * pn + pd - 1) // pd
        assert rank == r
        e = fx[r - 1]
        if lo is None:
            assert e <= 0 and hi == 0
        else:
            assert lo <= e <= hi, (g, pn, pd, e, lo, hi)
    cells.unpersist()


def test_kmv_and_cms_escape_hostile_seeds_and_column_names(spark):
    """ADVICE r8: seeds/column names interpolated into expr strings must
    escape quotes/backticks (litsql.qid/qstr) — a quoted seed used to
    break parsing of a public operator the Column API handled fine."""
    from sum_spark.functions.hashing import hash60
    from sum_spark.operators.sketch import count_min_estimate, count_min_build, kmv_sketch

    df = spark.createDataFrame(
        [(f"item{i % 7}",) for i in range(50)], "`it's` string"
    )
    seed = "o'brien\\x"
    got = sorted(
        r["h"] for r in kmv_sketch(df, "it's", k=64, seed=seed).collect()
    )
    want = sorted(
        r["h"]
        for r in df.select(
            hash60(F.concat(F.lit(seed + ":"), F.col("`it's`").cast("string")))
            .alias("h")
        )
        .distinct()
        .collect()
    )
    assert got == want

    # count_min_estimate interpolates the probe column name into
    # _cells_sql — a quote-bearing name must round-trip end-to-end
    # (backtick-bearing names are rejected by F.col itself upstream,
    # so qid's doubling is exercised via the kmv item_col path above)
    grid = count_min_build(df, "it's")
    est = count_min_estimate(
        grid, spark.createDataFrame([("item0",)], "`it's` string"), "it's"
    )
    [row] = est.where(F.col("it's") == "item0").collect()
    assert row["est"] >= 50 // 7
