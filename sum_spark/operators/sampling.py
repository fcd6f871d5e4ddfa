"""Deterministic sampling / data-mixture operators — the composition
step of a training pipeline (up/down-weight sources into a mix).

Sampling is hash-based Bernoulli per stratum: a row is kept iff
hash(stratum:id) mod M < rate*M. Fully deterministic and reproducible
(re-running, or running on a different cluster layout, selects the same
rows — unlike rand()-based sampling), partition-local (no shuffle, no
driver state), and exactly the shape used to mix corpora at 100 TB. The
hash is the portable md5-based family (functions/hashing.py) so the
DuckDB oracle selects the identical sample.

No reference analog (the reference has no sampling surface).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sum_spark.functions.hashing import hash60
from sum_spark.plans.scale import spread_for_compute

SAMPLE_MOD = 10_000  # rate resolution 1/10000 — integer thresholds, no float compare


def sample_stratified(
    df: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.0,
    strat_col: str = "source",
    id_col: str = "doc_id",
    ordered: bool = True,
) -> DataFrame:
    """Keep each row of stratum s with probability rates[s] (default_rate
    for unlisted strata), decided by a deterministic hash of
    '<stratum>:<id>'. Rates are quantized to 1/10000 so the keep test is
    an integer comparison (exact on both engines).

    Output: the sampled (doc_id, stratum, bucket) rows, ordered.
    """
    thresholds = {s: int(round(r * SAMPLE_MOD)) for s, r in rates.items()}
    default_thr = int(round(default_rate * SAMPLE_MOD))
    thr = F.lit(default_thr)
    for s, t in sorted(thresholds.items()):
        thr = F.when(F.col(strat_col) == s, F.lit(t)).otherwise(thr)
    bucket = F.pmod(
        hash60(F.concat(F.col(strat_col), F.lit(":"), F.col(id_col).cast("string"))),
        F.lit(SAMPLE_MOD),
    )
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.col(strat_col).alias("stratum"),
            bucket.alias("bucket"),
            thr.alias("__thr"),
        )
        .where(F.col("bucket") < F.col("__thr"))
        .select("doc_id", "stratum", "bucket")
        .transform(lambda d: d.orderBy("doc_id") if ordered else d)
    )


def duck_sample_stratified_sql(
    rates: dict[str, float],
    default_rate: float = 0.0,
    strat_col: str = "source",
    id_col: str = "doc_id",
    table: str = "documents",
) -> str:
    """DuckDB twin of sample_stratified, generated from the same rates."""
    from sum_spark.functions.hashing import duck_hash60

    default_thr = int(round(default_rate * SAMPLE_MOD))
    cases = " ".join(
        f"WHEN '{s}' THEN {int(round(r * SAMPLE_MOD))}"
        for s, r in sorted(rates.items())
    )
    h = duck_hash60(f"{strat_col} || ':' || {id_col}")
    return f"""
    WITH s AS (
      SELECT {id_col} AS doc_id, {strat_col} AS stratum,
             {h} % {SAMPLE_MOD} AS bucket,
             CASE {strat_col} {cases} ELSE {default_thr} END AS thr
      FROM {table}
    )
    SELECT doc_id, stratum, bucket FROM s WHERE bucket < thr ORDER BY doc_id
    """


SPLIT_MOD = 1_000_000  # holdout resolution 1 ppm — integer compare, no floats


def split_holdout(
    df: DataFrame,
    holdout_ppm: int = 10_000,
    id_col: str = "doc_id",
    seed: str = "holdout-0",
    split_col: str = "split",
) -> DataFrame:
    """Label every row 'train' or 'holdout' (carve an eval set out of the
    corpus): holdout iff hash('<seed>:<id>') mod 1e6 < holdout_ppm.

    The decision hashes the id ALONE — independent of corpus composition,
    partitioning, and engine — so a document's split NEVER flips as the
    corpus grows or is re-curated. That stability is the contamination
    guarantee: a doc once held out for eval can't silently drift into a
    later training run's train split (the failure mode of rand()- or
    position-based splits). Different seeds give independent splits
    (cross-validation folds = k seeds).

    Map-only (no shuffle, no state); returns df + split_col. Filter and
    drop the column for the materialized halves.
    """
    thr = int(holdout_ppm)
    if not 0 <= thr <= SPLIT_MOD:
        raise ValueError("holdout_ppm must be in [0, 1_000_000]")
    bucket = F.pmod(
        hash60(F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string"))),
        F.lit(SPLIT_MOD),
    )
    return df.withColumn(
        split_col,
        F.when(bucket < F.lit(thr), F.lit("holdout")).otherwise(F.lit("train")),
    )


def sample_exact_k(
    df: DataFrame,
    k: int,
    strat_col: str = "source",
    id_col: str = "doc_id",
    ordered: bool = True,
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum — the fixed-budget twin
    of sample_stratified's fixed-rate Bernoulli ("give me 10k docs per
    domain", not "give me 1% of each domain").

    Selection is the k smallest deterministic hashes of '<stratum>:<id>'
    (ties broken by id): a uniform-without-replacement draw that is
    reproducible across runs, engines, and cluster layouts, and NESTED —
    the k=5 sample is always a subset of the k=10 sample, so budgets can
    be revised without re-drawing (hash-ordered prefixes, the same
    property consistent hashing gives caches).

    Scale shape: rank-filter over a window is rewritten by Catalyst into
    WindowGroupLimit (Spark 3.5+) — each input partition pre-filters to
    its local top-k per stratum BEFORE the shuffle, so the exchange
    carries at most k*partitions rows per stratum, never the corpus.
    Asserted in tests/test_plans.py.

    Output: (doc_id, stratum, pick) with pick in 1..k, ordered by doc_id.
    """
    from pyspark.sql import Window

    h = hash60(
        F.concat(F.col(strat_col), F.lit(":"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy("stratum").orderBy("__h", "doc_id")
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.col(strat_col).alias("stratum"),
            h.alias("__h"),
        )
        .withColumn("pick", F.row_number().over(w))
        .where(F.col("pick") <= k)
        .select("doc_id", "stratum", "pick")
        .transform(lambda d: d.orderBy("doc_id") if ordered else d)
    )


def weighted_priorities(
    df: DataFrame,
    weight_col: str = "weight",
    id_col: str = "doc_id",
    strat_col: str = "source",
    seed: str = "wk",
    max_weight: int = 64,
) -> DataFrame:
    """Each row's weighted-draw priority — the MIN of its weight-many
    replica hashes (see sample_weighted_k). Exposed separately because
    priorities are MERGEABLE (min is associative and per-row
    deterministic): per-shard/per-batch k-smallest priority sets union
    into the global draw without revisiting data — the basis of the
    streaming weighted sample. Output: (doc_id, stratum, __pri).

    MAP-ONLY: the replica minimum folds inside one row via
    array_min(transform(sequence(...))) — no explode, no aggregate, no
    exchange (an explode + groupBy(doc_id) form would shuffle one
    narrow row per document for a minimum whose inputs never leave the
    row). The global top-k downstream is then the plan's ONLY exchange
    (TakeOrderedAndProject's k-row merge)."""
    w_clamped = F.greatest(
        F.lit(1), F.least(F.col(weight_col).cast("long"), F.lit(max_weight))
    )
    # The lambda closes over seed/id_col as plain Python values (no
    # default-arg capture — the HOF arity gotcha, functions/hashing.py).
    pri = F.array_min(
        F.transform(
            F.sequence(F.lit(0), (w_clamped - 1).cast("int")),
            lambda r: hash60(
                F.concat(
                    F.lit(f"{seed}:"),
                    F.col(id_col).cast("string"),
                    F.lit(":"),
                    r.cast("string"),
                )
            ),
        )
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.col(strat_col).alias("stratum"),
        pri.alias("__pri"),
    )


def sample_weighted_k(
    df: DataFrame,
    k: int,
    weight_col: str = "weight",
    id_col: str = "doc_id",
    strat_col: str = "source",
    seed: str = "wk",
    max_weight: int = 64,
    per_stratum: bool = False,
    ordered: bool = True,
) -> DataFrame:
    """Exactly min(k, n) rows drawn WITHOUT replacement with probability
    proportional to integer weights — the weighted twin of
    sample_exact_k ("draw 10k docs, high-quality docs w times likelier").
    ``per_stratum=True`` draws k per stratum instead of k overall (the
    weighted twin of sample_exact_k's fixed per-domain budget).

    Mechanism (successive minima): each row conceptually owns
    ``weight`` replicas; replica r gets the deterministic 60-bit hash of
    '<seed>:<id>:<r>', and the row's priority is the MIN over its
    replicas. The k smallest priorities win. The global minimum replica
    is uniform over all W replicas, so the first pick lands on row i
    with probability w_i/W exactly; removing its replicas and repeating
    gives the classic sequential weighted draw (the Efraimidis-Spirakis
    scheme realized with INTEGER hashes instead of u^(1/w) floats — no
    cross-engine float ordering, a SQL oracle reproduces the exact
    sample). Like sample_exact_k, the draw is nested: k=5 is a prefix
    of k=10.

    Scale shape: the explode is bounded by ``max_weight`` replicas per
    row (weights clamp to [1, max_weight]); MIN-per-id collapses
    map-side before any exchange; the top-k compiles to
    TakeOrderedAndProject. Cost is O(rows * avg_weight) hash
    evaluations, zero corpus shuffles.

    Output: (doc_id, stratum, pick) with pick in 1..k = selection
    order, ordered by doc_id.
    """
    pri = weighted_priorities(df, weight_col, id_col, strat_col, seed, max_weight)
    from pyspark.sql import Window

    if per_stratum:
        # k per stratum: rank-filter over a stratum-partitioned window —
        # Catalyst rewrites it to WindowGroupLimit (pre-shuffle local
        # top-k per stratum), the sample_exact_k scale shape.
        w = Window.partitionBy("stratum").orderBy("__pri", "doc_id")
        ranked = (
            pri.withColumn("pick", F.row_number().over(w).cast("long"))
            .where(F.col("pick") <= k)
        )
    else:
        ranked = (
            pri.orderBy("__pri", "doc_id")
            .limit(k)
            .withColumn(
                "pick",
                F.row_number().over(Window.orderBy("__pri", "doc_id")).cast("long"),
            )
        )
    return ranked.select("doc_id", "stratum", "pick").transform(
        lambda d: d.orderBy("doc_id") if ordered else d
    )


def duck_sample_weighted_k_sql(
    k: int,
    weight_expr: str,
    id_col: str = "doc_id",
    strat_col: str = "source",
    seed: str = "wk",
    max_weight: int = 64,
    table: str = "documents",
) -> str:
    """DuckDB twin of sample_weighted_k (same hash, same clamp, same
    tie-break)."""
    from sum_spark.functions.hashing import duck_hash60

    h = duck_hash60(
        f"'{seed}:' || CAST({id_col} AS VARCHAR) || ':' || CAST(r AS VARCHAR)"
    )
    return f"""
    WITH reps AS (
      SELECT {id_col} AS doc_id, {strat_col} AS stratum,
             unnest(range(GREATEST(1, LEAST(CAST({weight_expr} AS BIGINT), {max_weight})))) AS r
      FROM {table}
    ),
    pri AS (
      SELECT doc_id, stratum, MIN({h}) AS p
      FROM reps GROUP BY doc_id, stratum
    ),
    top AS (SELECT doc_id, stratum, p FROM pri ORDER BY p, doc_id LIMIT {k})
    SELECT doc_id, stratum,
           CAST(ROW_NUMBER() OVER (ORDER BY p, doc_id) AS BIGINT) AS pick
    FROM top ORDER BY doc_id
    """


def duck_sample_exact_k_sql(
    k: int,
    strat_col: str = "source",
    id_col: str = "doc_id",
    table: str = "documents",
) -> str:
    """DuckDB twin of sample_exact_k (same hash, same tie-break)."""
    from sum_spark.functions.hashing import duck_hash60

    h = duck_hash60(f"{strat_col} || ':' || {id_col}")
    return f"""
    WITH r AS (
      SELECT {id_col} AS doc_id, {strat_col} AS stratum,
             row_number() OVER (
               PARTITION BY {strat_col} ORDER BY {h}, {id_col}
             ) AS pick
      FROM {table}
    )
    SELECT doc_id, stratum, pick FROM r WHERE pick <= {k} ORDER BY doc_id
    """


def corpus_mixture(
    df: DataFrame, strat_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Mixture bookkeeping per stratum: document and token counts plus
    each stratum's share of corpus tokens in parts-per-million, rounded
    half-up. One partial-aggregated groupBy; the total re-joins via a
    broadcast of the one-row grand total. Output: (stratum, n_docs,
    n_tokens, token_share_ppm) ordered.

    token_share_ppm is a BIGINT — (n*2e6 + t) div (2t), i.e. half-up
    rounding of n/t to 6 decimals WITHOUT the final float division.
    Earlier float-emitting variants (ROUND, then double floor/1e6)
    diverged from DuckDB in the last mantissa bit (the engines contract
    a*b+c differently); an integer cannot. The arithmetic runs in
    DECIMAL(38,0) (HUGEINT on the oracle side) so n*2e6 cannot overflow
    at any corpus size."""
    per = df.groupBy(F.col(strat_col).alias("stratum")).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split(F.col(text_col), " "))).alias("n_tokens"),
    )
    total = per.agg(F.sum("n_tokens").alias("__tot"))
    ppm = F.expr(
        "CAST((CAST(n_tokens AS DECIMAL(38,0)) * 2000000"
        " + CAST(__tot AS DECIMAL(38,0)))"
        " div (2 * CAST(__tot AS DECIMAL(38,0))) AS BIGINT)"
    )
    return (
        per.join(F.broadcast(total))
        .select("stratum", "n_docs", "n_tokens", ppm.alias("token_share_ppm"))
        .orderBy("stratum")
    )


def plan_mixture(
    df: DataFrame,
    weights: dict[str, int],
    strat_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Mixture REBALANCING plan: given integer target weights per
    stratum, compute the per-stratum downsampling rates that make the
    sampled corpus's token mixture match the target, maximizing total
    tokens (no upsampling: the binding stratum — smallest t_s/w_s —
    keeps rate 1, everything else downsamples proportionally).

    All arithmetic is integer (DECIMAL(38,0)/HUGEINT div, the
    corpus_mixture pattern) so the plan is bit-identical on any engine
    and layout: capacity T = min over weighted strata of t_s * W / w_s
    (W = sum of weights), rate_ppm_s = T * w_s * 1e6 div (W * t_s),
    planned_tokens_s = t_s * rate_ppm_s div 1e6. Strata without a
    (positive) weight plan to rate 0. Feed rate_ppm/1e6 into
    sample_stratified to execute the plan reproducibly.

    One groupBy + a broadcast one-row capacity join — same shape and
    scale posture as corpus_mixture. Output: (stratum, n_docs, n_tokens,
    weight, rate_ppm, planned_tokens) ordered.
    """
    if not weights or any(int(w) < 0 for w in weights.values()):
        raise ValueError("plan_mixture needs non-negative integer weights")
    W = int(sum(int(w) for w in weights.values()))
    if W <= 0:
        raise ValueError("plan_mixture needs at least one positive weight")
    per = df.groupBy(F.col(strat_col).alias("stratum")).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split(F.col(text_col), " "))).alias("n_tokens"),
    )
    wmap = F.create_map(
        *[F.lit(x) for kv in weights.items() for x in (kv[0], int(kv[1]))]
    )
    j = per.withColumn("weight", F.coalesce(wmap[F.col("stratum")], F.lit(0)).cast("long"))
    cap = j.where((F.col("weight") > 0) & (F.col("n_tokens") > 0)).agg(
        F.min(
            F.expr(
                f"CAST(n_tokens AS DECIMAL(38,0)) * {W} div CAST(weight AS DECIMAL(38,0))"
            )
        ).alias("__cap")
    )
    rate = F.when(
        (F.col("weight") > 0) & (F.col("n_tokens") > 0),
        F.expr(
            f"CAST(__cap AS DECIMAL(38,0)) * weight * 1000000"
            f" div ({W} * CAST(n_tokens AS DECIMAL(38,0)))"
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    return (
        j.join(F.broadcast(cap))
        .select("stratum", "n_docs", "n_tokens", "weight", rate.alias("rate_ppm"))
        .withColumn(
            "planned_tokens",
            F.expr(
                "CAST(CAST(n_tokens AS DECIMAL(38,0)) * CAST(rate_ppm AS DECIMAL(38,0))"
                " div 1000000 AS BIGINT)"
            ),
        )
        .orderBy("stratum")
    )


def temperature_weights(
    df: DataFrame,
    temperature: float,
    strat_col: str = "source",
    text_col: str = "text",
    scale: int = 1_000_000,
) -> dict[str, int]:
    """Integer target weights for temperature-based mixture rebalancing
    (w_s proportional to t_s^(1/T) — the multilingual-training standard:
    T=1 keeps the natural mixture, T->inf flattens toward uniform).
    Returns a dict to feed plan_mixture, so the PLAN itself stays
    integer-exact; only this input derivation uses floating pow.

    Driver-side on a stratum-count-sized aggregate (sources/languages,
    not documents). The pow rounding is performed once here, identically
    for every consumer of the returned dict — reproducible run-to-run on
    a platform; a different libm could flip a last-ulp rounding, so ship
    the DICT (not the temperature) to reproduce a plan elsewhere.
    """
    t = float(temperature)
    if t <= 0:
        raise ValueError("temperature must be positive")
    rows = (
        df.groupBy(F.col(strat_col).alias("stratum"))
        .agg(F.sum(F.size(F.split(F.col(text_col), " "))).alias("n_tokens"))
        .collect()
    )
    toks = {r["stratum"]: int(r["n_tokens"]) for r in rows if r["n_tokens"]}
    if not toks:
        raise ValueError("no stratum with tokens")
    mx = max(toks.values())
    inv = 1.0 / t
    return {
        s: max(1, int(math.floor((n / mx) ** inv * scale + 0.5)))
        for s, n in toks.items()
    }


# Skew refinement knobs (VERDICT r10 #1): a bucket is HOT when its
# population exceeds _HOT_FACTOR x the equi-depth target (total/n);
# each hot bucket re-quantizes its own key range into up to _MAX_SPLITS
# finer buckets, for at most _MAX_REFINE_LEVELS rounds. Detection rides
# on the per-bucket histogram the placement operators need anyway, so
# the un-skewed fast path costs exactly one extra aggregate over the
# already-checkpointed narrow projection.
_HOT_FACTOR = 4
_MAX_SPLITS = 64
_MAX_REFINE_LEVELS = 3


def _monotone_bucket(df: DataFrame, order_col: str, n: int):
    """A deterministic integer bucket id, MONOTONE in ``order_col`` —
    the layout-independent replacement for repartitionByRange +
    spark_partition_id in the two-pass placement operators: rows are
    quantized into ~``n`` contiguous key ranges by min/max arithmetic
    (the bounds ride in as ONE broadcast row, no driver collect), so
    per-bucket local order concatenates to exactly the global order.
    Because the bucket is a pure function of the DATA (never of physical
    partition layout), there is nothing for AQE to re-roll and nothing
    to checkpoint — and unlike repartitionByRange there is NO hidden
    sampling pass, which used to execute the upstream plan (token
    counting over the full text column) twice per placement.

    Skew-ADAPTIVE (round 11; the round-10 equi-width form degenerated
    toward a single-task sort on lumpy keys — VERDICT r10 #1): after the
    equi-width quantization, a per-bucket (count, min, max) histogram —
    computed from the checkpointed projection, and returned so callers
    never re-aggregate — detects buckets holding > _HOT_FACTOR x the
    equi-depth target; each is re-quantized over ITS OWN key range into
    ~count/target finer buckets (params ship as one broadcast equi-join
    table), recursively up to _MAX_REFINE_LEVELS rounds. Refinement is
    a finer quantization of the SAME key, so it preserves both
    monotonicity and the equal-keys-share-a-bucket invariant; a bucket
    hot because of ONE key value (min == max) is irreducible by
    construction — exactly the hot range a sampled range partitioner
    cannot split either — and is left alone. Equal keys land in one
    bucket, so a non-unique first order column never straddles.

    The bucketed projection is MATERIALIZED (localCheckpoint) in the
    scan's own layout: the placement operators read it from two
    branches (per-bucket stats and the data pass), and unmaterialized
    each branch would re-run the upstream scan — for packing, the
    full-text token count. Unlike the repartitionByRange form this
    replaced, materialization is a pure PERFORMANCE choice: a recompute
    reproduces identical buckets (data-derived, never layout-derived),
    so nothing depends on the checkpoint for correctness — and there is
    no range-sampling pass, which used to execute that same upstream
    scan a second time before the shuffle. There is deliberately NO
    repartition before the checkpoint (r13): AQE-era checkpoints do not
    preserve hash partitioning into consumers, so each consumer pays
    its own __b exchange either way, and a pre-checkpoint shuffle was a
    second full pass of the data over the wire for nothing.

    NULL keys map to a dedicated bucket -1 (below every data bucket):
    window ORDER BY sorts NULLS FIRST ascending, so bucket -1 first is
    exactly the global NULL position — and a NULL bucket id would
    otherwise silently DROP those rows at the offsets equi-join
    (integer path: NULL arithmetic; float path: F.least skips the NULL
    floor and misplaces them at n-1). ADVICE r10 (medium).

    Returns (bucketed df ++ [__b], "__b", {bucket: row count}) — the
    histogram is the final (post-refinement) bucket census, exact, so
    callers that only need per-bucket COUNTS (assign_contiguous_ids'
    offsets) build them driver-side instead of re-aggregating. Supports
    integral, floating and decimal keys (floor((x-mn)/w) is monotone
    under IEEE rounding)."""
    dt = df.schema[order_col].dataType.simpleString()
    is_int = dt in ("tinyint", "smallint", "int", "bigint")
    mn, mx = F.col("__mn"), F.col("__mx")
    x = F.col(order_col)
    bounds = df.agg(F.min(order_col).alias("__mn"), F.max(order_col).alias("__mx"))
    d = df.crossJoin(F.broadcast(bounds))
    if is_int:
        # Integer end-to-end (DIV, never `/` + cast): width >= 1,
        # bucket = (x-mn) DIV width — quotients of 60-bit keys lose low
        # bits as doubles (the cap_domain_tokens lesson; monotonicity
        # would survive, but integer ops make the bucketing exact).
        # The subtractions run in DECIMAL(38,0): a full-range BIGINT key
        # set makes (mx - mn) exceed int64 (ANSI: ARITHMETIC_OVERFLOW;
        # non-ANSI: silent wrap — property-tested with +-2^63 keys), and
        # DIV by a literal >= 2 brings the quotient back into long range
        # (DIV 1 on the full range would wrap, hence the clamp — two
        # buckets instead of one is harmless).
        b = F.expr(
            f"CAST((CAST(`{order_col}` AS DECIMAL(38,0)) - "
            f"CAST(__mn AS DECIMAL(38,0))) DIV "
            f"((CAST(__mx AS DECIMAL(38,0)) - CAST(__mn AS DECIMAL(38,0))) "
            f"DIV {max(2, int(n))} + 1) AS BIGINT)"
        )
    else:
        w = (mx.cast("double") - mn.cast("double")) / F.lit(float(n))
        b = F.when(w <= 0.0, F.lit(0)).otherwise(
            F.least(
                F.floor((x.cast("double") - mn.cast("double")) / w),
                F.lit(n - 1),
            )
        ).cast("long")
    # NO pre-checkpoint repartition (guide §2.4, r13): the checkpoint
    # does not preserve hash partitioning through LogicalRDD under AQE
    # (and skew refinement rewrites __b anyway), so every consumer was
    # re-exchanging by __b AFTER the checkpoint regardless — the
    # repartition here was a second, wasted corpus-sized shuffle
    # (verified: ENSURE_REQUIREMENTS hashpartitioning(__b) sits above
    # Scan ExistingRDD in every committed placement plan). The window /
    # histogram consumers pay the one required __b exchange themselves;
    # the checkpoint materializes in the scan's own layout.
    out = (
        d.withColumn("__b", F.when(x.isNull(), F.lit(-1)).otherwise(b).cast("long"))
        .drop("__mn", "__mx")
        .localCheckpoint()
    )
    # Skew refinement: histogram (one aggregate over the checkpointed
    # narrow projection per round), split hot buckets by a finer
    # quantization of the same key, repeat. The loop shape guarantees the
    # RETURNED histogram was computed on the RETURNED bucket column —
    # offsets built from it always join.
    spark = df.sparkSession
    cur = out
    counts: dict[int, int] = {}
    for level in range(_MAX_REFINE_LEVELS + 1):
        hist = (
            cur.groupBy("__b")
            .agg(
                F.count("*").alias("__c"),
                F.min(order_col).alias("__lo"),
                F.max(order_col).alias("__hi"),
            )
            .collect()
        )
        counts = {int(r["__b"]): int(r["__c"]) for r in hist}
        if level == _MAX_REFINE_LEVELS:
            break
        total = sum(counts.values())
        target = max(1, -(-total // max(1, int(n))))
        hot = [
            r
            for r in hist
            if r["__c"] > _HOT_FACTOR * target
            and r["__lo"] is not None
            and r["__lo"] != r["__hi"]
            # A NaN __hi (finite rows sharing the last bucket with NaN
            # keys) passes the != check (NaN != NaN) but the float width
            # below would be NaN -> every row lands in sub __ssp-1, a
            # no-op split retried each level. Skip: ranks stay exact,
            # the bucket just keeps its mixed population.
            and not (isinstance(r["__hi"], float) and math.isnan(r["__hi"]))
        ]
        if not hot:
            break
        conv = int if is_int else float
        params = [
            (
                int(r["__b"]),
                conv(r["__lo"]),
                conv(r["__hi"]),
                min(_MAX_SPLITS, max(2, -(-int(r["__c"]) // target))),
            )
            for r in hot
        ]
        K = max(p[3] for p in params)
        vt = "long" if is_int else "double"
        pdf = spark.createDataFrame(
            params, f"__b long, __slo {vt}, __shi {vt}, __ssp long"
        )
        if is_int:
            # Same DECIMAL(38,0) end-to-end integer arithmetic as the
            # level-0 quantization (width >= 1 by the +1; sub < __ssp by
            # the DIV algebra — r DIV (r DIV s + 1) < s for all r, s > 0).
            sub = F.expr(
                f"CAST((CAST(`{order_col}` AS DECIMAL(38,0)) - "
                f"CAST(__slo AS DECIMAL(38,0))) DIV "
                f"((CAST(__shi AS DECIMAL(38,0)) - CAST(__slo AS DECIMAL(38,0))) "
                f"DIV CAST(__ssp AS DECIMAL(38,0)) + 1) AS BIGINT)"
            )
        else:
            w = (F.col("__shi") - F.col("__slo")) / F.col("__ssp").cast("double")
            sub = (
                F.when(w <= 0.0, F.lit(0))
                .otherwise(
                    F.least(
                        F.floor((x.cast("double") - F.col("__slo")) / w),
                        F.col("__ssp") - F.lit(1),
                    )
                )
                .cast("long")
            )
        # Left join: non-hot buckets get sub 0; new id b*K + sub is
        # monotone because sub < K within every bucket. NULL keys sit in
        # bucket -1 (never hot: lo/hi NULL), landing at -K — still first.
        cur = (
            cur.join(F.broadcast(pdf), "__b", "left")
            .withColumn(
                "__b",
                (F.col("__b") * F.lit(int(K)) + F.coalesce(sub, F.lit(0))).cast(
                    "long"
                ),
            )
            .drop("__slo", "__shi", "__ssp")
        )
    return cur, "__b", counts


def assign_contiguous_ids(
    df: DataFrame,
    order_cols: list[str],
    id_name: str = "sample_id",
    num_partitions: int | None = None,
    total_name: str | None = None,
) -> DataFrame:
    """Assign contiguous 1..N ids in global (order_cols) order WITHOUT a
    single-partition sort — the scale-correct form of
    row_number() OVER (ORDER BY ...), which Spark executes on one task.

    Two-pass: quantize the leading order key into ~n contiguous,
    skew-refined ranges (``_monotone_bucket`` — a pure data function, so
    no sampling pass, no physical-layout dependence, nothing for AQE to
    re-roll), number rows locally per bucket, then add each bucket's
    cumulative row-count offset. The offsets come straight from the
    bucket histogram ``_monotone_bucket`` already computed (its skew
    detector needs it), accumulated DRIVER-side — one tiny broadcast
    table, no second aggregate, no single-partition window. order_cols
    must be a unique key for the ids to be deterministic.

    ``total_name`` adds the TOTAL row count as a literal column: the
    census the offsets come from is the exact count, so a caller that
    needs N (q16's percent_rank/cume_dist/ntile denominators) gets it
    for free instead of re-aggregating the frame and broadcast-joining
    one row back — one fewer pass + exchange per consumer (guide §1.2,
    VERDICT r12 #5)."""
    from pyspark.sql.window import Window

    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    cols = [F.col(c) for c in order_cols]
    d, bcol, counts = _monotone_bucket(df, order_cols[0], n)
    local = Window.partitionBy(bcol).orderBy(*cols)
    run = 0
    offs = []
    for b in sorted(counts):
        offs.append((b, run))
        run += counts[b]
    offsets = spark.createDataFrame(offs, f"{bcol} long, __off long")
    out = (
        d.join(F.broadcast(offsets), bcol)
        .withColumn(id_name, (F.col("__off") + F.row_number().over(local)).cast("long"))
        .drop(bcol, "__off")
    )
    if total_name is not None:
        out = out.withColumn(total_name, F.lit(int(run)).cast("long"))
    return out

def pack_sequences(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
    token_base: int = 0,
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Sequence packing: lay documents (in id order) into fixed
    token-budget packs — the step that turns a filtered corpus into
    training examples. A document's pack is floor(tokens-before / budget),
    i.e. contiguous documents share a pack until the budget rolls over
    (the standard streaming-concat packing approximation; documents are
    not split).

    Scale shape: the global running token sum is computed the same
    two-pass way as assign_contiguous_ids — quantize doc_id into ~n
    contiguous ranges (``_monotone_bucket``: a pure data function, so
    no range-partitioner sampling pass re-running the token count over
    the full text column, no layout dependence; its checkpoint is
    performance-only — recompute reproduces identical buckets),
    bucket-local cumulative sums, plus a broadcast of one token-total
    row per bucket. No single-task window; the bucket groupBy and the
    local window share one shuffle key.

    Output: (doc_id, n_tokens, pack_id) ordered by doc_id.
    """
    from pyspark.sql.window import Window

    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    # NULL text packs as 0 tokens: packing must assign EVERY input row a
    # pack (a NULL pack_id would silently drop the doc from pack-grouped
    # training assembly); a no-token doc rides along in whatever pack the
    # budget is currently filling. ``n_tokens_col`` supplies precomputed
    # counts (the incremental path's stored per-doc metadata) — packing
    # then never touches text at all.
    if n_tokens_col is not None:
        nt = F.coalesce(F.col(n_tokens_col).cast("long"), F.lit(0))
    else:
        nt = F.coalesce(
            F.size(F.split(F.col(text_col), " ")).cast("long"), F.lit(0)
        )
    d, bcol, _counts = _monotone_bucket(
        df.select(F.col(id_col).alias("doc_id"), nt.alias("n_tokens")),
        "doc_id",
        n,
    )
    local = (
        Window.partitionBy(bcol)
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sums = d.groupBy(bcol).agg(F.sum("n_tokens").alias("__c"))
    off_w = Window.orderBy(bcol).rowsBetween(Window.unboundedPreceding, -1)
    offsets = sums.select(
        bcol, F.coalesce(F.sum("__c").over(off_w), F.lit(0)).alias("__off")
    )
    # token_base shifts the running sum's origin: a caller packing an
    # APPEND (streaming/pack.py) passes the token total of everything
    # already packed, so pack ids continue the existing sequence instead
    # of restarting at 0. Placement is integer DIV end-to-end — a double
    # quotient is only exact below 2^53 total tokens, and the corpus this
    # is designed for can cross that.
    cum_before = (
        F.lit(int(token_base))
        + F.col("__off")
        + F.sum("n_tokens").over(local)
        - F.col("n_tokens")
    )
    return (
        d.join(F.broadcast(offsets), bcol)
        .select("doc_id", "n_tokens", cum_before.cast("long").alias("__before"))
        .select(
            "doc_id",
            "n_tokens",
            F.expr(f"__before DIV {int(budget)}").cast("long").alias("pack_id"),
        )
        .orderBy("doc_id")
    )


def global_shuffle(df: DataFrame, seed: str = "shuffle-0", id_col: str = "doc_id") -> DataFrame:
    """Deterministic pseudorandom global ordering — the corpus shuffle
    before training-example serialization. Position = rank of
    hash60(seed || ':' || id) with the id as tie-break, so the order is
    reproducible across runs/clusters and re-seedable by changing `seed`.
    Reuses the two-pass contiguous-id assignment (no single-task sort).

    Output: (doc_id, shuffle_pos) ordered by shuffle_pos.
    """
    h = hash60(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")))
    d = df.select(F.col(id_col).alias("doc_id")).withColumn("__h", h)
    out = assign_contiguous_ids(d, ["__h", "doc_id"], id_name="shuffle_pos")
    return out.select("doc_id", "shuffle_pos").orderBy("shuffle_pos")


CAP_SUBBUCKET_BITS = 6  # 64 hash-range sub-buckets per stratum
_CAP_BUCKET_DIV = 1 << (60 - CAP_SUBBUCKET_BITS)


def cap_domain_tokens(
    df: DataFrame,
    cap_tokens: int,
    strat_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "cap",
) -> DataFrame:
    """Per-domain token budget cap — the over-represented-source guard
    of corpus curation ("no domain contributes more than T tokens"):
    within each stratum, documents are taken greedily in deterministic
    hash order until the running token total would exceed ``cap_tokens``.

    Output: one row per input document —
    (doc_id, stratum, n_tok, cum_tokens, kept) — where ``kept`` is true
    iff the doc's inclusive running total fits the cap; filter on it for
    the capped corpus, aggregate it for the per-domain report. Hash
    order (not ingest order) makes the kept set a uniform sample of the
    domain and reproducible on any cluster layout; the portable md5-60
    hash means a SQL oracle reproduces the exact kept set.

    Scale shape: a naive ``SUM OVER (PARTITION BY stratum ORDER BY h)``
    sorts each domain on ONE task — a hot domain (a crawl is 30% one
    site) is a straggler or an OOM. Instead the prefix sum is two-level:
    the hash's top ``CAP_SUBBUCKET_BITS`` bits split each stratum into
    hash-RANGE sub-buckets (bucket id is monotone in h, so per-bucket
    order concatenates to exactly the flat order); per-(stratum, bucket)
    token sums roll into per-bucket starting offsets via a window over
    the <=64 bucket rows per stratum; each document then needs only a
    window within its (stratum, bucket) — every sort task is bounded at
    ~1/64 of the hottest domain, and both shuffles share the
    (stratum, bucket) key so Catalyst reuses one exchange. Offsets join
    back by key (no broadcast hint: the offset table is one row per
    (stratum, bucket) — tiny per stratum but proportional to the number
    of domains, so Spark's own sizing decides).
    """
    cap = int(cap_tokens)
    nt = F.coalesce(F.size(F.split(F.col(text_col), " ")).cast("long"), F.lit(0))
    h = hash60(
        F.concat_ws(
            ":", F.lit(seed), F.col(strat_col), F.col(id_col).cast("string")
        )
    )
    # Staged projection: __h computed once, bucket derived from the
    # column (not the md5 expression) — the Catalyst re-inlining pitfall.
    per = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(strat_col).alias("stratum"),
        nt.alias("n_tok"),
        h.alias("__h"),
    ).withColumn(
        # Integer shift, not float division: h is 60-bit and a double
        # mantissa is 53 — float quotients round across bucket
        # boundaries and silently break the flat-order equivalence.
        "__b",
        F.shiftright(F.col("__h"), 60 - CAP_SUBBUCKET_BITS),
    )
    from pyspark.sql.window import Window

    off_w = (
        Window.partitionBy("stratum")
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        per.groupBy("stratum", "__b")
        .agg(F.sum("n_tok").alias("__bsum"))
        .select(
            "stratum",
            "__b",
            F.coalesce(F.sum("__bsum").over(off_w), F.lit(0)).alias("__off"),
        )
    )
    local = (
        Window.partitionBy("stratum", "__b")
        .orderBy("__h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        per.join(offsets, ["stratum", "__b"])
        .withColumn("cum_tokens", F.col("__off") + F.sum("n_tok").over(local))
        .withColumn("kept", F.col("cum_tokens") <= F.lit(cap))
        .select("doc_id", "stratum", "n_tok", "cum_tokens", "kept")
    )


def duck_cap_domain_sql(
    cap_tokens: int,
    table: str = "documents",
    strat_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "cap",
) -> str:
    """DuckDB CTE chain for cap_domain_tokens (flat single-window form —
    the two-level prefix sum is order-equivalent by construction).
    Yields ``capd``; select (doc_id, stratum, n_tok, cum_tokens, kept)."""
    from sum_spark.functions.hashing import duck_hash60

    h = duck_hash60(
        f"'{seed}' || ':' || {strat_col} || ':' || CAST({id_col} AS VARCHAR)"
    )
    return f"""
    capd AS (
      SELECT {id_col} AS doc_id, {strat_col} AS stratum,
             CAST(COALESCE(len(string_split({text_col}, ' ')), 0) AS BIGINT) AS n_tok,
             CAST(SUM(COALESCE(len(string_split({text_col}, ' ')), 0)) OVER (
               PARTITION BY {strat_col} ORDER BY {h}, {id_col}
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum_tokens
      FROM {table}
    )"""


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list,
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Deterministic per-group top-k: the rows ranking 1..k within each
    group under ``order_cols``, with the rank appended as ``rank_col``.

    The generic form of the per-source vocabulary pass (q31 'dvocab')
    and the shape behind per-domain "best documents" selection: a
    row_number + rank filter that Spark compiles to WindowGroupLimit —
    each input partition pre-filters to its LOCAL top-k per group before
    the window exchange, so the shuffle carries at most k * partitions
    rows per group and a 100 TB group never funnels through one sorted
    task (the same plan property sample_exact_k is pinned to).

    ``order_cols`` must be a TOTAL order within every group (add the id
    as the last tie-break) — with ties the rank, and therefore the
    selected set, would be partition-order-dependent.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w).cast("long"))
        .where(F.col(rank_col) <= int(k))
    )
