"""Count-min sketch: fixed-size approximate frequency counting.

The curation use case: exact token/URL/n-gram frequency over a 100 TB
corpus needs a shuffle keyed by a vocabulary whose long tail is billions
of distinct items; a count-min sketch replaces that with a FIXED
depth x width integer grid (kilobytes) that any number of executors can
build with one map-side pass + one tiny aggregation, at the cost of a
one-sided error: estimates only ever OVER-count (est >= true count, with
overshoot <= 2N/width at 1 - (1/2)^depth probability). That makes it the
scale path for heavy-hitter discovery, boilerplate detection, and
stop-list construction — anything where "roughly how frequent" is enough
and under-counting would be wrong.

Engine shape: the grid is built as a (depth, bucket) -> count table of
at most depth*width rows, so the only shuffle is an aggregation onto a
by-construction-bounded key space — partial (map-side) combine does
almost all the work and the exchange moves kilobytes regardless of
corpus size. Estimation joins the query items against that bounded grid.

Hashes are the portable 60-bit md5 family (functions/hashing.py), so a
DuckDB oracle reproduces every cell and every estimate bit-for-bit —
the sketch is deterministic, not sampled.

No reference analog (the reference has no approximate-counting surface);
this extends the curation family per the build brief, alongside the
exact heavy-hitters pass (queries/extra.q31 'vocab' leg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sum_spark.functions.hashing import duck_hash60, hash60
from sum_spark.functions.litsql import qid as _litsql_qid
from sum_spark.functions.litsql import qstr_duck as _litsql_qstr_duck


def _bucket(item: F.Column, depth_i: int, width: int) -> F.Column:
    """Row ``depth_i``'s bucket for an item: portable 60-bit hash of the
    seeded item string, modulo the row width."""
    return hash60(F.concat(F.lit(f"cms{depth_i}:"), item)) % F.lit(width)


def _cells_sql(item_sql: str, depth: int, width: int) -> str:
    """The depth x (depth, bucket) struct-array SQL for an item — one
    F.expr string instead of depth x ~12 py4j Column round trips
    (VERDICT r7 #2: the same hash60-mod-width buckets, batched)."""
    return "array(" + ", ".join(
        f"struct(CAST({i} AS BIGINT) AS depth,"
        f" CAST(conv(substring(md5(concat('cms{i}:', {item_sql})), 1, 15),"
        f" 16, 10) AS BIGINT) % {width} AS bucket)"
        for i in range(depth)
    ) + ")"


def count_min_build(
    items: DataFrame,
    item_col: str,
    width: int = 256,
    depth: int = 4,
    weight_col: str | None = None,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Build the sketch grid: (group..., depth, bucket, c) with c = total
    weight of items hashing into that cell (count when ``weight_col`` is
    None).

    Two-level aggregate: per-item totals first (the natural partial
    combine — duplicate occurrences of a hot item collapse map-side),
    then the scatter onto depth*width cells. NULL items are skipped (a
    NULL hashes to NULL and would silently pool into one cell).

    ``group_cols`` keeps one grid per group (per-domain/per-language hot
    items) on a key space bounded by groups x depth x width; grouped
    grids SUM into the ungrouped grid (CMS linearity — the same
    one-grouped-pass-serves-both contract as histogram_fixed).
    """
    groups = list(group_cols)
    it = F.col(item_col)
    w = F.col(weight_col).cast("long") if weight_col else F.count("*").cast("long")
    per_item = (
        items.where(it.isNotNull())
        .groupBy(*groups, it.alias("__item"))
        .agg((F.sum(w) if weight_col else w).alias("__n"))
    )
    cells = F.expr(_cells_sql("__item", depth, width))
    return (
        per_item.select(*groups, F.explode(cells).alias("__c"), "__n")
        .groupBy(
            *groups,
            F.col("__c.depth").alias("depth"),
            F.col("__c.bucket").alias("bucket"),
        )
        .agg(F.sum("__n").alias("c"))
    )


def count_min_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    item_col: str,
    width: int = 256,
    depth: int = 4,
) -> DataFrame:
    """Point-query the sketch: adds an ``est`` column (BIGINT) to
    ``queries`` — min over the ``depth`` cells the item hashes into.

    ``width``/``depth`` MUST match the build call (the bucket function is
    recomputed here; a mismatch silently reads the wrong cells). The grid
    is broadcast: its size is bounded by construction at depth*width rows
    (a few KB) independent of corpus size, which is exactly the case
    where a broadcast hint is safe without measurement. Items absent from
    the corpus may still return a positive est (collision mass) — CMS
    never under-counts, including counting phantom mass for misses.
    """
    probes = queries.withColumn(
        "__cell", F.explode(F.expr(_cells_sql(_litsql_qid(item_col), depth, width)))
    )
    out_cols = [F.col(c) for c in queries.columns]
    return (
        probes.join(
            F.broadcast(sketch),
            (F.col("__cell.depth") == sketch["depth"])
            & (F.col("__cell.bucket") == sketch["bucket"]),
            "left",
        )
        .groupBy(*out_cols)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("est"))
    )


def count_min_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketch grids built with the SAME width/depth: CMS is linear
    (sketch(A u B) = sketch(A) + sketch(B) cell-wise), so per-shard /
    per-day / per-micro-batch grids roll up by summing cells — a
    groupBy over <= depth*width rows, never over data."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("depth", "bucket").agg(F.sum("c").alias("c"))


def duck_count_min_sql(
    item_sql: str,
    top_k: int,
    width: int = 256,
    depth: int = 4,
) -> str:
    """DuckDB CTE chain reproducing build + estimate for the ``top_k``
    most frequent items of ``item_sql`` (a FROM-able subquery producing a
    single column ``w``). Yields CTEs ``cms_cnt``/``cms_cells``/
    ``cms_top``/``cms_est``; select from ``cms_est`` (w, tf, est)."""
    seeds = ", ".join(str(i) for i in range(depth))
    h = duck_hash60("'cms' || d.d || ':' || w")
    return f"""
    cms_cnt AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS tf FROM ({item_sql}) GROUP BY w
    ),
    cms_cells AS (
      SELECT d.d AS depth, {h} % {width} AS bucket, SUM(tf) AS c
      FROM cms_cnt CROSS JOIN (SELECT unnest([{seeds}]) AS d) d
      GROUP BY 1, 2
    ),
    cms_top AS (SELECT w, tf FROM cms_cnt ORDER BY tf DESC, w LIMIT {top_k}),
    cms_est AS (
      SELECT t.w, t.tf, CAST(MIN(c.c) AS BIGINT) AS est
      FROM cms_top t
      CROSS JOIN (SELECT unnest([{seeds}]) AS d) d
      JOIN cms_cells c
        ON c.depth = d.d AND c.bucket = {h} % {width}
      GROUP BY t.w, t.tf
    )"""


# ---------------------------------------------------------------------------
# Bloom filter — set membership in fixed bits, map-side
# ---------------------------------------------------------------------------

BLOOM_M_BITS = 65536  # 8 KiB of bits = 1024 packed BIGINT words
BLOOM_K = 3


def bloom_positions(item: F.Column, m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K):
    """The ``k`` bit positions an item sets/probes — portable md5-60
    hashes of the seeded item string, so a SQL oracle reproduces the
    exact filter. ``item`` is cast to string (pass hashes as-is)."""
    s = item.cast("string")
    return [
        hash60(F.concat(F.lit(f"bloom{i}:"), s)) % F.lit(m_bits) for i in range(k)
    ]


def bloom_build_bits(
    items: DataFrame,
    item_col: str,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> list[int]:
    """Build the filter: returns ``m_bits // 64`` packed signed-64 words.

    The only driver traffic is the DISTINCT set-bit positions — bounded
    at ``m_bits`` values (<= 0.5 MB at the default) by construction
    regardless of item count, the same bounded-collect contract as the
    k x d centroid sums (clustering.py). Build cost is one map + one
    tiny distinct over positions.
    """
    if m_bits % 64 != 0:
        raise ValueError("m_bits must be a multiple of 64")
    pos = bloom_positions(F.col(item_col), m_bits, k)
    rows = (
        items.where(F.col(item_col).isNotNull())
        .select(F.explode(F.array(*pos)).alias("p"))
        .distinct()
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in rows:
        p = int(r["p"])
        words[p >> 6] |= 1 << (p & 63)
    # Two's-complement fold into signed 64-bit (Spark LongType literals;
    # getbit reads the raw bit pattern, so semantics are unchanged).
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_member(
    df: DataFrame,
    item_col: str,
    words: list[int],
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
    out_col: str = "maybe",
) -> DataFrame:
    """Adds ``out_col``: true iff the item MAY be in the set the filter
    was built from (never a false negative; false-positive rate
    ~(set_bits/m_bits)^k). Pure map-side column expression — the packed
    words ride along as one constant-folded array literal and each probe
    is k getbit lookups, so membership costs NO join and NO shuffle at
    any corpus size; that is the entire point versus broadcasting the
    exact (unbounded) hash set."""
    pos = bloom_positions(F.col(item_col), m_bits, k)
    # the 1024 packed words as ONE expr string (VERDICT r7 #2): the
    # Column form cost ~2k py4j round trips per plan build. String-cast
    # literals cover the full signed-64 range (a bare min-long literal
    # parses as DECIMAL through unary minus).
    words_sql = "array(" + ", ".join(
        f"CAST('{int(w)}' AS BIGINT)" for w in words
    ) + ")"
    staged = df.select(
        "*", *[p.alias(f"__bp{i}") for i, p in enumerate(pos)]
    ).withColumn("__bw", F.expr(words_sql))
    checks = [
        f"getbit(element_at(__bw, CAST(__bp{i} DIV 64 AS INT) + 1),"
        f" CAST(__bp{i} % 64 AS INT)) = 1"
        for i in range(k)
    ]
    return (
        staged.withColumn(out_col, F.expr(" AND ".join(checks)))
        .drop("__bw", *[f"__bp{i}" for i in range(k)])
    )


def duck_bloom_member_sql(
    item_sql: str, m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K
) -> tuple[str, str]:
    """(CTE, predicate-template) pair for the oracle: ``bloom_bits`` =
    the distinct set positions of the build items (``item_sql`` yields
    one column ``x``); the returned predicate string tests membership of
    an expression substituted for ``{x}`` at call sites."""
    build_hashes = [
        duck_hash60("'bloom" + str(i) + ":' || CAST(x AS VARCHAR)")
        for i in range(k)
    ]
    probe_hashes = [
        duck_hash60("'bloom" + str(i) + ":' || CAST({x} AS VARCHAR)")
        for i in range(k)
    ]
    pos_union = "\n      UNION ALL ".join(
        f"SELECT {h} % {m_bits} AS p FROM ({item_sql})" for h in build_hashes
    )
    cte = f"""
    bloom_bits AS (
      SELECT DISTINCT p FROM (
      {pos_union}
      )
    )"""
    pred = " AND ".join(
        f"({h} % {m_bits}) IN (SELECT p FROM bloom_bits)" for h in probe_hashes
    )
    return cte, pred


# ---------------------------------------------------------------------------
# Fixed-bucket histogram — mergeable one-pass distribution profile
# ---------------------------------------------------------------------------


def histogram_fixed(
    df: DataFrame,
    value_col: str,
    width: float,
    lo: float = 0.0,
    scale: int = 100,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """One-pass fixed-width histogram: (bucket, n, s_fixed) with
    ``bucket = (round(v*scale) - round(lo*scale)) DIV round(width*scale)``,
    ``n`` the row count and ``s_fixed`` the bucket's value sum in
    ``1/scale`` fixed-point units.

    This is the bounded-size scale path for "what does this column's
    distribution look like" over an arbitrarily large table: one map-side
    pass + an aggregation onto a key space bounded by the value RANGE
    (never the row count), with partial combine doing all the work — the
    same exchange shape as the CMS grid. Like CMS/KMV it is MERGEABLE
    (``histogram_merge``): per-shard/per-day histograms roll up by
    summing cells without touching the data again, which Spark's own
    ``histogram_numeric`` (engine-private buffer, approximate splits)
    cannot expose.

    Every step is INTEGER arithmetic on ``round(v*scale)`` — for values
    with <= log10(scale) decimals the fixed-point image is exact, so
    bucket placement and per-bucket sums are reproducible across
    partition layouts AND engines (CLAUDE.md: float division on derived
    integers loses low bits; cross-row double sums follow partition
    order — both avoided by summing BIGINT cents). NULL values are
    skipped; values below ``lo`` are the caller's contract to exclude
    (signed DIV truncates toward zero, floor-dividing only non-negative
    offsets).

    ``group_cols`` produces per-group histograms (the per-domain /
    per-language distribution profile of corpus curation) keyed by
    (group..., bucket). Grouped cells REAGGREGATE into the ungrouped
    histogram (``histogram_merge`` drops no information — cells sum),
    so one grouped pass serves both views.
    """
    base = round(lo * scale)
    w = round(width * scale)
    if w <= 0:
        raise ValueError("width must be positive at the given scale")
    groups = list(group_cols or [])
    gq = [f"`{g}`" for g in groups]
    return (
        df.where(F.col(value_col).isNotNull())
        .selectExpr(*gq, f"CAST(ROUND(`{value_col}` * {scale}) AS BIGINT) AS __fx")
        .selectExpr(*gq, f"(__fx - {base}) DIV {w} AS bucket", "__fx")
        .groupBy(*groups, "bucket")
        .agg(
            F.expr("CAST(count(*) AS BIGINT)").alias("n"),
            F.expr("CAST(sum(__fx) AS BIGINT)").alias("s_fixed"),
        )
    )


def histogram_merge(*hists: DataFrame) -> DataFrame:
    """Merge histograms built with the SAME width/lo/scale: cell-wise
    sum of (n, s_fixed) over whatever key columns the cells carry
    (bucket, plus any group columns) — a groupBy over range-bounded
    cell rows, never over data. Dropping the group columns before the
    merge collapses grouped cells into the ungrouped histogram."""
    out = hists[0]
    for h in hists[1:]:
        out = out.unionByName(h)
    keys = [c for c in out.columns if c not in ("n", "s_fixed")]
    return out.groupBy(*keys).agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("s_fixed").cast("long").alias("s_fixed"),
    )


def histogram_quantile(
    hist: DataFrame,
    ps: list[float],
    width: float,
    lo: float = 0.0,
    scale: int = 100,
) -> DataFrame:
    """Quantile estimates from a fixed-bucket histogram: (p, est) with
    ``|est - exact_quantile| <= width`` by construction (the answer lies
    somewhere in the located bucket; linear interpolation inside it).

    This is how a stored/streamed histogram answers percentile questions
    without revisiting the data — the mergeable counterpart to
    percentile_approx, with an error bound stated in VALUE units (bucket
    width) instead of rank units. ``width``/``lo``/``scale`` MUST match
    the build call. The cumulative pass runs over the range-bounded cell
    frame (a global window over kilobytes — the documented benign case
    of an empty partitionBy, same as the post-limit top-k in search.py).
    """
    from pyspark.sql import Window

    w = round(width * scale)
    base = round(lo * scale)
    cum = hist.select(
        "bucket",
        "n",
        F.sum("n").over(Window.orderBy("bucket")).alias("__cum"),
        F.sum("n").over(
            Window.orderBy("bucket").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("__total"),
    )
    probes = hist.sparkSession.createDataFrame(
        [(float(p),) for p in ps], "p double"
    )
    # Target rank p*total; the answering bucket is the first whose
    # cumulative count reaches it. min() picks it without a second sort.
    j = probes.crossJoin(F.broadcast(cum)).where(
        F.col("__cum") >= F.col("p") * F.col("__total")
    )
    best = j.groupBy("p").agg(F.min("bucket").alias("bucket"))
    cells = cum.select("bucket", "n", (F.col("__cum") - F.col("n")).alias("__before"), "__total")
    return (
        best.join(F.broadcast(cells), "bucket")
        .select(
            "p",
            (
                (F.lit(base) + F.col("bucket") * F.lit(w)) / F.lit(scale)
                + F.lit(width)
                * (F.col("p") * F.col("__total") - F.col("__before"))
                / F.col("n")
            ).alias("est"),
        )
    )


def histogram_quantile_fixed(
    hist: DataFrame,
    ps: list[tuple[int, int]],
    width: float,
    lo: float = 0.0,
    scale: int = 100,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """``histogram_quantile`` in EXACT integer arithmetic: probabilities
    as rationals ``(p_num, p_den)`` and the estimate as a BIGINT in
    ``1/(1000*scale)`` value units — every comparison and the final
    interpolation are integer ops, so the result is bit-identical across
    engines (the hash-checkable form; the float variant's doubles are
    only incidentally portable). Same bucket-width error bound.

    The answering bucket is the first with ``p_den*cum >= p_num*total``
    (the integer form of cum >= p*total); within it,
    ``est_fp = (base + bucket*w)*1000
               + (w*1000*(p_num*total - p_den*before)) DIV (p_den*n)``
    with ``before = cum - n``. Both DIV operands are non-negative by the
    bucket choice, so Spark's truncating DIV and the oracle's floor
    division agree. Output: (group..., p_num, p_den, est_fp).

    ``group_cols`` answers each p per group from GROUPED cells (the
    per-domain median/length-p90 of curation) — the cumulative window
    partitions by group, so no group's cells ever funnel through another
    group's sort; the tiny probe table broadcasts against the cell
    frame.
    """
    w = round(width * scale)
    base = round(lo * scale)
    groups = list(group_cols or [])
    part = ", ".join(f"`{g}`" for g in groups)
    over = f"PARTITION BY {part} ORDER BY bucket" if groups else "ORDER BY bucket"
    cum = hist.selectExpr(
        *[f"`{g}`" for g in groups],
        "bucket",
        "n",
        f"sum(n) OVER ({over}) AS __cum",
        f"sum(n) OVER ({over} ROWS BETWEEN UNBOUNDED PRECEDING"
        " AND UNBOUNDED FOLLOWING) AS __total",
    )
    probes = _probe_table(hist.sparkSession, ps)
    j = cum.crossJoin(F.broadcast(probes)).where(
        F.expr("p_den * __cum >= p_num * __total")
    )
    rk_part = f"{part}, p_num, p_den" if groups else "p_num, p_den"
    first = j.selectExpr(
        "*",
        f"row_number() OVER (PARTITION BY {rk_part} ORDER BY bucket) AS __rk",
    ).where("__rk = 1")
    return first.selectExpr(
        *[f"`{g}`" for g in groups],
        "p_num",
        "p_den",
        f"CAST(({base} + bucket * {w}) * 1000"
        f" + ({w} * 1000 * (p_num * __total - p_den * (__cum - n)))"
        f" DIV (p_den * n) AS BIGINT) AS est_fp",
    )


def duck_histogram_quantile_sql(
    ps: list[tuple[int, int]], width: float, lo: float = 0.0, scale: int = 100
) -> str:
    """DuckDB CTEs rebuilding histogram_quantile_fixed from the ``hist``
    CTE (duck_histogram_sql): yields ``histq`` (p_num, p_den, est_fp)."""
    w = round(width * scale)
    base = round(lo * scale)
    values = ", ".join(f"({pn}, {pd})" for pn, pd in ps)
    return f"""
    histc AS (
      SELECT bucket, n, SUM(n) OVER (ORDER BY bucket) AS cum,
             SUM(n) OVER () AS total
      FROM hist
    ),
    histq AS (
      SELECT p_num, p_den,
             CAST(({base} + bucket * {w}) * 1000
                  + ({w} * 1000 * (p_num * total - p_den * (cum - n)))
                    // (p_den * n) AS BIGINT) AS est_fp
      FROM (
        SELECT pr.p_num, pr.p_den, c.bucket, c.n, c.cum, c.total,
               ROW_NUMBER() OVER (PARTITION BY pr.p_num, pr.p_den
                                  ORDER BY c.bucket) AS rk
        FROM (VALUES {values}) pr(p_num, p_den)
        CROSS JOIN histc c
        WHERE pr.p_den * c.cum >= pr.p_num * c.total
      )
      WHERE rk = 1
    )"""


def duck_histogram_sql(
    value_sql: str,
    width: float,
    lo: float = 0.0,
    scale: int = 100,
    grouped: bool = False,
) -> str:
    """DuckDB CTE rebuilding the histogram for ``value_sql`` (a FROM-able
    subquery with one column ``v``): yields ``hist`` (bucket, n, s_fixed).
    Same integer fixed-point pipeline; CASTs keep DuckDB's HUGEINT
    promotion out of the compared columns. With ``grouped``, ``value_sql``
    must also produce a group column ``g`` and the CTEs become ``histg``
    (g, bucket, n, s_fixed) plus ``hist`` REAGGREGATED from it — the
    same one-grouped-pass-serves-both shape as the engine side."""
    base = round(lo * scale)
    w = round(width * scale)
    if not grouped:
        return f"""
    hist AS (
      SELECT (fx - {base}) // {w} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(fx) AS BIGINT) AS s_fixed
      FROM (
        SELECT CAST(ROUND(v * {scale}) AS BIGINT) AS fx
        FROM ({value_sql}) WHERE v IS NOT NULL
      )
      GROUP BY 1
    )"""
    return f"""
    histg AS (
      SELECT g, (fx - {base}) // {w} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(fx) AS BIGINT) AS s_fixed
      FROM (
        SELECT g, CAST(ROUND(v * {scale}) AS BIGINT) AS fx
        FROM ({value_sql}) WHERE v IS NOT NULL
      )
      GROUP BY 1, 2
    ),
    hist AS (
      SELECT bucket, CAST(SUM(n) AS BIGINT) AS n,
             CAST(SUM(s_fixed) AS BIGINT) AS s_fixed
      FROM histg GROUP BY 1
    )"""


# ---------------------------------------------------------------------------
# Log-bucketed digest — mergeable quantiles WITHOUT a known value range
# ---------------------------------------------------------------------------

LOG_HIST_BITS = 7


def log_histogram(
    df: DataFrame,
    value_col: str,
    bits: int = LOG_HIST_BITS,
    scale: int = 100,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """HDR-style log2-bucketed mergeable histogram: (group..., bucket, n)
    with bounded RELATIVE error 2^-bits per bucket and NO range
    parameter — the unknown-range complement to histogram_fixed, whose
    cell space a caller must bound with lo/width.

    Bucketing is PURE INTEGER BIT ARITHMETIC on the fixed-point image
    ``fx = round(v*scale)``: with ``p = length(bin(fx)) - 1`` (both
    engines print minimal-width binary — the HLL rho idiom) and
    ``s = max(p - bits, 0)``,

        bucket = s * 2^bits + (fx >> s)        for fx >= 1
        bucket = -1                            for fx <= 0 (no relative-
                                               error claim; counted so
                                               ranks stay exact)

    which is monotone in fx, exact below 2^bits, and maps all of BIGINT
    to at most ``(63 - bits) * 2^bits`` cells — bounded by the TYPE, not
    the data. No log()/ceil() appears anywhere, so there is no float
    boundary to disagree on: a t-digest/KLL compaction is
    insertion-order-dependent and engine-private, while these cells are
    layout-independent, ORACLE-REPRODUCIBLE, and merge by cell-wise sum
    (``log_histogram_merge``) exactly like the CMS/KMV/histogram family.

    Plan shape: one map-side staged projection (fx, then s — each
    referenced twice, so both are staged to keep Catalyst from
    re-inlining) + an aggregation onto the bounded cell space; partial
    combine collapses the corpus before the exchange. ``group_cols``
    builds per-group digests that REAGGREGATE into the global one.
    """
    groups = list(group_cols or [])
    gq = [f"`{g}`" for g in groups]
    return (
        df.where(F.col(value_col).isNotNull())
        .selectExpr(*gq, f"CAST(ROUND(`{value_col}` * {scale}) AS BIGINT) AS __fx")
        .selectExpr(
            *gq,
            "__fx",
            f"GREATEST(CAST(length(bin(__fx)) AS INT) - 1 - {bits}, 0) AS __s",
        )
        .selectExpr(
            *gq,
            f"CASE WHEN __fx <= 0 THEN CAST(-1 AS BIGINT)"
            f" ELSE __s * {1 << bits} + shiftright(__fx, CAST(__s AS INT)) END"
            " AS bucket",
        )
        .groupBy(*groups, "bucket")
        .agg(F.expr("CAST(count(*) AS BIGINT)").alias("n"))
    )


def log_histogram_merge(*hists: DataFrame) -> DataFrame:
    """Merge log digests built with the SAME bits/scale: cell-wise sum
    over whatever key columns the cells carry. Dropping group columns
    first collapses grouped digests into the global one —
    merge(parts) == build(whole) exactly (property-tested)."""
    out = hists[0]
    for h in hists[1:]:
        out = out.unionByName(h)
    keys = [c for c in out.columns if c != "n"]
    return out.groupBy(*keys).agg(F.sum("n").cast("long").alias("n"))


def _probe_table(spark, ps: list[tuple[int, int]]) -> DataFrame:
    """The (p_num, p_den) probe LocalRelation as ONE spark.sql VALUES
    call — createDataFrame cost ~25 ms of py4j/conversion round trips
    per quantile invocation (VERDICT r7 #2); same plan node."""
    vals = ", ".join(f"({int(pn)}, {int(pd)})" for pn, pd in ps)
    return spark.sql(
        f"SELECT CAST(p_num AS BIGINT) AS p_num, CAST(p_den AS BIGINT) AS p_den"
        f" FROM (VALUES {vals}) AS t(p_num, p_den)"
    )


def _log_bucket_bounds_sql(bits: int) -> tuple[str, str]:
    """(lo, hi) SQL expressions (shared Spark/DuckDB integer subset) for
    the inclusive fixed-point value range of a bucket: the guarantee is
    exact-rank-value ∈ [lo, hi] with (hi-lo)/lo <= 2^-bits."""
    s = f"GREATEST(bucket DIV {1 << bits} - 1, CAST(0 AS BIGINT))"
    lo = f"shiftleft(bucket - ({s}) * {1 << bits}, CAST({s} AS INT))"
    hi = f"({lo}) + shiftleft(CAST(1 AS BIGINT), CAST({s} AS INT)) - 1"
    return lo, hi


def log_histogram_quantile(
    hist: DataFrame,
    ps: list[tuple[int, int]],
    bits: int = LOG_HIST_BITS,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Quantile BOUNDS from a log digest: (group..., p_num, p_den,
    rank, lo_fp, hi_fp) where the exact rank-``ceil(n*p)`` value
    (``rank`` = (n*p_num + p_den - 1) DIV p_den — never float p*n) is
    guaranteed to lie in [lo_fp, hi_fp], an interval of relative width
    <= 2^-bits. A quantile landing in the nonpositive bucket yields
    (NULL, 0): the value is known only to be <= 0. ``rank`` is emitted
    so a caller that wants the EXACT order statistic can fetch it as
    the (rank - count(v < lo))-th value WITHIN the interval — a
    candidate set bounded at n * 2^-bits rows by construction, which is
    how q31's verification column avoids any global sort.

    Same bounded-cell cumulative-window shape as
    histogram_quantile_fixed; every op is integer, so the bounds are
    bit-identical across engines and the accuracy claim is CHECKABLE,
    not asserted."""
    # Window/projection SQL built as strings (VERDICT r7 #2): identical
    # plan, a handful of py4j calls instead of ~80 per invocation.
    groups = list(group_cols or [])
    part = ", ".join(f"`{g}`" for g in groups)
    over = f"PARTITION BY {part} ORDER BY bucket" if groups else "ORDER BY bucket"
    cum = hist.selectExpr(
        *[f"`{g}`" for g in groups],
        "bucket",
        f"sum(n) OVER ({over}) AS __cum",
        f"sum(n) OVER ({over} ROWS BETWEEN UNBOUNDED PRECEDING"
        " AND UNBOUNDED FOLLOWING) AS __total",
    )
    probes = _probe_table(hist.sparkSession, ps)
    # Integer target rank r = ceil(p_num*total/p_den): for integer cum,
    # cum >= ceil(a/b) is exactly b*cum >= a — no float p*n anywhere.
    j = cum.crossJoin(F.broadcast(probes)).where(
        F.expr("p_den * __cum >= p_num * __total")
    )
    rk_part = f"{part}, p_num, p_den" if groups else "p_num, p_den"
    first = j.selectExpr(
        "*",
        f"row_number() OVER (PARTITION BY {rk_part} ORDER BY bucket) AS __rk",
    ).where("__rk = 1")
    lo, hi = _log_bucket_bounds_sql(bits)
    return first.selectExpr(
        *[f"`{g}`" for g in groups],
        "p_num",
        "p_den",
        "CAST((p_num * __total + p_den - 1) DIV p_den AS BIGINT) AS rank",
        f"CAST(CASE WHEN bucket < 0 THEN NULL ELSE {lo} END AS BIGINT) AS lo_fp",
        f"CAST(CASE WHEN bucket < 0 THEN 0 ELSE {hi} END AS BIGINT) AS hi_fp",
    )


def duck_log_histogram_sql(
    value_sql: str,
    bits: int = LOG_HIST_BITS,
    scale: int = 100,
    grouped: bool = False,
) -> str:
    """DuckDB CTE rebuilding log_histogram for ``value_sql`` (a FROM-able
    subquery with column ``v``, plus ``g`` when grouped): yields ``ldig``
    (bucket, n), or ``ldigg`` (g, bucket, n) when grouped. The grouped
    form deliberately does NOT emit a reaggregated global ``ldig`` — a
    caller pairing both legs builds the global digest DIRECTLY (one
    ungrouped call), so the engine-side merge of grouped cells is checked
    against an independent build, not against its own structure."""
    inner = f"""
        SELECT {"g, " if grouped else ""}CASE WHEN fx <= 0 THEN CAST(-1 AS BIGINT)
                    ELSE gs * {1 << bits} + (fx >> gs) END AS bucket
        FROM (
          SELECT {"g, " if grouped else ""}fx,
                 GREATEST(CAST(length(bin(fx)) AS BIGINT) - 1 - {bits},
                          CAST(0 AS BIGINT)) AS gs
          FROM (
            SELECT {"g, " if grouped else ""}CAST(ROUND(v * {scale}) AS BIGINT) AS fx
            FROM ({value_sql}) WHERE v IS NOT NULL
          )
        )"""
    if not grouped:
        return f"""
    ldig AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n
      FROM ({inner})
      GROUP BY 1
    )"""
    return f"""
    ldigg AS (
      SELECT g, bucket, CAST(COUNT(*) AS BIGINT) AS n
      FROM ({inner})
      GROUP BY 1, 2
    )"""


def duck_log_histogram_quantile_sql(
    ps: list[tuple[int, int]], bits: int = LOG_HIST_BITS, grouped: bool = False
) -> str:
    """DuckDB CTEs rebuilding log_histogram_quantile: from the ``ldig``
    CTE yielding ``ldigq`` (p_num, p_den, lo_fp, hi_fp), or — grouped —
    from the ``ldigg`` CTE yielding ``ldigqg`` (g, p_num, p_den, lo_fp,
    hi_fp), one interval per group per p (the per-domain quantile view,
    cum/total windows partitioned by g)."""
    values = ", ".join(f"({pn}, {pd})" for pn, pd in ps)
    s = f"GREATEST(bucket // {1 << bits} - 1, CAST(0 AS BIGINT))"
    lo = f"((bucket - ({s}) * {1 << bits}) << ({s}))"
    hi = f"({lo}) + (CAST(1 AS BIGINT) << ({s})) - 1"
    g_sel = "g, " if grouped else ""
    g_part = "PARTITION BY g " if grouped else ""
    g_rk = "c.g, " if grouped else ""
    sfx = "g" if grouped else ""
    src = "ldigg" if grouped else "ldig"
    return f"""
    ldigc{sfx} AS (
      SELECT {g_sel}bucket, SUM(n) OVER ({g_part}ORDER BY bucket) AS cum,
             SUM(n) OVER ({g_part.rstrip()}) AS total
      FROM {src}
    ),
    ldigq{sfx} AS (
      SELECT {g_sel}p_num, p_den,
             CAST(CASE WHEN bucket < 0 THEN NULL ELSE {lo} END AS BIGINT) AS lo_fp,
             CAST(CASE WHEN bucket < 0 THEN 0 ELSE {hi} END AS BIGINT) AS hi_fp
      FROM (
        SELECT {g_rk}pr.p_num, pr.p_den, c.bucket,
               ROW_NUMBER() OVER (PARTITION BY {g_rk}pr.p_num, pr.p_den
                                  ORDER BY c.bucket) AS rk
        FROM (VALUES {values}) pr(p_num, p_den)
        CROSS JOIN ldigc{sfx} c
        WHERE pr.p_den * c.cum >= pr.p_num * c.total
      )
      WHERE rk = 1
    )"""


def histogram_drift(a: DataFrame, b: DataFrame) -> DataFrame:
    """Distribution drift between two histograms built with the SAME
    width/lo/scale (two corpus snapshots, two crawls, two days of a
    stream): one row ``(n_a, n_b, tv_ppm)`` where ``tv_ppm`` is the
    total-variation distance between the two bucket distributions in
    parts-per-million — ``(sum_bucket |n_a*N_b - n_b*N_a|) * 1e6 DIV
    (2*N_a*N_b)``, the half-L1 of the normalized histograms without ever
    forming a float frequency.

    This is the "did today's data shift?" gate of a continuously
    ingested corpus, answered from two bounded cell frames (a full-outer
    join on bucket keys, missing cells = 0) — the data itself is never
    revisited. TV = 0 iff the distributions agree bucket-wise;
    TV = 1e6 iff disjoint. Cross-products reach n*N ~ rows^2, so the
    numerator accumulates in DECIMAL(38,0) (the corpus_fingerprint
    overflow rule) and only the final ppm quotient returns to BIGINT —
    exact integer arithmetic end-to-end, reproducible across layouts
    and engines.
    """
    ca = a.select("bucket", F.col("n").alias("__na"))
    cb = b.select("bucket", F.col("n").alias("__nb"))
    joined = ca.join(cb, "bucket", "full_outer").select(
        F.coalesce("__na", F.lit(0)).alias("__na"),
        F.coalesce("__nb", F.lit(0)).alias("__nb"),
    )
    agg = joined.agg(
        F.sum("__na").cast("decimal(38,0)").alias("__ta"),
        F.sum("__nb").cast("decimal(38,0)").alias("__tb"),
        F.collect_list(F.struct("__na", "__nb")).alias("__cells"),
    )
    # The |na*Nb - nb*Na| sum needs the totals first; cells are
    # range-bounded by construction, so folding them in one aggregate
    # expression (per-row DECIMAL arithmetic) is a kilobyte-scale fold,
    # not a data pass.
    num = F.expr(
        "aggregate(__cells, CAST(0 AS DECIMAL(38,0)),"
        " (acc, c) -> acc + abs(CAST(c.__na AS DECIMAL(38,0)) * __tb"
        "                      - CAST(c.__nb AS DECIMAL(38,0)) * __ta))"
    )
    staged = agg.select("__ta", "__tb", num.alias("__num"))
    return staged.select(
        F.col("__ta").cast("long").alias("n_a"),
        F.col("__tb").cast("long").alias("n_b"),
        F.expr(
            "CASE WHEN __ta = 0 OR __tb = 0 THEN NULL"
            " ELSE CAST((__num * 1000000) DIV (2 * __ta * __tb) AS BIGINT)"
            " END"
        ).alias("tv_ppm"),
    )


def histogram_drift_by_group(
    grouped: DataFrame, group_cols: list[str], reference: DataFrame
) -> DataFrame:
    """Per-group distribution drift: each group's TV distance (integer
    ppm, as in ``histogram_drift``) against one ``reference`` histogram
    — "which domains/types deviate from the corpus mixture, and by how
    much", answered entirely from cell frames.

    REQUIRES the reference's bucket support to cover every group's
    (satisfied by the natural call: reference = the groups' own merged
    corpus view, whose support is the union) — the drift grid is
    group x reference-bucket, so a group bucket absent from the
    reference would silently drop. All frames are range-bounded cells;
    the reference rides along as a broadcast. Same DECIMAL(38,0)
    accumulation + final integer DIV as the ungrouped form. Output:
    (group..., n_g, n_ref, tv_ppm).
    """
    groups = list(group_cols)
    gtot = grouped.groupBy(*groups).agg(
        F.expr("CAST(sum(n) AS DECIMAL(38,0))").alias("__ng")
    )
    ref_cells = reference.selectExpr("bucket", "n AS __nc_b")
    ref_tot = reference.selectExpr("CAST(sum(n) AS DECIMAL(38,0)) AS __nc")
    grid = (
        gtot.crossJoin(F.broadcast(ref_tot))
        .crossJoin(F.broadcast(ref_cells))
        .join(
            grouped.selectExpr(*[f"`{g}`" for g in groups], "bucket", "n AS __ng_b"),
            groups + ["bucket"],
            "left",
        )
    )
    term = F.expr(
        "abs(CAST(coalesce(__ng_b, 0) AS DECIMAL(38,0)) * __nc"
        "     - CAST(__nc_b AS DECIMAL(38,0)) * __ng)"
    )
    return (
        grid.groupBy(*groups, "__ng", "__nc")
        .agg(F.sum(term).alias("__num"))
        .selectExpr(
            *[f"`{g}`" for g in groups],
            "CAST(__ng AS BIGINT) AS n_g",
            "CAST(__nc AS BIGINT) AS n_ref",
            "CAST((__num * 1000000) DIV (2 * __ng * __nc) AS BIGINT) AS tv_ppm",
        )
    )


# ---------------------------------------------------------------------------
# KMV (k minimum values) — mergeable approximate distinct counting
# ---------------------------------------------------------------------------

KMV_K = 32
KMV_SPACE = 1 << 60  # hash60 range


def kmv_sketch(
    items: DataFrame,
    item_col: str,
    k: int = KMV_K,
    seed: str = "kmv",
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The KMV sketch of a column: the ``k`` smallest DISTINCT 60-bit
    hashes of its values, as a (h BIGINT) frame of <= k rows —
    per group with ``group_cols`` (<= k rows per group, the per-domain
    distinct-cardinality rollup).

    This is the mergeable form of approximate COUNT(DISTINCT): sketches
    of two corpus parts union into the sketch of the whole
    (``kmv_merge``), so per-shard/per-day sketches roll up without
    touching the data again — the property Spark's own
    approx_count_distinct buffers have but cannot expose as a value, and
    the md5-60 hash family makes the sketch (and therefore the estimate)
    bit-identical in a SQL oracle, unlike HLL whose buffers are
    engine-private.

    Plan shape: distinct (map-side partial combine collapses duplicates
    before the exchange) then ORDER BY+LIMIT k, which compiles to
    TakeOrderedAndProject — per-partition k-min heaps merged on the
    driver side of a k-row exchange, never a global sort. The exchange
    before the top-k carries the distinct hash set; for repeated
    estimates over growing data, store the sketch and merge deltas
    instead of rebuilding (the point of mergeability).
    """
    from sum_spark.functions.litsql import qid, qstr

    h = F.expr(
        f"CAST(conv(substring(md5(concat({qstr(str(seed) + ':')},"
        f" CAST({qid(item_col)} AS STRING))), 1, 15), 16, 10) AS BIGINT)"
    )
    return _kmv_topk(
        items.where(F.col(item_col).isNotNull()).select(
            *group_cols, h.alias("h")
        ),
        k,
        group_cols,
    )


def _kmv_topk(
    hashes: DataFrame, k: int, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """k smallest distinct hashes — globally (TakeOrderedAndProject,
    never a full sort) or per group (rank filter compiling to
    WindowGroupLimit: pre-shuffle local top-k per partition, so the
    exchange carries <= partitions x groups x k rows)."""
    distinct = hashes.distinct()
    if not group_cols:
        return distinct.orderBy("h").limit(k)
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        distinct.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )


def kmv_merge(
    a: DataFrame, b: DataFrame, k: int = KMV_K, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Union two KMV sketches (same seed/k/groups) into the sketch of
    the combined data: distinct-union of the value sets, k smallest
    kept (per group when grouped)."""
    return _kmv_topk(a.unionByName(b), k, group_cols)


def kmv_estimate(
    sketch: DataFrame, k: int = KMV_K, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """(group..., n_vals, est) estimate from a sketch: with fewer than
    ``k`` values the sketch IS the exact distinct set (est = n_vals);
    otherwise the classic unbiased estimator (k-1) * SPACE / h_k with
    h_k the k-th smallest hash — in DECIMAL(38,0) integer arithmetic
    ((k-1) * 2^60 overflows BIGINT) so the oracle reproduces it
    exactly. Relative error ~ 1/sqrt(k-2)."""
    groups = list(group_cols)
    return sketch.groupBy(*groups).agg(
        F.count("*").cast("long").alias("n_vals"),
        F.max("h").alias("__hk"),
    ).selectExpr(
        *[f"`{g}`" for g in groups],
        "n_vals",
        f"CASE WHEN n_vals < {int(k)} THEN n_vals"
        f" ELSE CAST(CAST({k - 1} AS DECIMAL(38,0)) * CAST({KMV_SPACE} AS"
        " DECIMAL(38,0)) div CAST(__hk AS DECIMAL(38,0)) AS BIGINT)"
        " END AS est",
    )


def duck_kmv_sql(
    item_sql: str, name: str, k: int = KMV_K, seed: str = "kmv"
) -> str:
    """DuckDB CTE pair rebuilding sketch + estimate for ``item_sql``
    (one column ``x``): yields ``kmv_<name>`` (the sketch) and
    ``kmvest_<name>`` (n_vals, est)."""
    h = duck_hash60(f"{_litsql_qstr_duck(str(seed) + ':')} || CAST(x AS VARCHAR)")
    return f"""
    kmv_{name} AS (
      SELECT DISTINCT {h} AS h FROM ({item_sql}) WHERE x IS NOT NULL
      ORDER BY h LIMIT {k}
    ),
    kmvest_{name} AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_vals,
             CASE WHEN COUNT(*) < {k} THEN CAST(COUNT(*) AS BIGINT)
                  ELSE CAST(CAST({k - 1} AS HUGEINT) * {KMV_SPACE}
                            // CAST(MAX(h) AS HUGEINT) AS BIGINT)
             END AS est
      FROM kmv_{name}
    )"""


# ---------------------------------------------------------------------------
# HyperLogLog — mergeable cardinality registers with reproducible buffers
# ---------------------------------------------------------------------------

HLL_P = 12  # 2^12 = 4096 registers; rsd ~ 1.04/sqrt(m) = 1.6%
HLL_M = 1 << HLL_P
_HLL_REM_BITS = 60 - HLL_P  # low bits that feed the leading-zero count
_HLL_REM_SPACE = 1 << _HLL_REM_BITS


def hll_sketch(
    items: DataFrame,
    item_col: str,
    group_cols: tuple[str, ...] = (),
    seed: str = "hll",
) -> DataFrame:
    """HyperLogLog registers of a column, optionally per group: a
    (group..., idx, rho) frame of at most 2^HLL_P rows per group,
    mergeable across corpus parts via MAX (``hll_merge``).

    KMV (above) already covers mergeable distinct counting at k=32
    accuracy; HLL is the standard-error-per-byte winner (rsd
    1.04/sqrt(m)) and the industry default for cardinality rollups, so
    the engine carries both. Unlike Spark's approx_count_distinct, whose
    HLL++ buffer is engine-private bytes, these registers are built from
    the portable md5-60 hash family with INTEGER-only ops — bucket is
    the hash's top HLL_P bits (integer DIV), rho the leading-zero count
    of the remaining bits derived from length(bin(rem)) (both engines
    print minimal-width binary) — so a DuckDB oracle reproduces every
    register bit-for-bit and the sketch can be stored/merged across
    engines.

    Plan shape: one map-side pass then an aggregation onto a key space
    bounded by groups x 4096 — partial combine collapses the corpus
    before the exchange, which moves kilobytes regardless of input size.
    """
    h = hash60(F.concat(F.lit(f"{seed}:"), F.col(item_col).cast("string")))
    # staged projection: hash once, then derive idx/rho from the stored
    # hash (Catalyst would re-inline the md5 into both subtrees otherwise)
    rem = F.col("__hll_h") % F.lit(_HLL_REM_SPACE)
    rho = (
        F.when(rem == F.lit(0), F.lit(_HLL_REM_BITS + 1))
        .otherwise(F.lit(_HLL_REM_BITS + 1) - F.length(F.bin(rem)))
        .cast("int")
    )
    # integer DIV, not float division (CLAUDE.md: hash-derived integers
    # must stay integer end-to-end)
    idx = F.expr(f"__hll_h DIV {_HLL_REM_SPACE}").alias("idx")
    return (
        items.where(F.col(item_col).isNotNull())
        .select(*group_cols, h.alias("__hll_h"))
        .select(*group_cols, idx, rho.alias("__rho"))
        .groupBy(*group_cols, "idx")
        .agg(F.max("__rho").alias("rho"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Union register tables (same seed, same grouping) into the sketch
    of the combined data: per-register MAX, the HLL merge law."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    group = [c for c in out.columns if c not in ("idx", "rho")]
    return out.groupBy(*group, "idx").agg(F.max("rho").alias("rho"))


def hll_estimate(sketch: DataFrame, group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Per-group (est DOUBLE) cardinality estimate from registers.

    Classic HLL with the small-range (linear counting) correction:
    raw = alpha_m * m^2 / (sum over registers of 2^-rho), where absent
    registers contribute 2^0; if raw <= 2.5m and zero registers exist,
    est = m * ln(m / V). The estimate is float (ln/pow) — callers that
    need cross-engine equality check the REGISTERS (exact integers) and
    gate the estimate with a tolerance flag, the q38 acd_ok pattern.
    """
    m = HLL_M
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = sketch.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("__nnz"),
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("__s_nz"),
    )
    v = F.lit(m) - F.col("__nnz")  # zero registers
    raw = F.lit(alpha * m * m) / (F.col("__s_nz") + v.cast("double"))
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double"))
    est = F.when((raw <= F.lit(2.5 * m)) & (v > 0), lc).otherwise(raw)
    return agg.select(*group_cols, est.alias("est"))


def hll_regsum(sketch: DataFrame, group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Per-group BIGINT digest of the registers: SUM(idx*64 + rho).
    Order-independent, exact (<= 4096 terms of < 2^19 each), and
    reproducible by the DuckDB oracle — the checkable identity of the
    sketch, analogous to the histogram cell hashes."""
    return sketch.groupBy(*group_cols).agg(
        F.sum(F.col("idx") * F.lit(64) + F.col("rho")).alias("regsum")
    )


def duck_hll_sql(
    item_sql: str, name: str, seed: str = "hll", group: str = ""
) -> str:
    """DuckDB CTE pair rebuilding the registers and their digest for
    ``item_sql`` (columns: optional group ``g``, value ``x``): yields
    ``hllreg_<name>`` (g?, idx, rho) and ``hllsum_<name>`` (g?, regsum).
    ``group`` is '' for ungrouped or 'g' for one group column."""
    h = duck_hash60(f"{_litsql_qstr_duck(str(seed) + ':')} || CAST(x AS VARCHAR)")
    gsel = f"{group}, " if group else ""
    gby = f"GROUP BY {group}" if group else ""
    return f"""
    hllreg_{name} AS (
      SELECT {gsel}h // {_HLL_REM_SPACE} AS idx,
             MAX(CASE WHEN h % {_HLL_REM_SPACE} = 0 THEN {_HLL_REM_BITS + 1}
                      ELSE {_HLL_REM_BITS + 1} - length(bin(h % {_HLL_REM_SPACE}))
                 END) AS rho
      FROM (SELECT {gsel}{h} AS h FROM ({item_sql}) WHERE x IS NOT NULL)
      GROUP BY {gsel}idx
    ),
    hllsum_{name} AS (
      SELECT {gsel}CAST(SUM(idx * 64 + rho) AS BIGINT) AS regsum
      FROM hllreg_{name} {gby}
    )"""


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters: bounded-state approximate top-k
# ---------------------------------------------------------------------------
#
# The gap this fills: the 'vocab' exact heavy-hitters pass shuffles one
# row per DISTINCT key (fine for word vocabularies, ruinous for URLs or
# n-grams with billions of distinct values), and the count-min sketch
# answers point queries but cannot LIST the heavy items without a
# candidate set. A Misra-Gries summary keeps at most k counters per
# partition — state bounded by k, not by the key cardinality — and the
# only exchange moves <= k rows per partition. Summaries are mergeable
# (sum matching counters, then subtract the (k+1)-th largest from all
# and drop the non-positive — Agarwal et al., "Mergeable Summaries",
# PODS 2012), and the merged summary keeps the sequential guarantee:
# every estimate UNDER-counts by at most n/(k+1) of the total weight n,
# so every item with true weight > n/(k+1) is present. The dual of the
# count-min bound (which only ever over-counts).
#
# Counter values depend on partition layout (which prunes fired), so
# they are not oracle-reproducible; what IS checkable — and what q31's
# 'mg' leg checks — is the guarantee itself against exact counts:
# est <= true and true - est <= n DIV k for the exact top tokens.
#
# No reference analog (like the rest of this module); the per-partition
# fold is an Arrow mapInPandas whose inner loop is vectorized
# value_counts/groupby-sum, never a per-row Python loop.

MG_K = 64


def mg_partials(
    items: DataFrame,
    item_col: str,
    k: int = MG_K,
    weight_col: str | None = None,
) -> DataFrame:
    """Per-partition Misra-Gries summaries: an (item, est) frame with at
    most ``k`` rows per input partition, built map-only (no shuffle).

    Each Arrow batch is counted vectorized (value_counts, or groupby-sum
    when ``weight_col`` carries pre-aggregated weights) and folded into
    the partition's running summary; whenever the summary exceeds ``k``
    counters, the (k+1)-th largest value is subtracted from every
    counter and non-positive counters are dropped. Every prune removes
    at least (k+1) x subtracted weight from the pool, which is what
    bounds the total undercount of any single item by n/(k+1)."""
    has_w = weight_col is not None
    src = items.where(F.col(item_col).isNotNull()).select(
        F.col(item_col).cast("string").alias("item"),
        *([F.col(weight_col).cast("long").alias("w")] if has_w else []),
    )

    def fold(batches):
        import pandas as pd

        acc = None
        for pdf in batches:
            if has_w:
                cnt = pdf.groupby("item", sort=False)["w"].sum()
            else:
                cnt = pdf["item"].value_counts(sort=False)
            acc = cnt if acc is None else acc.add(cnt, fill_value=0).astype("int64")
            if len(acc) > k:
                t = int(acc.nlargest(k + 1).iloc[-1])
                acc = acc[acc > t] - t
        if acc is None or len(acc) == 0:
            return
        yield pd.DataFrame(
            {"item": acc.index.astype(str), "est": acc.astype("int64").values}
        )

    return src.mapInPandas(fold, schema="item string, est long")


def _mg_prune(summary: DataFrame, k: int) -> DataFrame:
    """Restore capacity ``k`` after a merge: subtract the (k+1)-th
    largest counter from all counters, keep the strictly positive.

    Every survivor (est > threshold) is by construction inside the
    global top-(k+1) by (est desc, item), so the prune pipelines as ONE
    linear plan: orderBy+limit to the k+1 candidate rows (bounded —
    never the summary's k x partitions width), then a single-partition
    window over those <= k+1 rows reads off the threshold (row k+1's
    est; 0 when the summary is already within capacity) and subtracts
    it. The previous shape computed the threshold in a broadcast
    subquery and joined it back to ``summary`` — two branches over the
    same subtree, which Catalyst does NOT merge (the q31 ReusedExchange
    finding, CLAUDE.md): the mapInPandas partials pass and everything
    upstream of it executed TWICE per action (VERDICT r11 #3 — the mg
    leg was the suite's largest, ~2x its true cost)."""
    from pyspark.sql.window import Window

    order = [F.col("est").desc(), F.col("item")]
    w_rn = Window.orderBy(*order)
    w_all = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        summary.orderBy(*order)
        .limit(k + 1)
        .select("item", "est", F.row_number().over(w_rn).alias("__rn"))
        .select(
            "item",
            "est",
            F.max(
                F.when(F.col("__rn") == k + 1, F.col("est")).otherwise(F.lit(0))
            )
            .over(w_all)
            .alias("__t"),
        )
        .where(F.col("est") > F.col("__t"))
        .selectExpr("item", "CAST(est - __t AS BIGINT) AS est")
    )


def mg_summary(
    items: DataFrame,
    item_col: str,
    k: int = MG_K,
    weight_col: str | None = None,
) -> DataFrame:
    """Distributed Misra-Gries heavy-hitter summary: at most ``k``
    (item, est) rows for the whole input, with the mergeable-summaries
    guarantee est <= true and true - est <= n/(k+1) (n = total weight).

    Plan shape: map-only per-partition fold (state <= k counters each),
    one aggregation over the <= k x partitions partial rows, one
    TakeOrdered prune — the corpus itself never shuffles."""
    merged = (
        mg_partials(items, item_col, k=k, weight_col=weight_col)
        .groupBy("item")
        .agg(F.sum("est").cast("long").alias("est"))
    )
    return _mg_prune(merged, k)


def mg_merge(*summaries: DataFrame, k: int = MG_K) -> DataFrame:
    """Merge summaries of disjoint corpus parts (same ``k``) into the
    summary of the union: sum matching counters, prune to capacity. The
    undercount bound degrades to the COMBINED n/(k+1) — merging never
    breaks the guarantee (Agarwal et al. 2012)."""
    out = summaries[0]
    for s in summaries[1:]:
        out = out.unionByName(s)
    return _mg_prune(
        out.groupBy("item").agg(F.sum("est").cast("long").alias("est")), k
    )
