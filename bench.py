"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The harness that records this line keeps only the LAST ~2,000 characters
of stdout, so the printed line MUST stay well under that (tested at
<1,800 chars by tests/test_bench_contract.py). Per-leg timings therefore
do NOT go to stdout: they are written to the committed sidecar file
``BENCH_LEGS.json`` next to this script (and echoed on stderr for
interactive runs).

Workload selection mirrors BASELINE.md: the findSimilar family (the
reference's flagship), the relational suite's heaviest shapes, windowed
aggregation, and the LLM-pipeline operators. Each query runs once after a
warm-up action so JVM/session startup is excluded; timing is
end-to-end (plan + execute + collect-to-count).

Per-leg timings: multi-leg entries (tagged UNION ALL legs under one
registry name — the SURVEY §2.F consolidation) additionally record each
leg's own wall time under "legs" as "<entry>.<leg>". Tagged legs time the
entry's plan filtered to the leg's literal tag — Catalyst constant-folds
the tag comparison and prunes the other union children, so the timed plan
is exactly that leg's plan (pinned by tests/test_plans.py). text_profile
has no tag column (its legs are joined components); its legs are timed as
standalone component plans, each including the shared tokenize scan it
would need on its own — their sum therefore exceeds the entry, which
tokenizes once for all four.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q01_filter_project",
    "q03_pagination",
    "q06_join_multiway_agg",
    "q08_semi_join",
    "q12_grouped_agg",
    "q14_rollup",
    "q16_window_rank",
    "q02_lookup_topk",
    "q25_find_similar",
    "q27_tumbling_window",
    "q28_sliding_window",
    "q29_session_window",
    "q39_asof_join",
    "q43_two_level_rollup",
    "q44_range_join",
    "knn_search",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_incremental",
    "dedup_clusters",
    "bm25_search",
    "decontaminate",
    "corpus_mixture",
    "sample_stratified",
    "assign_ids",
    "pack_sequences",
    "global_shuffle",
    "embed_quantize",
    "multimodal_stats",
    "text_profile",
    "text_chunk",
    "text_pii",
    "q32_percentile",
    "q31_distinct_projection",
    "q20_set_ops",
    "q38_approx_count_distinct",
]

# entry -> (tag column, leg values). Filtering fn(...) on tag == value
# folds the other union legs out of the plan entirely.
TAGGED_LEGS: dict[str, tuple[str, list[str]]] = {
    "q02_lookup_topk": ("op", ["point", "topk"]),
    "q38_approx_count_distinct": ("mode", ["acd", "hll"]),
    "bm25_search": ("mode", ["scan", "idx", "incr"]),
    "dedup_incremental": ("mode", ["pair", "incr"]),
    "global_shuffle": ("mode", ["shuf", "zord"]),
    "q31_distinct_projection": ("mode", ["distinct", "profile", "fingerprint", "vocab", "dvocab", "hist", "histq", "drift", "cms", "kmv", "mg", "ldig", "ldigq", "ldigg"]),
    "q08_semi_join": ("op", ["exists", "in"]),
    # the three diff_* statuses are one union child (one full-outer
    # join); diff_changed times that child once for all three.
    "q20_set_ops": ("op", ["anti", "except", "intersect", "union_all", "diff_changed"]),
    "q39_asof_join": ("mode", ["back", "fwd", "tol"]),
    "q28_sliding_window": ("mode", ["slide", "trail"]),
    "q44_range_join": ("mode", ["in", "over"]),
    "knn_search": ("mode", ["brute", "filt", "incr", "ivf", "ivfpq", "res", "rr", "tb", "gk"]),
    "dedup_exact": ("mode", ["doc", "gram", "line", "span"]),
    "dedup_embedding_cosine": ("mode", ["exact", "lsh", "sem", "sem2"]),
    "corpus_mixture": ("mode", ["mix", "plan", "cap"]),
    "decontaminate": ("mode", ["exact", "bloom"]),
    "sample_stratified": ("mode", ["bern", "topk", "wk"]),
    "pack_sequences": ("mode", ["pack", "pipeline"]),
    "embed_quantize": ("mode", ["quant", "norm", "pool", "kmeans", "kcent", "pq"]),
    "text_chunk": ("mode", ["tok", "line", "bpe"]),
}

# Entries whose FIRST fn() call builds per-process disk artifacts or
# memos (stored PQ/inverted indexes, incremental snapshot state, the
# pipeline memo — the _II_INCR_BUILT / _TB_BUILT / _PIPE_MEMO patterns).
# The build is a deployment's ONE-TIME cost, not the per-query cost
# best-of-N measures — but it used to run inside run 1 of the timed
# bracket, making that group's window the noisiest in the suite
# (knn_search's ~90 s build contaminating its own repeat runs, VERDICT
# r12 #2/#3). Each now gets one warm-up call BEFORE the timed bracket;
# its wall time is reported separately in the sidecar's "first_build"
# block. The entry/leg numbers keep their exact meaning (best-of-N of
# fn() construct + execute on a warm process — the min never included
# the build anyway); only run 1's window is no longer contaminated.
FIRST_BUILD = (
    "knn_search",
    "bm25_search",
    "dedup_incremental",
    "pack_sequences",
)


def _text_profile_component_legs():
    """text_profile's four components as standalone callables (no tag
    column to filter on). Each leg pays its own tokenize scan — the
    entry itself shares ONE persisted tokenization across all four, so
    sum(legs) > entry is expected and is the measured value of the
    shared-scan design."""
    from pyspark.sql import functions as F

    from sum_spark.functions.text import tokens
    from sum_spark.operators import classifier, dedup, lm, textops
    from sum_spark.sources.tables import load_table

    def _tok(spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        return docs.select(
            F.col("doc_id"), F.col("text").alias("__text"), tokens("text").alias("__w")
        )

    return {
        "prof": lambda s, d: textops.text_profile(None, tokenized=_tok(s, d)),
        "spans": lambda s, d: dedup.duplicated_span_stats(None, tokenized=_tok(s, d)),
        "lm": lambda s, d: lm.score_self(None, tokenized=_tok(s, d)),
        "clf": lambda s, d: classifier.score_with_hash_weights(
            None, tokenized=_tok(s, d)
        ),
    }


def format_stdout_line(
    timings: dict[str, float], sf, stalls: int = 0, drift: float | None = None
) -> str:
    """The ONE stdout JSON line the external harness parses. Compact
    separators and NO legs dict — the harness's capture window keeps only
    the last ~2,000 chars of output, and round 5's legs-inclusive line
    (3.2 KB) overflowed it. Legs live in BENCH_LEGS.json instead.
    tests/test_bench_contract.py pins the length budget. ``stalls`` is
    the total count of discarded stall-straddling runs — nonzero means
    the host misbehaved during the run and per-entry detail is in the
    sidecar's ``stall_discards``. ``drift`` is the run-level canary
    drift index (median canary sample / pin — VERDICT r11 #1): ~1.0 is
    a quiet host; readers comparing artifacts across rounds should
    trust per-entry deltas only between runs whose indexes agree."""
    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "stalls": stalls,
    }
    if drift is not None:
        payload["drift"] = drift
    return json.dumps(payload, separators=(",", ":"))


class _StallWatch:
    """Monotonic heartbeat that detects HOST stalls (VERDICT r9 #1): a
    daemon thread samples ``time.monotonic()`` every 50 ms; a gap far
    beyond the interval between consecutive samples means the OS stalled
    the Python scheduler itself — the round-9 pathology (host-wide
    page-zeroing storms, vmstat 30-80%% sys / ~0%% user, multi-ten-second
    freezes). The heartbeat thread holds no GIL-bound work and the main
    thread sits in py4j socket recv during Spark actions (GIL released),
    so under a HEALTHY host the gap stays in the tens of milliseconds
    even with all 32 cores busy in the JVM; a multi-second gap measures
    the box, not the engine. Runs that straddle such a gap are discarded
    and re-run (bench policy in :func:`_run_attempts`)."""

    def __init__(self, interval: float = 0.05):
        import threading

        self._interval = interval
        self._lock = threading.Lock()
        self._max_gap = 0.0
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._beat, name="bench-stallwatch", daemon=True
        )
        self._thread.start()

    def _beat(self) -> None:
        last = time.monotonic()
        while not self._stop.wait(self._interval):
            now = time.monotonic()
            gap = now - last
            last = now
            with self._lock:
                if gap > self._max_gap:
                    self._max_gap = gap

    def reset(self) -> None:
        # A gap in progress at reset time lands in the NEW window —
        # conservative: a run that starts inside a stall is discarded too.
        with self._lock:
            self._max_gap = 0.0

    def max_gap(self) -> float:
        with self._lock:
            return self._max_gap

    def stop(self) -> None:
        self._stop.set()


# A run is stall-contaminated when the heartbeat saw a scheduler gap of
# at least this many seconds (env-tunable; 0 disables the watch). The
# observed round-9 stalls were multi-ten-second; 2 s sits an order of
# magnitude above healthy-host jitter under full JVM load.
_STALL_GAP = float(os.environ.get("SPARK_GRAFT_STALL_GAP", "2.0"))
# Extra attempts a plan may earn when runs get discarded, so a long
# storm can't spin the bench forever.
_STALL_EXTRA = 2
# Mid-run canary threshold: a single between-runs rep (no min-of-3)
# jitters ~1.7x on a quiet host, so the dirty-window cut sits above
# that and below the observed pathology range (2.5-4x+).
_MID_MAX = float(os.environ.get("SPARK_GRAFT_CANARY_MID_MAX", "2.5"))


class _CpuWindow:
    """Per-run wall-vs-CPU sanity (VERDICT r10 #2): the heartbeat only
    catches FREEZES (a >= 2 s scheduler gap), not slow-but-unstalled
    windows — round 10's two same-HEAD clean runs disagreed 2-5x on
    sub-second entries through windows the heartbeat called clean. The
    documented host pathology (heap commit/uncommit page-zeroing churn)
    has a distinctive host-wide CPU shape: 30-80% SYSTEM time with ~0%
    user — a shape a healthy bench window (JVM busy => user-dominated)
    never shows. This samples /proc/stat around each timing run and
    flags windows matching that shape so they are discarded like stalls.
    Thresholds are env-tunable; a /proc-less platform disables it."""

    SYS_MIN = float(os.environ.get("SPARK_GRAFT_CPU_SYS_MIN", "0.30"))
    USER_MAX = float(os.environ.get("SPARK_GRAFT_CPU_USER_MAX", "0.10"))
    # Hypervisor contention: this box is a VM, and a steal-heavy window
    # means the HOST was descheduled — wall time elongates with no local
    # CPU signature at all (the round-11 run-1 artifact's failure mode:
    # construct-side slowness, sys-light, heartbeat quiet).
    STEAL_MIN = float(os.environ.get("SPARK_GRAFT_CPU_STEAL_MIN", "0.20"))

    def __init__(self) -> None:
        self.enabled = os.path.isfile("/proc/stat")
        self._t0: tuple[int, int, int, int] | None = None
        self.reset()

    @staticmethod
    def _read() -> tuple[int, int, int, int]:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        vals = [int(x) for x in parts[1:9]]  # user..steal
        return vals[0] + vals[1], vals[2], vals[7], sum(vals)

    def reset(self) -> None:
        if self.enabled:
            try:
                self._t0 = self._read()
            except OSError:
                self.enabled = False

    def suspect(self) -> bool:
        if not self.enabled or self._t0 is None:
            return False
        u0, s0, st0, t0 = self._t0
        try:
            u1, s1, st1, t1 = self._read()
        except OSError:
            return False
        dt = t1 - t0
        if dt <= 0:
            return False
        if (st1 - st0) / dt >= self.STEAL_MIN:
            return True
        return (s1 - s0) / dt >= self.SYS_MIN and (u1 - u0) / dt <= self.USER_MAX


class _Canary:
    """Pinned micro-workload bracketing each entry group (VERDICT r11
    #1): the stall/CPU watchers catch gross pathology inside one
    process, but round 11's committed artifacts were still ~1.5-4x
    inflated on UNCHANGED code with `cpu_discards: {}` — sub-threshold
    host slow phases (construct-side JVM/py4j drag, low-level steal)
    that only an absolute yardstick can see. The canary is a fixed
    ~0.1 s job over a cached synthetic frame, BUILT FRESH each sample so
    both documented slow-phase signatures are covered: plan construction
    (py4j round-trips + analysis — the round-11 run-1 shape) and
    execution (CPU elongation). A sample is the MIN of three reps:
    single reps jitter ~1.7x from scheduling/GC even on an idle host,
    min-of-3 on a warm JVM measured 1.30x max/min (round 12), so the
    1.5x threshold sits above inherent noise and below every observed
    pathology (1.5-4x). The pin is this host's warm quiet-phase
    steady-state median (measured round 12; env-overridable)."""

    PIN = float(os.environ.get("SPARK_GRAFT_CANARY_PIN", "0.14"))
    MAX_DRIFT = float(os.environ.get("SPARK_GRAFT_CANARY_MAX", "1.5"))
    REPS = 3

    def __init__(self, spark) -> None:
        from pyspark.sql import functions as F

        self._F = F
        # 8 input partitions regardless of core count: the sample must
        # measure per-core speed, not how many cores the suite left idle.
        self._frame = (
            spark.range(0, 4_000_000, 1, 8)
            .select((F.col("id") * 11).alias("v"))
            .cache()
        )
        self._frame.count()  # materialize once; samples never re-scan parquet

        self.samples: list[float] = []

    def _rep(self) -> float:
        F = self._F
        t0 = time.perf_counter()
        # pmod keeps the 4M-term sum inside BIGINT (ANSI mode: a raw
        # SUM(xxhash64) overflows) and adds a little more per-row CPU,
        # which is exactly what the yardstick measures.
        self._frame.agg(
            F.sum(F.pmod(F.xxhash64("v"), F.lit(1_000_003))).alias("s")
        ).collect()
        return time.perf_counter() - t0

    def run(self) -> float:
        dt = min(self._rep() for _ in range(self.REPS))
        self.samples.append(round(dt, 4))
        return dt

    def drift_index(self) -> float:
        import statistics

        if not self.samples:
            return 0.0
        return round(statistics.median(self.samples) / self.PIN, 2)


def _run_attempts(
    run_once,
    max_runs: int,
    watch: _StallWatch | None,
    cpu: _CpuWindow | None = None,
    canary: "_Canary | None" = None,
):
    """Best-of-N with stall AND pathological-CPU discards. ``run_once()``
    returns a tuple of phase durations (total first). Runs whose window
    contained a heartbeat gap >= _STALL_GAP, or whose host-wide CPU
    profile matched the documented sys-heavy/user-idle pathology
    (_CpuWindow), measured the host, not the plan: they are discarded
    and re-run, up to ``max_runs + _STALL_EXTRA`` total attempts.

    Early exit: two CLEAN runs with the best total in (1, 2] s skip the
    third. SUB-SECOND entries always take all ``max_runs`` clean runs
    (VERDICT r10 #2: they are where same-HEAD artifacts disagreed 2-5x,
    and a third sub-second run is nearly free); the heavy plans keep all
    runs too — contention tails are widest exactly there.

    If EVERY attempt was discarded, the contaminated minima are returned
    (a number must be produced) and the counts say how much to trust it.
    Returns (per-position minima over clean runs, per-position MEDIANS
    over clean runs, stall discard count, cpu discard count, SPREAD =
    max/min of the STEADY-STATE clean run totals — the artifact-level
    instability flag for slow windows neither watcher can see from
    inside one process: a reader treats rows with a wide spread as
    window-contaminated even when the entry-level totals pass. The
    FIRST clean run is excluded from the spread: it legitimately pays
    one-time costs (per-plan codegen, memoized index/frame builds) that
    best-of-N exists to amortize, and would otherwise flag every
    memoizing entry as unstable. The raw steady max-min DELTA is
    returned alongside the ratio (ADVICE r12): the flag consumer keeps
    the 1 s absolute floor — sub-second legs swing 2x from this host's
    per-run scheduler jitter alone — but fast-leg drift stays visible
    in the sidecar instead of being rounded to 1.0 here. MID = the
    worst single canary rep taken BETWEEN attempts over the pin
    (VERDICT r12 #7): the group-level bracket cannot see a slow phase
    that starts and ends inside one entry's repeat runs — the r12
    baseline's 43 s knn row passed a clean bracket; a mid-run sample
    catches exactly that shape)."""
    import statistics

    clean: list[tuple] = []
    dirty: list[tuple] = []
    stall_discards = 0
    cpu_discards = 0
    attempts = 0
    mid = 0.0
    while attempts < max_runs + _STALL_EXTRA and len(clean) < max_runs:
        if len(clean) >= 2 and 1.0 < min(t[0] for t in clean) <= 2.0:
            break
        if watch is not None:
            watch.reset()
        if cpu is not None:
            cpu.reset()
        t = run_once()
        attempts += 1
        if canary is not None:
            # one rep (not min-of-3: this is a detector between runs,
            # not a yardstick sample) — single reps jitter ~1.7x, so
            # the consumer's threshold sits above that.
            mid = max(mid, round(canary._rep() / _Canary.PIN, 2))
        if watch is not None and watch.max_gap() >= _STALL_GAP:
            dirty.append(t)
            stall_discards += 1
            continue
        if cpu is not None and cpu.suspect():
            dirty.append(t)
            cpu_discards += 1
            continue
        clean.append(t)
    pool = clean or dirty
    best = tuple(round(min(t[i] for t in pool), 3) for i in range(len(pool[0])))
    med = tuple(
        round(statistics.median(t[i] for t in pool), 3) for i in range(len(pool[0]))
    )
    steady = clean[1:] if len(clean) >= 3 else []
    spread, delta = 1.0, 0.0
    if steady:
        s_max = max(t[0] for t in steady)
        s_min = min(t[0] for t in steady)
        spread = round(s_max / max(s_min, 1e-9), 2)
        delta = round(s_max - s_min, 3)
    return best, med, stall_discards, cpu_discards, spread, delta, mid


def _best_of(
    fn_make_df,
    max_runs: int,
    time_build: bool = True,
    watch: _StallWatch | None = None,
    cpu: _CpuWindow | None = None,
) -> tuple[float, float, int, int, float]:
    """Best of up to ``max_runs`` CLEAN executions of the plan
    ``fn_make_df`` returns: the first run pays per-plan codegen/JIT, the
    minimum is the reproducible steady-state cost of the plan itself,
    and stall-straddling runs are discarded (see _run_attempts — the
    round-9 artifacts measured host freezes, not the engine). count()
    executes the full plan; the driver-side result transfer (tiny) is
    excluded so we measure engine work, not IPC.

    ``time_build=False`` excludes plan CONSTRUCTION from the timing —
    used for per-leg numbers, where a sibling leg's eager driver work
    (kmeans fits, pipeline counts, all run inside the query function
    regardless of which leg is filtered) would otherwise be charged to
    every leg and drown the attribution the per-leg pass exists for.
    Entry timings keep construction in (end-to-end, the driver contract).
    Returns (best seconds, median seconds, stall discards, cpu discards,
    steady-state spread, steady delta — see _run_attempts)."""

    def run_once():
        if time_build:
            t0 = time.perf_counter()
            fn_make_df().count()
        else:
            df = fn_make_df()
            t0 = time.perf_counter()
            df.count()
        return (time.perf_counter() - t0,)

    best, med, stalls, cpud, spread, delta, _mid = _run_attempts(
        run_once, max_runs, watch, cpu
    )
    return best[0], med[0], stalls, cpud, spread, delta


def _best_of_split(
    fn_make_df,
    max_runs: int,
    watch: _StallWatch | None = None,
    cpu: _CpuWindow | None = None,
    canary: "_Canary | None" = None,
):
    """Entry timing with the construction/execution attribution recorded
    mechanically (VERDICT r8 #7): per run, construction is fn() returning
    the DataFrame (py4j round-trips, eager driver work like kmeans fits
    and pipeline counts), execution is the count() action. The entry
    number is the best TOTAL per clean run — while construct/execute are
    each phase's own best across runs (the reproducible steady-state cost
    of that phase), so their sum can differ from the total by scheduler
    noise. A py4j construction regression now shows up as a sidecar diff
    instead of a profiling hunch. Stall-straddling and cpu-pathological
    runs are discarded (_run_attempts), which is what keeps entry totals
    consistent with their own splits — the round-9 failure mode was
    entry >> c + e. Returns (best total, best construct, best execute,
    median total, stall discards, cpu discards, steady-state spread,
    steady delta, mid-run canary index — see _run_attempts)."""

    def run_once():
        t0 = time.perf_counter()
        df = fn_make_df()
        t1 = time.perf_counter()
        df.count()
        t2 = time.perf_counter()
        return (t2 - t0, t1 - t0, t2 - t1)

    (b, c, e), (mb, _mc, _me), stalls, cpud, spread, delta, mid = _run_attempts(
        run_once, max_runs, watch, cpu, canary
    )
    return b, c, e, mb, stalls, cpud, spread, delta, mid


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    from pyspark.sql import functions as F

    from sum_spark.session import get_spark
    from sum_spark.queries import REGISTRY

    spark = get_spark("sum_spark_bench")

    # Warm up the JVM + parquet footer caches with a trivial action.
    REGISTRY["q02_lookup_topk"].fn(spark, sf_dir).count()

    # SPARK_GRAFT_BENCH_RUNS=1 switches to one timed run per plan (cold,
    # no retry) so the best-of-N flattening is auditable — BASELINE.md's
    # round notes record both numbers. SPARK_GRAFT_BENCH_LEGS=0 skips the
    # per-leg pass (entry totals only, the pre-round-5 behavior).
    max_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    time_legs = os.environ.get("SPARK_GRAFT_BENCH_LEGS", "1") != "0"
    # SPARK_GRAFT_BENCH_SIDECAR=0 suppresses the BENCH_LEGS.json write so
    # a judge/driver re-run can't clobber the committed working-tree
    # artifact (VERDICT r9 "what's wrong"); timings still print.
    write_sidecar = os.environ.get("SPARK_GRAFT_BENCH_SIDECAR", "1") != "0"
    watch = _StallWatch() if _STALL_GAP > 0 else None
    cpu = _CpuWindow()

    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    legs: dict[str, float] = {}
    legs_median: dict[str, float] = {}
    split: dict[str, dict[str, float]] = {}
    stall_discards: dict[str, int] = {}
    cpu_discards: dict[str, int] = {}
    unstable: dict[str, float] = {}
    spread_wide: dict[str, dict[str, float]] = {}
    mid_idx: dict[str, float] = {}
    first_build: dict[str, float] = {}

    def measure_entry(name: str) -> dict:
        """One entry group (entry + its legs) measured into a fresh
        record, so a canary-dirty group can be re-measured and swapped
        in atomically. Flag-dict side effects live in the record too —
        applying a re-measurement replaces them instead of unioning a
        stale flag with a clean re-run."""
        fn = REGISTRY[name].fn
        rec: dict = {
            "timings": {},
            "medians": {},
            "legs": {},
            "legs_median": {},
            "split": {},
            "stall": {},
            "cpud": {},
            "unstable": {},
            "spread_wide": {},
            "mid": {},
        }

        # One-time per-process artifact builds run BEFORE the timed
        # bracket and are reported separately (FIRST_BUILD above). On a
        # re-measurement pass the memo is already built: the call is a
        # cheap warm-up and the original build time is kept.
        if name in FIRST_BUILD:
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            first_build.setdefault(name, round(time.perf_counter() - t0, 3))

        # Clean runs disagreeing >= 2x among themselves measured a slow
        # window no in-process watcher can prove (round-11 run-1 shape:
        # construct-side JVM slowness, sys-light, heartbeat quiet) — flag
        # the row so artifact readers discount it. The unstable flag
        # keeps its 1 s absolute floor (r12 change §10); wide-ratio rows
        # under the floor stay visible in spread_wide with their raw
        # delta (ADVICE r12) instead of being silently rounded away.
        def note(
            key: str, stalls: int, cpud_n: int, spread: float, delta: float
        ) -> None:
            if stalls:
                rec["stall"][key] = stalls
            if cpud_n:
                rec["cpud"][key] = cpud_n
            if spread >= 2.0:
                rec["spread_wide"][key] = {"spread": spread, "delta": delta}
                if delta >= 1.0:
                    rec["unstable"][key] = spread

        t, c, e, m, disc, cpud_n, spread, delta, mid = _best_of_split(
            lambda: fn(spark, sf_dir), max_runs, watch=watch, cpu=cpu,
            canary=canary,
        )
        rec["timings"][name] = t
        rec["medians"][name] = m
        rec["split"][name] = {"construct": c, "execute": e}
        rec["mid"][name] = mid
        note(name, disc, cpud_n, spread, delta)
        if not time_legs:
            return rec
        if name in TAGGED_LEGS:
            tag, values = TAGGED_LEGS[name]
            for v in values:
                # Build the full entry, hold the reference (persisted
                # intermediates' finalizers live on it), filter to the leg.
                def leg_df(v=v):
                    whole = fn(spark, sf_dir)
                    out = whole.where(F.col(tag) == v)
                    out._bench_keepalive = whole
                    return out

                key = f"{name}.{v}"
                (
                    rec["legs"][key],
                    rec["legs_median"][key],
                    disc,
                    cpud_n,
                    spread,
                    delta,
                ) = _best_of(leg_df, max_runs, time_build=False, watch=watch, cpu=cpu)
                note(key, disc, cpud_n, spread, delta)
        elif name == "text_profile":
            for leg_name, leg_fn in _text_profile_component_legs().items():
                key = f"{name}.{leg_name}"
                (
                    rec["legs"][key],
                    rec["legs_median"][key],
                    disc,
                    cpud_n,
                    spread,
                    delta,
                ) = _best_of(
                    lambda leg_fn=leg_fn: leg_fn(spark, sf_dir),
                    max_runs,
                    time_build=False,
                    watch=watch,
                    cpu=cpu,
                )
                note(key, disc, cpud_n, spread, delta)
        return rec

    def apply_entry(name: str, rec: dict) -> None:
        for d in (stall_discards, cpu_discards, unstable, spread_wide):
            for key in [
                k for k in d if k == name or k.startswith(name + ".")
            ]:
                del d[key]
        timings.update(rec["timings"])
        medians.update(rec["medians"])
        legs.update(rec["legs"])
        legs_median.update(rec["legs_median"])
        split.update(rec["split"])
        stall_discards.update(rec["stall"])
        cpu_discards.update(rec["cpud"])
        unstable.update(rec["unstable"])
        spread_wide.update(rec["spread_wide"])
        mid_idx.update(rec["mid"])

    # Canary bracket (VERDICT r11 #1): each entry group is bracketed by
    # absolute-yardstick samples; a group whose bracket drifted past
    # _CANARY_MAX is re-measured once at suite end, keeping whichever
    # measurement had the cleaner bracket. per_entry records every
    # group's FINAL bracket index so artifact readers can discount (or
    # normalize) rows the watchers couldn't prove clean.
    canary = _Canary(spark)
    for _ in range(6):  # JIT/codegen warmup reps, not recorded as samples
        canary._rep()
    canary_idx: dict[str, float] = {}
    prev_c = canary.run()
    suspects: list[str] = []
    for name in HEADLINE:
        rec = measure_entry(name)
        cur_c = canary.run()
        drift = round(max(prev_c, cur_c) / _Canary.PIN, 2)
        apply_entry(name, rec)
        canary_idx[name] = drift
        # a slow phase starting AND ending inside the entry's repeat
        # runs passes a clean bracket; the between-runs sample (mid)
        # catches it (VERDICT r12 #7 — the r12 baseline's 43 s knn row).
        if drift > _Canary.MAX_DRIFT or rec["mid"].get(name, 0.0) > _MID_MAX:
            suspects.append(name)
        prev_c = cur_c
    for name in suspects:
        cb = canary.run()
        rec = measure_entry(name)
        ca = canary.run()
        drift = round(max(cb, ca) / _Canary.PIN, 2)
        old_eff = max(canary_idx[name], mid_idx.get(name, 0.0))
        new_eff = max(drift, rec["mid"].get(name, 0.0))
        if new_eff < old_eff:  # keep the measurement with the cleaner window
            apply_entry(name, rec)
            canary_idx[name] = drift
    if watch is not None:
        watch.stop()

    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    if write_sidecar and (legs or split):
        # Sidecar, not stdout: the harness's stdout capture window is
        # ~2,000 chars and the legs dict alone exceeds it (VERDICT r5 #1).
        # "split" carries each entry's construction-vs-execution best
        # (VERDICT r8 #7) so py4j regressions are caught by diff;
        # "stall_discards" records which rows needed host-stall re-runs
        # (VERDICT r9 #1) — an empty dict is the clean-host signature.
        legs_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_LEGS.json"
        )
        with open(legs_path, "w") as fh:
            json.dump(
                {
                    "sf": sf_val,
                    "legs": legs,
                    "legs_median": legs_median,
                    "split": split,
                    "medians": medians,
                    "stall_gap_s": _STALL_GAP,
                    "stall_discards": stall_discards,
                    "cpu_discards": cpu_discards,
                    "unstable": unstable,
                    "spread_wide": spread_wide,
                    "first_build": first_build,
                    "canary": {
                        "pin_s": _Canary.PIN,
                        "max_drift": _Canary.MAX_DRIFT,
                        "drift_index": canary.drift_index(),
                        "per_entry": canary_idx,
                        "mid_per_entry": mid_idx,
                        "mid_max": _MID_MAX,
                        "samples": canary.samples,
                    },
                },
                fh,
                indent=1,
                sort_keys=True,
            )
        print(f"per-leg timings -> {legs_path}", file=sys.stderr)
        print(json.dumps(legs, sort_keys=True), file=sys.stderr)
    print(
        format_stdout_line(
            timings,
            sf_val,
            stalls=sum(stall_discards.values()) + sum(cpu_discards.values()),
            drift=canary.drift_index(),
        )
    )


if __name__ == "__main__":
    main()
