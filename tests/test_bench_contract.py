"""bench.py stdout contract: the harness that records the benchmark keeps
only the last ~2,000 characters of output, so the single JSON line bench.py
prints must stay comfortably under that. Round 5 broke this by inlining the
per-leg timings dict (3.2 KB line -> BENCH_r05 unparseable); legs now go to
the BENCH_LEGS.json sidecar and this test pins the stdout budget so a future
widening can't silently regress the contract again."""

from __future__ import annotations

import json

import bench


def _fake_timings() -> dict[str, float]:
    # Worst-case realistic widths: three-digit seconds with 3 decimals.
    return {name: 999.999 for name in bench.HEADLINE}


def test_stdout_line_under_capture_window():
    line = bench.format_stdout_line(_fake_timings(), 0.1, stalls=999)
    assert len(line) < 1800, (
        f"bench stdout line is {len(line)} chars; the harness tail capture "
        "is ~2000 — move data to BENCH_LEGS.json, don't widen this line"
    )
    assert "\n" not in line


def test_stdout_line_is_parseable_json_with_required_keys():
    line = bench.format_stdout_line(_fake_timings(), 0.1)
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_suite_total"
    assert parsed["unit"] == "sec"
    assert parsed["sf"] == 0.1
    assert set(parsed["queries"]) == set(bench.HEADLINE)
    assert parsed["value"] == round(sum(parsed["queries"].values()), 3)
    assert "legs" not in parsed  # legs belong to the sidecar file only


class _FakeWatch:
    """Scripted stand-in for bench._StallWatch: max_gap() returns the
    next value from the script (one per run), so tests can declare which
    attempts 'straddled a stall'."""

    def __init__(self, gaps):
        self._gaps = list(gaps)

    def reset(self):
        pass

    def max_gap(self):
        return self._gaps.pop(0) if self._gaps else 0.0


def test_run_attempts_discards_stalled_runs_and_reruns():
    """VERDICT r9 #1: a run whose window contained a heartbeat gap >=
    the stall threshold measured the host, not the plan — it must not
    fold into the best, and it earns a re-run."""
    times = iter([50.0, 3.1, 3.2, 3.05])  # stalled, then three clean
    runs = []

    def run_once():
        t = next(times)
        runs.append(t)
        return (t,)

    # First attempt stalls (gap 30 s), the rest are clean.
    best, med, discards, cpud, spread, delta, mid = bench._run_attempts(
        run_once, max_runs=3, watch=_FakeWatch([30.0])
    )
    assert discards == 1
    assert cpud == 0
    assert best == (3.05,)  # the stalled 50 s run did NOT win or count
    assert med == (3.1,)  # median over the three CLEAN runs only
    assert len(runs) == 4  # 3 clean runs + the discarded one


def test_run_attempts_all_stalled_falls_back_with_discard_count():
    """If every attempt stalled, a number must still be produced — the
    stalled minima — and the discard count says how much to trust it.
    The extra-attempt cap bounds the spin during a long storm."""
    best, med, discards, cpud, spread, delta, mid = bench._run_attempts(
        lambda: (9.0,), max_runs=2, watch=_FakeWatch([30.0] * 10)
    )
    assert best == (9.0,)
    assert med == (9.0,)
    assert discards == 2 + bench._STALL_EXTRA  # max_runs + extras, all burned


def test_run_attempts_early_exit_only_above_one_second():
    """VERDICT r10 #2: sub-second entries were where two same-HEAD clean
    runs disagreed 2-5x, so they now take ALL max_runs clean runs — the
    two-run early exit applies only to the (1, 2] s band (cheap enough
    to want the skip, long enough to be stable). Discarded runs never
    advance the exit either way."""
    calls = []

    def run_once():
        calls.append(1)
        return (0.5,)

    best, med, discards, *_ = bench._run_attempts(
        run_once, max_runs=3, watch=_FakeWatch([30.0, 0.0, 0.0, 0.0])
    )
    assert best == (0.5,)
    assert discards == 1
    assert len(calls) == 4  # 1 discarded + 3 clean: NO early exit below 1 s

    mid_calls = []

    def run_mid():
        mid_calls.append(1)
        return (1.5,)

    best, med, discards, *_ = bench._run_attempts(
        run_mid, max_runs=3, watch=_FakeWatch([0.0, 0.0, 0.0])
    )
    assert best == (1.5,)
    assert len(mid_calls) == 2  # early exit after two clean 1-2 s runs


class _FakeCpu:
    """Scripted _CpuWindow: suspect() returns the next scripted value."""

    def __init__(self, flags):
        self._flags = list(flags)

    def reset(self):
        pass

    def suspect(self):
        return self._flags.pop(0) if self._flags else False


def test_run_attempts_discards_cpu_pathological_runs():
    """VERDICT r10 #2: a window whose host-wide CPU profile matched the
    sys-heavy/user-idle pathology is discarded like a stall, counted
    separately (the sidecar tells freezes from slow windows apart)."""
    times = iter([4.0, 1.2, 1.3])
    best, med, stalls, cpud, spread, delta, mid = bench._run_attempts(
        lambda: (next(times),),
        max_runs=3,
        watch=_FakeWatch([0.0, 0.0, 0.0]),
        cpu=_FakeCpu([True, False, False]),
    )
    assert stalls == 0
    assert cpud == 1
    assert best == (1.2,)  # the 4.0 s pathological window did not count


def test_cpu_window_suspect_shape():
    """The detector fires exactly on the documented pathology shapes —
    sys-heavy/user-idle (page-zeroing churn) and steal-heavy (the VM
    host descheduled, round-11 run-1's invisible slow phase) — and
    stays quiet on healthy busy or idle windows."""
    w = bench._CpuWindow()
    w.enabled = True

    def shape(du, ds, dt, dst=0):
        w._t0 = (1000, 500, 50, 100000)
        w._read = lambda: (1000 + du, 500 + ds, 50 + dst, 100000 + dt)
        return w.suspect()

    assert shape(du=20, ds=4000, dt=10000) is True  # 40% sys, 0.2% user
    assert shape(du=8000, ds=1500, dt=10000) is False  # busy JVM: user-heavy
    assert shape(du=100, ds=200, dt=10000) is False  # idle: both low
    assert shape(du=900, ds=3500, dt=10000) is True  # 35% sys, 9% user
    assert shape(du=5000, ds=500, dt=10000, dst=2500) is True  # 25% steal
    assert shape(du=5000, ds=500, dt=10000, dst=500) is False  # 5% steal ok
    w.enabled = False
    assert w.suspect() is False  # disabled platform never discards


def test_run_attempts_spread_flags_wide_clean_runs():
    """Clean runs disagreeing among themselves measured a slow window no
    in-process watcher can prove (round-11 run-1: construct-side JVM
    slowness, sys-light, heartbeat quiet). The returned spread is the
    artifact-level flag — max/min of the STEADY-STATE clean totals: the
    first run's one-time costs (codegen, memoized builds) are excluded,
    or every memoizing entry would flag itself. The raw steady DELTA is
    returned alongside (ADVICE r12): the unstable flag's 1 s absolute
    floor now lives in the CONSUMER (bench.main's note()), so fast-leg
    drift stays visible in the sidecar's spread_wide block instead of
    being rounded away here."""
    times = iter([6.0, 2.4, 5.1])
    best, med, stalls, cpud, spread, delta, mid = bench._run_attempts(
        lambda: (next(times),), max_runs=3, watch=_FakeWatch([0.0] * 3)
    )
    assert best == (2.4,)
    assert spread == 2.12  # 5.1 / 2.4 over runs 2-3; the cold 6.0 excluded
    assert delta == 2.7  # 5.1 - 2.4

    # cold-build shape: expensive first run, agreeing warm runs -> quiet
    times = iter([108.0, 6.1, 6.3])
    *_, spread, delta, _mid = bench._run_attempts(
        lambda: (next(times),), max_runs=3, watch=_FakeWatch([0.0] * 3)
    )
    assert spread < 2.0

    # sub-second jitter shape: the RATIO is now reported raw (the 1 s
    # floor moved to the flag consumer) with the delta that lets a
    # reader tell scheduler jitter from real fast-leg drift.
    times = iter([0.5, 0.2, 0.45])
    *_, spread, delta, _mid = bench._run_attempts(
        lambda: (next(times),), max_runs=3, watch=_FakeWatch([0.0] * 3)
    )
    assert spread == 2.25 and delta == 0.25


class _FakeMidCanary:
    """Scripted canary: _rep() returns the next scripted seconds."""

    PIN = bench._Canary.PIN

    def __init__(self, reps):
        self._reps = list(reps)

    def _rep(self):
        return self._reps.pop(0) if self._reps else bench._Canary.PIN


def test_run_attempts_mid_canary_catches_inside_window(monkeypatch):
    """VERDICT r12 #7: a slow phase that starts AND ends inside one
    entry's repeat runs passes a clean group bracket — the between-runs
    canary rep is what sees it. mid = worst rep / pin."""
    pin = bench._Canary.PIN
    times = iter([3.0, 3.1, 3.2])
    *_, mid = bench._run_attempts(
        lambda: (next(times),),
        max_runs=3,
        watch=_FakeWatch([0.0] * 3),
        canary=_FakeMidCanary([pin, 4 * pin, pin]),
    )
    assert mid == 4.0  # the dirty between-runs window is visible

    times = iter([3.0, 3.1, 3.2])
    *_, mid = bench._run_attempts(
        lambda: (next(times),), max_runs=3, watch=_FakeWatch([0.0] * 3)
    )
    assert mid == 0.0  # no canary wired -> no mid index


def test_stallwatch_heartbeat_stays_quiet_on_a_healthy_thread():
    """The real heartbeat's gap under no load is ~the sample interval —
    far below the 2 s discard threshold (sanity that the default can't
    discard healthy runs)."""
    import time as _t

    w = bench._StallWatch(interval=0.01)
    try:
        _t.sleep(0.3)
        assert w.max_gap() < bench._STALL_GAP / 4
        w.reset()
        _t.sleep(0.05)
        assert w.max_gap() < bench._STALL_GAP / 4
    finally:
        w.stop()


def test_legs_do_not_fit_and_therefore_must_stay_off_stdout():
    # Documents WHY the sidecar exists: the legs dict alone (round-5
    # shape: ~67 entries) pushes the line past the capture window.
    legs = {f"entry_name_{i:02d}.legtag": 999.999 for i in range(67)}
    inline = json.dumps(dict(json.loads(bench.format_stdout_line(_fake_timings(), 0.1)), legs=legs))
    assert len(inline) > 2000


def test_sidecar_leg_keys_map_to_declared_legs():
    """Every leg key in the committed BENCH_LEGS.json sidecar must map to
    a leg bench.py still declares (entry in HEADLINE x a tag value in
    TAGGED_LEGS, or a text_profile component): a renamed/dropped leg tag
    would otherwise silently orphan its row and its 2x-gate baseline
    comparison (VERDICT r6 #8). Declared entries must also all be in
    HEADLINE, or their legs never get timed at all."""
    import os

    declared = set()
    for name, (_tag, values) in bench.TAGGED_LEGS.items():
        assert name in bench.HEADLINE, f"{name} has legs but isn't timed"
        declared |= {f"{name}.{v}" for v in values}
    declared |= {
        f"text_profile.{n}" for n in bench._text_profile_component_legs()
    }

    sidecar = os.path.join(os.path.dirname(bench.__file__), "BENCH_LEGS.json")
    assert os.path.isfile(sidecar)
    with open(sidecar) as fh:
        legs = json.load(fh)["legs"]
    orphans = set(legs) - declared
    assert not orphans, f"sidecar legs no longer declared in bench.py: {sorted(orphans)}"


def test_stdout_line_with_drift_stays_parseable_and_under_window():
    """The run-level canary drift index (VERDICT r11 #1) rides on the
    stdout line — it must not push the line past the capture window
    even at worst-case widths, and must round-trip as a number."""
    line = bench.format_stdout_line(_fake_timings(), 0.1, stalls=999, drift=99.99)
    assert len(line) < 1800
    parsed = json.loads(line)
    assert parsed["drift"] == 99.99
    # drift omitted entirely when not measured (legacy line shape).
    assert "drift" not in json.loads(bench.format_stdout_line(_fake_timings(), 0.1))


def test_sidecar_canary_bracket_covers_every_entry():
    """The committed sidecar must carry the canary bracket (VERDICT r11
    #1): the pin, the run-level drift index, and one FINAL bracket index
    per timed entry — the row-level trust signal readers use to discount
    (or normalize) windows the in-process watchers couldn't prove
    clean."""
    import os

    sidecar = os.path.join(os.path.dirname(bench.__file__), "BENCH_LEGS.json")
    with open(sidecar) as fh:
        canary = json.load(fh)["canary"]
    assert {"pin_s", "max_drift", "drift_index", "per_entry", "samples"} <= set(
        canary
    )
    assert canary["pin_s"] > 0
    assert set(canary["per_entry"]) == set(bench.HEADLINE)
    assert len(canary["samples"]) >= len(bench.HEADLINE) + 1
    # mid-run detection (VERDICT r12 #7): one between-runs index per entry
    assert set(canary["mid_per_entry"]) == set(bench.HEADLINE)
    assert canary["mid_max"] >= 1.7  # above single-rep jitter


def test_sidecar_first_build_covers_memoizing_entries():
    """Entries with one-time per-process artifact builds (FIRST_BUILD)
    report the build's wall time in its own sidecar row instead of
    contaminating run 1 of the timed bracket (VERDICT r12 #3). Every
    FIRST_BUILD name must be a real timed entry and have a row."""
    import os

    assert set(bench.FIRST_BUILD) <= set(bench.HEADLINE)
    sidecar = os.path.join(os.path.dirname(bench.__file__), "BENCH_LEGS.json")
    with open(sidecar) as fh:
        fb = json.load(fh)["first_build"]
    assert set(fb) == set(bench.FIRST_BUILD)
    assert all(v >= 0 for v in fb.values())


def test_sidecar_split_covers_every_headline_entry():
    """The sidecar's construction-vs-execution split (VERDICT r8 #7) must
    cover exactly the timed entries with both phases present, so a py4j
    construction regression is a mechanical sidecar diff — and it stays
    OFF stdout (the stdout line shape is pinned above, unchanged)."""
    import os

    sidecar = os.path.join(os.path.dirname(bench.__file__), "BENCH_LEGS.json")
    with open(sidecar) as fh:
        split = json.load(fh)["split"]
    assert set(split) == set(bench.HEADLINE)
    for name, phases in split.items():
        assert set(phases) == {"construct", "execute"}, name
        assert all(v >= 0 for v in phases.values()), name
