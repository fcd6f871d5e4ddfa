"""Core sweep for the 32-core overhead-floor investigation (VERDICT r12
#5): time selected entries best-of-3 (construct/execute split) at the
core count given by $SPARK_GRAFT_CPUS, and count the Spark JOBS each
entry's construct+execute submits — if the job count were scaling with
cores it would be an engine bug; a constant job count with per-task
scheduling overhead is the SF floor.

Usage: SPARK_GRAFT_CPUS=8 python tools_r13/core_sweep.py [entry ...]
Prints one JSON line.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "q02_lookup_topk",
    "q12_grouped_agg",
    "q16_window_rank",
    "q28_sliding_window",
    "q44_range_join",
    "assign_ids",
    "global_shuffle",
]


def main():
    names = sys.argv[1:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from sum_spark.session import get_spark
    from sum_spark.queries import REGISTRY

    spark = get_spark("core_sweep")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    REGISTRY["q02_lookup_topk"].fn(spark, sf_dir).count()  # warm up

    out = {"cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "8")), "entries": {}}
    for name in names:
        fn = REGISTRY[name].fn
        best = None
        jobs = None
        for _ in range(3):
            j0 = set(tracker.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.count()
            t2 = time.perf_counter()
            j1 = set(tracker.getJobIdsForGroup(None) or [])
            rec = (round(t2 - t0, 3), round(t1 - t0, 3), round(t2 - t1, 3))
            if best is None or rec[0] < best[0]:
                best = rec
            jobs = len(j1 - j0)  # steady-state job count (last run)
        out["entries"][name] = {
            "total": best[0],
            "construct": best[1],
            "execute": best[2],
            "jobs": jobs,
        }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
