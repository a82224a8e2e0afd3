#!/usr/bin/env python
"""Per-query forensic profile: wall seconds, Spark JOB count, stage
and task counts, for named queries (guide §1: measure first; the
job-accounting method that found the dedup_incremental and perceptron
constants). Timing protocol mirrors bench.py (warm noop save, then a
timed cold run with clearCache + GC), but each timed run executes in
its own job group so the status tracker attributes every job to the
query being measured.

Usage: python scripts/profile_queries.py <query> [query ...]
       [--sf=/root/testdata/sf0.1] [--runs=2] [--explain]

``--explain`` additionally writes plans/r12/<query>_profile.txt with
the formatted plan of the RETURNED frame (eager-construction queries
return a checkpointed LogicalRDD scan — their real work is the
construction jobs this script counts).
"""

from __future__ import annotations

import gc
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from stock_indicators_etl_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = "/root/testdata/sf0.1"
    runs = 2
    explain = False
    names: list[str] = []
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        elif a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
        elif a == "--explain":
            explain = True
        else:
            names.append(a)

    import __spark_entry__ as entry_mod
    from bench import EAGER_CONSTRUCTION

    spark = get_spark(app_name="profile")
    queries = entry_mod.queries()
    for n, fn in entry_mod.extra_queries().items():
        queries.setdefault(n, fn)

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    out: dict[str, dict] = {}
    for name in names:
        fn = queries[name]
        df = fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()  # warm
        best = None
        for r in range(runs):
            spark.catalog.clearCache()
            gc.collect()
            sc._jvm.System.gc()
            group = f"prof_{name}_{r}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            d = fn(spark, sf_dir) if name in EAGER_CONSTRUCTION else df
            d.write.mode("overwrite").format("noop").save()
            wall = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            job_ids = tracker.getJobIdsForGroup(group)
            n_stages = n_tasks = 0
            for jid in job_ids:
                ji = tracker.getJobInfo(jid)
                if ji is None:
                    continue
                for sid in ji.stageIds:
                    si = tracker.getStageInfo(sid)
                    if si is not None and si.numCompletedTasks > 0:
                        n_stages += 1
                        n_tasks += si.numCompletedTasks
            rec = {
                "wall": round(wall, 3),
                "jobs": len(job_ids),
                "stages_run": n_stages,
                "tasks": n_tasks,
            }
            if best is None or rec["wall"] < best["wall"]:
                best = rec
        out[name] = best
        print(json.dumps({name: best}), flush=True)
        if explain:
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                fn(spark, sf_dir).explain("formatted")
            p = Path(__file__).resolve().parent.parent / "plans" / "r12"
            p.mkdir(parents=True, exist_ok=True)
            (p / f"{name}_profile.txt").write_text(buf.getvalue())
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
