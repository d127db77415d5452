"""Per-query profiler: attribute bench wall time to (a) DataFrame build
(driver-side work: plan construction, any metadata collects, lake writes
the scenario performs) vs (b) the noop-sink action, plus Spark job counts
and per-job walls from the status tracker.

Usage: python tools/profile_query.py q1,q2,... [reps]

Same session shape as bench.py (local[$SPARK_GRAFT_CPUS], warmup at
sf0.001, min over reps) so the numbers line up with BENCH artifacts.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = [q for q in sys.argv[1].split(",") if q]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from hudi_spark_utilities_plus_spark.queries import QUERIES
    from hudi_spark_utilities_plus_spark.session import build_spark_session

    spark = build_spark_session(
        app_name="profile",
        master=f"local[{cpus}]",
        conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in names:
        try:
            QUERIES[name](spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass
    spark.catalog.clearCache()

    results = {}
    for name in names:
        fn = QUERIES[name]
        best = None
        for _ in range(reps):
            jobs_before = set(tracker.getJobIdsForGroup(None) or [])
            sc.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            sc.setJobDescription(None)
            jobs_after = set(tracker.getJobIdsForGroup(None) or [])
            new_jobs = sorted(jobs_after - jobs_before)
            rec = {
                "build_s": round(t1 - t0, 3),
                "action_s": round(t2 - t1, 3),
                "total_s": round(t2 - t0, 3),
                "n_jobs": len(new_jobs),
            }
            if best is None or rec["total_s"] < best["total_s"]:
                best = rec
            spark.catalog.clearCache()
            import gc

            gc.collect()
            sc._jvm.System.gc()
        results[name] = best
        print(name, json.dumps(best), flush=True)
    print("PROFILE " + json.dumps(results))


if __name__ == "__main__":
    main()
