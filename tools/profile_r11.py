"""R11 optimization profiler: per-query isolated timing + formatted plans.

Usage: python tools/profile_r11.py [--plans-out DIR] [--runs N] query [query ...]

For each named query: dump .explain('formatted') to <plans-out>/<q>_<tag>.txt
(tag via --tag, default 'before'), then time N runs with .collect() (the
bench's exact protocol action) and report each run + min.  Queries are timed
in the order given; pass the same query twice to interleave A/B forms.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--plans-out", default="plans/r11")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()

    from glamr_omics_pipelines_spark.session import get_spark
    from glamr_omics_pipelines_spark.operators import _cache, _ckpt
    import __spark_entry__ as E

    spark = get_spark("profile-r11")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    os.makedirs(args.plans_out, exist_ok=True)

    # JVM warm-up (bench does the same)
    spark.read.parquet(os.path.join(args.sf, "region.parquet")).count()

    for name in args.queries:
        fn = qs[name]
        if not args.no_plans:
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(args.plans_out, f"{name}_{args.tag}.txt"),
                      "w") as fh:
                fh.write(plan)
            spark.catalog.clearCache()
            _ckpt.release_checkpoints()
            _cache.release_caches()
        runs = []
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            fn(spark, args.sf).collect()
            runs.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
            _ckpt.release_checkpoints()
            _cache.release_caches()
        print(f"TIME {name} min={min(runs):.3f} runs="
              + ",".join(f"{r:.3f}" for r in runs), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
