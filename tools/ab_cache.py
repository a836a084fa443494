"""Interleaved A/B: current code vs. _cache.register disabled (no persist).

Times the same query with operator-internal persists ON (new) and OFF
(old, the pre-change form for operators that had no registered persist)
alternating within one session, min per arm — the drift-robust protocol
for adjudicating a persist-the-shared-frame change.

Usage: python tools/ab_cache.py query [query ...] [--runs N]
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
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from glamr_omics_pipelines_spark.session import get_spark
    from glamr_omics_pipelines_spark.operators import _cache, _ckpt
    import __spark_entry__ as E

    spark = get_spark("ab-cache")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    spark.read.parquet(os.path.join(args.sf, "region.parquet")).count()

    def release():
        spark.catalog.clearCache()
        _ckpt.release_checkpoints()
        _cache.release_caches()

    for name in args.queries:
        fn = qs[name]
        for disabled in (True, False):  # warmup both arms (JIT)
            _cache.DISABLED = disabled
            fn(spark, args.sf).collect()
            release()
        old_runs, new_runs = [], []
        for _ in range(args.runs):
            for arm, runs_list in (("old", old_runs), ("new", new_runs)):
                _cache.DISABLED = arm == "old"
                spark.sparkContext.setJobDescription(f"ab:{name}:{arm}")
                t0 = time.perf_counter()
                fn(spark, args.sf).collect()
                runs_list.append(time.perf_counter() - t0)
                release()
        _cache.DISABLED = False
        print(f"AB {name} old_min={min(old_runs):.3f} new_min={min(new_runs):.3f}"
              f" old={','.join(f'{r:.2f}' for r in old_runs)}"
              f" new={','.join(f'{r:.2f}' for r in new_runs)}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
