"""Interleaved A/B: current code vs. _spread_scan disabled (identity).

Usage: python tools/ab_r11.py query [query ...] [--runs N]
Runs warmup, then alternates B(old),A(new) per round, reports min per arm.
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
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from glamr_omics_pipelines_spark.session import get_spark
    from glamr_omics_pipelines_spark.operators import _cache, _ckpt, dedup
    import __spark_entry__ as E

    spark = get_spark("ab-r11")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    spark.read.parquet(os.path.join(args.sf, "region.parquet")).count()

    spread = getattr(dedup, "_spread_scan", lambda d: d)

    def release():
        spark.catalog.clearCache()
        _ckpt.release_checkpoints()
        _cache.release_caches()

    for name in args.queries:
        fn = qs[name]
        # one warmup run per arm (JIT) before timing
        for arm_fn in (lambda d: d, spread):
            dedup._spread_scan = arm_fn
            fn(spark, args.sf).collect()
            release()
        a_runs, b_runs = [], []
        for _ in range(args.runs):
            for arm, runs_list in (("old", b_runs), ("new", a_runs)):
                dedup._spread_scan = (lambda d: d) if arm == "old" else spread
                t0 = time.perf_counter()
                fn(spark, args.sf).collect()
                runs_list.append(time.perf_counter() - t0)
                release()
        dedup._spread_scan = spread
        print(f"AB {name} old_min={min(b_runs):.3f} new_min={min(a_runs):.3f} "
              f"old={','.join(f'{r:.2f}' for r in b_runs)} "
              f"new={','.join(f'{r:.2f}' for r in a_runs)}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
