"""Interleaved A/B: abundance group-total attach — window (old) vs
partial-agg + null-safe join (new, the shipped form).

Usage: python tools/ab_abund.py [--runs N] [query ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*",
                    default=["tpm", "rpkm", "rel_abund", "pivot_wider"])
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from glamr_omics_pipelines_spark.session import get_spark
    from glamr_omics_pipelines_spark.operators import _cache, _ckpt, abundance
    import __spark_entry__ as E

    new_tpm, new_rpkm, new_rel = (abundance.tpm, abundance.rpkm,
                                  abundance.rel_abund)

    def old_rel(df, value, sample_cols, out="rel_abund"):
        w = Window.partitionBy(*sample_cols)
        return df.withColumn(out, F.try_divide(F.col(value),
                                               F.sum(value).over(w)))

    def old_rpkm(df, count, length, sample_cols, out="rpkm"):
        w = Window.partitionBy(*sample_cols)
        return df.withColumn(out, F.try_divide(
            F.col(count) * F.lit(1e9), F.sum(count).over(w) * F.col(length)))

    def old_tpm(df, count, length, sample_cols, out="tpm"):
        w = Window.partitionBy(*sample_cols)
        rate = F.try_divide(F.col(count), F.col(length))
        return df.withColumn(out, F.try_divide(F.lit(1e6) * rate,
                                               F.sum(rate).over(w)))

    def set_arm(arm):
        if arm == "old":
            abundance.tpm, abundance.rpkm, abundance.rel_abund = (
                old_tpm, old_rpkm, old_rel)
        else:
            abundance.tpm, abundance.rpkm, abundance.rel_abund = (
                new_tpm, new_rpkm, new_rel)

    spark = get_spark("ab-abund")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    spark.read.parquet(os.path.join(args.sf, "region.parquet")).count()

    def release():
        spark.catalog.clearCache()
        _ckpt.release_checkpoints()
        _cache.release_caches()

    for name in args.queries:
        fn = qs[name]
        for arm in ("old", "new"):
            set_arm(arm)
            fn(spark, args.sf).collect()
            release()
        old_runs, new_runs = [], []
        for _ in range(args.runs):
            for arm, runs_list in (("old", old_runs), ("new", new_runs)):
                set_arm(arm)
                spark.sparkContext.setJobDescription(f"ab:{name}:{arm}")
                t0 = time.perf_counter()
                fn(spark, args.sf).collect()
                runs_list.append(time.perf_counter() - t0)
                release()
        set_arm("new")
        print(f"AB {name} old_min={min(old_runs):.3f} new_min={min(new_runs):.3f}"
              f" old={','.join(f'{r:.2f}' for r in old_runs)}"
              f" new={','.join(f'{r:.2f}' for r in new_runs)}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
