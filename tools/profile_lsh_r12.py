"""r12 item-3 profiling: where does the LSH dedup chain spend its time?

Breaks leakage_safe_split / minhash_dedup into sub-stages and times each
cold (registered caches + checkpoints released between measurements, the
bench's r12 cold protocol). Usage:

    python tools/profile_lsh_r12.py [n_reps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from glamr_omics_pipelines_spark.session import get_spark
from glamr_omics_pipelines_spark.operators import _cache, _ckpt, dedup, sampling
from pyspark.sql import functions as F
import __spark_entry__ as E

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 4


def cold():
    spark.catalog.clearCache()
    _ckpt.release_checkpoints()
    _cache.release_caches()


def timed(label, make):
    best = None
    for _ in range(REPS):
        cold()
        t0 = time.perf_counter()
        make().collect()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    cold()
    print(f"{label:42s} {best:7.3f}s")
    return best


spark = get_spark("profile-lsh-r12")
spark.sparkContext.setLogLevel("ERROR")
spark.read.parquet(os.path.join(SF, "region.parquet")).count()

corpus = E._dup_corpus(spark, SF)

# -- stage decomposition --------------------------------------------------
timed("corpus only (scan+union)", lambda: corpus)

timed("signatures (shingle+minhash agg)",
      lambda: dedup.minhash_signatures(corpus, "doc_id", "text", 32, 4))

timed("bands (sig + band explode)",
      lambda: dedup.minhash_bands(corpus, "doc_id", "text", 32, 16, 4))

timed("candidates (bands self-join)",
      lambda: dedup.minhash_lsh_candidates(corpus, "doc_id", "text",
                                           32, 16, 4, dedup_pairs=False))


def verify():
    cands = dedup.minhash_lsh_candidates(corpus, "doc_id", "text",
                                         32, 16, 4, dedup_pairs=False)
    return dedup.ngram_jaccard_pairs(corpus, "doc_id", "text", shingle_n=4,
                                     threshold=0.9, candidates=cands)


timed("+ verify (ngram_jaccard_pairs)", verify)


def clusters():
    pairs = verify()
    return dedup.dup_clusters(pairs.select("id_a", "id_b"))


timed("+ dup_clusters (ckpt+count+cc)", clusters)

timed("full leakage_safe_split",
      lambda: E.queries()["leakage_safe_split"](spark, SF))
timed("full minhash_dedup",
      lambda: E.queries()["minhash_dedup"](spark, SF))
timed("full dedup_keep_best",
      lambda: E.queries()["dedup_keep_best"](spark, SF))
spark.stop()
