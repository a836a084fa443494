"""Stage-by-stage timing of dedup_keep_best at sf0.1 (r11 anomaly hunt)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from glamr_omics_pipelines_spark.session import get_spark
from glamr_omics_pipelines_spark.operators import dedup, _cache, _ckpt
from pyspark.sql import functions as F
import __spark_entry__ as E

spark = get_spark("dkb-breakdown")
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"
spark.read.parquet(os.path.join(sf, "region.parquet")).count()

def t(label, fn):
    t0 = time.perf_counter()
    r = fn()
    dt = time.perf_counter() - t0
    print(f"STEP {label}: {dt:.3f}s -> {r}", flush=True)
    return r

corpus = E._dup_corpus(spark, sf).withColumn(
    "score", F.length("text").cast("double"))
t("corpus.count", lambda: corpus.count())
cands = dedup.minhash_lsh_candidates(corpus, "doc_id", "text",
                                     num_hashes=32, bands=16, shingle_n=4,
                                     dedup_pairs=False)
t("cands.count", lambda: cands.count())
pairs = dedup.ngram_jaccard_pairs(corpus, "doc_id", "text", shingle_n=4,
                                  threshold=0.9, candidates=cands)
t("pairs.count", lambda: pairs.count())
labels = dedup.dup_clusters(pairs.select("id_a", "id_b"))
t("labels.count", lambda: labels.count())
out = dedup.keep_best_per_cluster(corpus, labels, "doc_id", "score")
t("out.collect", lambda: len(out.collect()))
spark.catalog.clearCache(); _ckpt.release_checkpoints(); _cache.release_caches()
# full query twice for reference
for i in range(3):
    t0 = time.perf_counter()
    E.queries()["dedup_keep_best"](spark, sf).collect()
    print(f"FULL run{i}: {time.perf_counter()-t0:.3f}s", flush=True)
    spark.catalog.clearCache(); _ckpt.release_checkpoints(); _cache.release_caches()
spark.stop()
