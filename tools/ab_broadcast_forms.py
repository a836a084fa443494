"""Interleaved same-session A/B (VERDICT r6 #4): broadcast vs shuffle forms
for k_core's alive frontier and dup_clusters' label frame, at sf0.1."""
import sys, time
sys.path.insert(0, '/root/repo')
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
import __spark_entry__ as E
from glamr_omics_pipelines_spark.operators import _cache, dedup, graph, joins

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "24g")
         .config("spark.sql.session.timeZone", "UTC")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"

def kcore(flag):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    sp = li.select(F.col("l_orderkey").alias("g"), F.col("l_partkey").alias("i"))
    edges = graph.cooccurrence_edges(sp, "g", "i").filter(F.col("weight") >= 2)
    graph.k_core(edges, "src", "dst", k=3, rounds=12, broadcast_alive=flag).count()
    _cache.release_caches()

def geo(flag):
    c = (spark.read.parquet(f"{SF}/customer.parquet")
         .select("c_custkey").filter(F.col("c_custkey") < 400))
    pts = c.select(
        F.col("c_custkey").alias("sample_id"),
        (F.lit(41.0) + ((F.col("c_custkey") * 2654435761) % 600000) / F.lit(100000.0)).alias("lat"),
        (F.lit(-87.0) + ((F.col("c_custkey") * 2246822519) % 700000) / F.lit(100000.0)).alias("lon"))
    pairs = joins.geo_neighbor_pairs(pts, "sample_id", radius_km=3.0, max_abs_lat=50.0)
    labels = dedup.dup_clusters(pairs.select("id_a", "id_b"), broadcast_labels=flag)
    (pts.join(labels, pts["sample_id"] == labels["id"], "left")
     .select("sample_id", F.coalesce(F.col("label"), F.col("sample_id")).alias("cluster_id"))
     ).count()
    _cache.release_caches()

# warm
kcore(True); geo(True)
res = {"kcore_bcast": [], "kcore_shuf": [], "geo_bcast": [], "geo_shuf": []}
for i in range(5):
    for key, fn, flag in (("kcore_bcast", kcore, True), ("kcore_shuf", kcore, False),
                          ("geo_bcast", geo, True), ("geo_shuf", geo, False)):
        spark.catalog.clearCache()
        t = time.time(); fn(flag); res[key].append(round(time.time() - t, 3))
import json
print("ABRESULT " + json.dumps({k: {"min": min(v), "all": v} for k, v in res.items()}))
