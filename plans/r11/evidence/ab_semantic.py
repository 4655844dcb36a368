"""dedup_semantic corpus-pass attribution + size-gated-persist A/B.

Current ivf_build scans the input 3x: (1) seed-KMV orderBy/limit
collect, (2) `vecs` persist materialization for the iteration passes,
(3) the final ivf_assign over `df`; then semantic_dedup shuffles the
assignment into the per-cluster prune. Variant B persists the INPUT
frame once (size-gated in the real edit; forced here) so seed/iters/
assign all read the cache.

Equivalence: full output frame exceptAll both ways == 0 (the centroid
math is untouched — only where bytes come from changes).

Usage: python .tmp/r11/ab_semantic.py <sf_dir> <reps>
"""
import sys, time, statistics
sys.path.insert(0, "/root/repo")
from feldman_spark.session import get_spark
from pyspark.sql import functions as F

sf_dir = sys.argv[1]
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

spark = get_spark(app_name="ab-semantic", master="local[32]",
                  shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entry
from feldman_spark.pipeline.dedup import semantic_dedup

qs = entry.queries()

# ---- attribution of the current form's passes (one-off) ----
e = entry._t(spark, sf_dir, "embeddings")
dups = e.filter(F.col("vec_id") < 20).select(
    (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label")
d = e.unionByName(dups)

t0 = time.time()
n = d.count()
print(f"input rows {n}  scan {time.time()-t0:.2f}s", flush=True)

t0 = time.time()
rows = (d.select("vec_id", "embedding")
        .withColumn("_h", F.xxhash64(F.col("vec_id")))
        .orderBy("_h").limit(8192).collect())
print(f"seed pass {time.time()-t0:.2f}s ({len(rows)} rows)", flush=True)

from feldman_spark.pipeline.similarity import ivf_build
t0 = time.time()
assigned, cents = ivf_build(d, vec_col="embedding", id_col="vec_id",
                            num_centroids=None, iters=2,
                            target_cluster_rows=256, sizing="balanced")
print(f"ivf_build total (seed+2 iters, lazy assign) {time.time()-t0:.2f}s",
      flush=True)
t0 = time.time()
assigned.write.format("noop").mode("overwrite").save()
print(f"assign pass {time.time()-t0:.2f}s", flush=True)
t0 = time.time()
semantic_dedup(d, "embedding", "vec_id").write.format("noop").mode(
    "overwrite").save()
print(f"full incl prune (build redone) {time.time()-t0:.2f}s", flush=True)

# ---- A/B: current vs persisted-input ----
def current():
    return semantic_dedup(d, "embedding", "vec_id")


def cached_input():
    c = d.persist()
    try:
        return semantic_dedup(c, "embedding", "vec_id")
    finally:
        pass  # unpersist handled by clearCache between reps


a = current()
spark.catalog.clearCache()
b = cached_input()
d1 = a.exceptAll(b).count()
d2 = b.exceptAll(a).count()
print(f"symdiff {d1} + {d2}", flush=True)
assert d1 == 0 and d2 == 0

ta, tb = [], []
for i in range(reps):
    for name, fn, acc in (("cur", current, ta), ("cache", cached_input, tb)):
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"semantic {name} rep{i}")
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        acc.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
print("cur:  ", [round(x, 2) for x in ta], "median",
      round(statistics.median(ta), 2), "min", round(min(ta), 2), flush=True)
print("cache:", [round(x, 2) for x in tb], "median",
      round(statistics.median(tb), 2), "min", round(min(tb), 2), flush=True)
