"""Stage attribution for dedup_winnow_pairs at a given SF: time
(1) fingerprint+g build (persist materialization),
(2) pair stream count (join + id_a<id_b filter, partial-agg count —
    no pair shuffle),
(3) full operator to noop (adds the (id_a,id_b) shuffle + final agg +
    top-100 sort),
plus the pair-stream row count and sum C(df,2).
Usage: python .tmp/r11/probe_winnow.py <sf_dir>
"""
import sys, time
sys.path.insert(0, "/root/repo")
from feldman_spark.session import get_spark
from pyspark.sql import functions as F

sf_dir = sys.argv[1]
spark = get_spark(app_name="probe-winnow", master="local[32]",
                  shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entry
from feldman_spark.pipeline.text import winnow_fingerprints

d = entry._tw(spark, sf_dir, "documents")

t0 = time.time()
fp = winnow_fingerprints(d, "doc_id", F.col("text"), k=12, w=4)
g = (fp.select(F.col("doc_id").alias("_id"), "fp_pos", "fp_hash")
     .groupBy("fp_hash", "_id").agg(F.min("fp_pos").alias("_p"))
     .persist())
n_g = g.count()
t_g = time.time() - t0
print(f"g rows {n_g}  build {t_g:.2f}s", flush=True)

hdf = (g.groupBy("fp_hash").agg(F.count("*").alias("_df"))
       .filter((F.col("_df") >= 2) & (F.col("_df") <= 50)))
stats = hdf.agg(
    F.count("*").alias("hashes"),
    F.sum(F.col("_df") * (F.col("_df") - 1) / 2).alias("sum_c2")).collect()[0]
print(f"qualifying hashes {stats['hashes']}  sum C(df,2) {stats['sum_c2']}",
      flush=True)

slim = g.join(hdf.select("fp_hash"), "fp_hash")
a = slim.select("fp_hash", F.col("_id").alias("id_a"), F.col("_p").alias("_pa"))
b = slim.select("fp_hash", F.col("_id").alias("id_b"), F.col("_p").alias("_pb"))
pairs = a.join(b, "fp_hash").filter(F.col("id_a") < F.col("id_b"))

t0 = time.time()
n_pairs = pairs.count()
t_cnt = time.time() - t0
print(f"pair stream rows {n_pairs}  join+count {t_cnt:.2f}s", flush=True)

agg = (pairs.groupBy("id_a", "id_b")
       .agg(F.count("*").alias("n_shared"),
            F.min("_pa").alias("a_first"), F.min("_pb").alias("b_first"))
       .filter(F.col("n_shared") >= 2))
t0 = time.time()
n_agg = agg.count()
t_agg = time.time() - t0
print(f"agg pairs {n_agg}  join+shuffle+agg {t_agg:.2f}s", flush=True)

qs = entry.queries()
for rep in range(2):
    spark.catalog.clearCache()
    t0 = time.time()
    qs["dedup_winnow_pairs"](spark, sf_dir).write.format("noop").mode(
        "overwrite").save()
    print(f"full query rep{rep}: {time.time()-t0:.2f}s", flush=True)
