"""Alternating A/B of winnow_shared_pairs variants.
V0 current: SMJ/AQE-chosen self-join on fp_hash, (id_a,id_b) agg keys
V1 = V0 + SHUFFLE_HASH join hint
V2 = packed single-long pair key ((id_a<<32)|id_b), int positions
V3 = V1 + V2
Value equivalence: xxhash64 row-set checksum over the FULL pair frame
(not just top-100) for every variant vs V0.
Usage: python .tmp/r11/ab_winnow.py <sf_dir> <reps> [variants]
"""
import sys, time, statistics
sys.path.insert(0, "/root/repo")
from feldman_spark.session import get_spark
from pyspark.sql import functions as F

sf_dir = sys.argv[1]
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
which = sys.argv[3].split(",") if len(sys.argv) > 3 else ["v0", "v2", "v3"]

spark = get_spark(app_name="ab-winnow", master="local[32]",
                  shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entry
from feldman_spark.pipeline.text import winnow_fingerprints

d = entry._tw(spark, sf_dir, "documents")
fp = winnow_fingerprints(d, "doc_id", F.col("text"), k=12, w=4)
g = (fp.select(F.col("doc_id").alias("_id"), "fp_pos", "fp_hash")
     .groupBy("fp_hash", "_id").agg(F.min("fp_pos").alias("_p"))
     .persist())
g.count()  # materialize once; every variant reads the same cache

hdf = (g.groupBy("fp_hash").agg(F.count("*").alias("_df"))
       .filter((F.col("_df") >= 2) & (F.col("_df") <= 50)))


def pairs_v0(hint=None):
    slim = g.join(hdf.select("fp_hash"), "fp_hash")
    if hint:
        slim = slim.hint(hint)
    a = slim.select("fp_hash", F.col("_id").alias("id_a"),
                    F.col("_p").alias("_pa"))
    b = slim.select("fp_hash", F.col("_id").alias("id_b"),
                    F.col("_p").alias("_pb"))
    return (a.join(b, "fp_hash")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("n_shared"),
                 F.min("_pa").alias("a_first"),
                 F.min("_pb").alias("b_first"))
            .filter(F.col("n_shared") >= 2))


def pairs_packed(hint=None):
    slim = g.join(hdf.select("fp_hash"), "fp_hash")
    if hint:
        slim = slim.hint(hint)
    a = slim.select("fp_hash", F.col("_id").alias("id_a"),
                    F.col("_p").cast("int").alias("_pa"))
    b = slim.select("fp_hash", F.col("_id").alias("id_b"),
                    F.col("_p").cast("int").alias("_pb"))
    j = (a.join(b, "fp_hash")
         .filter(F.col("id_a") < F.col("id_b"))
         .select(
             (F.shiftleft(F.col("id_a"), 32)
              .bitwiseOR(F.col("id_b"))).alias("_k"),
             "_pa", "_pb"))
    agg = (j.groupBy("_k")
           .agg(F.count("*").alias("n_shared"),
                F.min("_pa").alias("a_first"),
                F.min("_pb").alias("b_first"))
           .filter(F.col("n_shared") >= 2))
    return agg.select(
        F.shiftright(F.col("_k"), 32).alias("id_a"),
        F.col("_k").bitwiseAND(F.lit(0xFFFFFFFF)).alias("id_b"),
        "n_shared",
        F.col("a_first").cast("long").alias("a_first"),
        F.col("b_first").cast("long").alias("b_first"))


VARIANTS = {
    "v0": lambda: pairs_v0(),
    "v1": lambda: pairs_v0("shuffle_hash"),
    "v2": lambda: pairs_packed(),
    "v3": lambda: pairs_packed("shuffle_hash"),
}


def checksum(df):
    r = df.select(
        F.bit_xor(F.xxhash64("id_a", "id_b", "n_shared", "a_first",
                             "b_first")).alias("x"),
        F.count("*").alias("n")).collect()[0]
    return (r["x"], r["n"])


import os
if os.environ.get("SKIP_CHECK"):
    base = None
else:
    base = checksum(VARIANTS["v0"]())
if base is not None:
    print(f"v0 checksum x={base[0]} n={base[1]}", flush=True)
    for v in which:
        if v == "v0":
            continue
        c = checksum(VARIANTS[v]())
        ok = "OK" if c == base else "MISMATCH"
        print(f"{v} checksum x={c[0]} n={c[1]}  {ok}", flush=True)
        assert c == base, v

# plan join strategy per variant
for v in which:
    df = VARIANTS[v]()
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    print(f"{v}: SMJ={plan.count('SortMergeJoin')} "
          f"SHJ={plan.count('ShuffledHashJoin')} "
          f"BHJ={plan.count('BroadcastHashJoin')} "
          f"Exchange={plan.count('Exchange')} Sort={plan.count('(Sort ')}",
          flush=True)

acc = {v: [] for v in which}
for i in range(reps):
    for v in which:
        spark.sparkContext.setJobDescription(f"winnow {v} rep{i}")
        t0 = time.time()
        VARIANTS[v]().write.format("noop").mode("overwrite").save()
        acc[v].append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
for v in which:
    xs = acc[v]
    print(f"{v}: {[round(x, 2) for x in xs]} median "
          f"{statistics.median(xs):.2f} min {min(xs):.2f}", flush=True)
