"""Alternating A/B for the two pass-reduction fixes:
- j7 / nearest_value_join: Spark orderBy+collect of the dimension vs
  driver-side numpy argsort over an Arrow toPandas (old inline here).
- a15 / dense_ids: twice-computed range-partitioned vocab vs persisted.
Values: full-frame checksums old vs new.
Usage: python .tmp/r11/ab_j7_a15.py <sf_dir> <reps>
"""
import sys, time, statistics
sys.path.insert(0, "/root/repo")
import numpy as np
from feldman_spark.session import get_spark
from pyspark.sql import functions as F, Window

sf_dir = sys.argv[1]
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

spark = get_spark(app_name="ab-j7-a15", master="local[32]",
                  shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as entry

# ---------------- j7 ----------------
from pyspark.sql.types import DoubleType, StructField, StructType


def j7_old():
    cu = entry._t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    pa = entry._t(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    rv, rid = "p_retailprice", "p_partkey"
    rows = (pa.groupBy(rv).agg(F.min(rid).alias(rid)).orderBy(rv).collect())
    values = np.array([r[rv] for r in rows], dtype=np.float64)
    ids = np.array([r[rid] for r in rows])
    sc = spark.sparkContext
    b_values, b_ids = sc.broadcast(values), sc.broadcast(ids)
    schema = StructType(list(cu.schema.fields) + [
        StructField("nearest_partkey", pa.schema[rid].dataType),
        StructField("nearest_price", DoubleType())])

    def search(batches):
        vals, idarr = b_values.value, b_ids.value
        for pdf in batches:
            x = pdf["c_acctbal"].to_numpy(dtype=np.float64)
            pos = np.searchsorted(vals, x)
            lo = np.clip(pos - 1, 0, len(vals) - 1)
            hi = np.clip(pos, 0, len(vals) - 1)
            d_lo = np.abs(x - vals[lo])
            d_hi = np.abs(vals[hi] - x)
            use_hi = (d_hi < d_lo) | ((d_hi == d_lo) & (idarr[hi] < idarr[lo]))
            best = np.where(use_hi, hi, lo)
            out = pdf.copy()
            out["nearest_partkey"] = idarr[best]
            out["nearest_price"] = vals[best]
            yield out

    out = cu.mapInPandas(search, schema=schema)
    return out.select(
        "c_custkey", "nearest_partkey",
        F.round(F.abs(F.col("c_acctbal") - F.col("nearest_price")), 2)
        .alias("price_diff"))


def j7_new():
    return entry.queries()["j7_nearest_join"](spark, sf_dir)


def cks(df):
    r = df.select(F.bit_xor(F.xxhash64(*df.columns)).alias("x"),
                  F.count("*").alias("n")).collect()[0]
    return (r["x"], r["n"])


a, b = cks(j7_old()), cks(j7_new())
print(f"j7 old {a} new {b}  {'OK' if a == b else 'MISMATCH'}", flush=True)
assert a == b

# ---------------- a15 ----------------
def a15_toks():
    d = entry._t(spark, sf_dir, "documents")
    return d.select(F.explode(
        F.filter(F.split(F.lower(F.col("text")), r"\s+"),
                 lambda t: t != "")).alias("token"))


def a15_old():
    toks = a15_toks()
    vals = (toks.select(F.col("token").alias("_v"))
            .filter(F.col("_v").isNotNull()).distinct()
            .repartitionByRange(8, F.col("_v")))
    tagged = vals.withColumn("_pid", F.spark_partition_id())
    counts = sorted((r["_pid"], r["n"]) for r in
                    tagged.groupBy("_pid").agg(F.count("*").alias("n"))
                    .collect())
    offsets, acc = {}, 0
    for pid, n in counts:
        offsets[pid] = acc
        acc += n
    off_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid int, _off long")
    w = Window.partitionBy("_pid").orderBy(F.col("_v").asc())
    return (tagged.join(F.broadcast(off_df), "_pid")
            .withColumn("id", F.col("_off") + F.row_number().over(w))
            .select(F.col("_v").alias("token"), F.col("id")))


def a15_new():
    return entry.queries()["a15_dense_ids"](spark, sf_dir)


a, b = cks(a15_old()), cks(a15_new())
print(f"a15 old {a} new {b}  {'OK' if a == b else 'MISMATCH'}", flush=True)
assert a == b

FNS = {"j7_old": j7_old, "j7_new": j7_new,
       "a15_old": a15_old, "a15_new": a15_new}
acc = {k: [] for k in FNS}
for i in range(reps):
    for k, fn in FNS.items():
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"{k} rep{i}")
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        acc[k].append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
for k in FNS:
    xs = acc[k]
    print(f"{k}: {[round(x, 2) for x in xs]} median "
          f"{statistics.median(xs):.2f} min {min(xs):.2f}", flush=True)
