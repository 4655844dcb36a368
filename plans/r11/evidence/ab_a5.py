"""In-process alternating A/B: a5_conditional_sum_hof HOF form vs
decomposable sum(when) form, plus value-equivalence checksums.
Usage: python .tmp/r11/ab_a5.py <sf_dir> <reps>
"""
import sys, time, statistics
sys.path.insert(0, "/root/repo")
from feldman_spark.session import get_spark
from pyspark.sql import functions as F

sf_dir = sys.argv[1]
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

spark = get_spark(app_name="ab-a5", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")

li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
li.count()  # warm footers


def hof(li):
    per_order = li.groupBy("l_orderkey").agg(
        F.collect_list(F.struct("l_discount", "l_extendedprice")).alias("items"))
    discounted = F.aggregate(
        F.filter(F.col("items"), lambda x: x["l_discount"] > 0.05),
        F.lit(0.0),
        lambda acc, x: acc + x["l_extendedprice"],
    )
    return per_order.select(
        "l_orderkey", F.round(discounted, 2).alias("discounted_total"))


def dec(li):
    return li.groupBy("l_orderkey").agg(
        F.round(F.sum(
            F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice"))
            .otherwise(0.0)), 2).alias("discounted_total"))


# value equivalence: row-set checksum over the rounded output
def checksum(df):
    return df.select(
        F.bit_xor(F.xxhash64("l_orderkey", "discounted_total")).alias("x"),
        F.count("*").alias("n")).collect()[0]

ca, cb = checksum(hof(li)), checksum(dec(li))
print(f"checksum hof: x={ca['x']} n={ca['n']}")
print(f"checksum dec: x={cb['x']} n={cb['n']}")
assert (ca["x"], ca["n"]) == (cb["x"], cb["n"]), "VALUE MISMATCH"

ta, tb = [], []
for i in range(reps):
    for name, fn, acc in (("hof", hof, ta), ("dec", dec, tb)):
        spark.sparkContext.setJobDescription(f"a5 {name} rep{i}")
        t0 = time.time()
        fn(li).write.format("noop").mode("overwrite").save()
        acc.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
print("hof:", [round(x, 3) for x in ta],
      "median", round(statistics.median(ta), 3), "min", round(min(ta), 3))
print("dec:", [round(x, 3) for x in tb],
      "median", round(statistics.median(tb), 3), "min", round(min(tb), 3))
