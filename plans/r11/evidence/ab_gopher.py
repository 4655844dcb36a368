"""Gopher fusion A/B at sf1: pre-fusion shape (base join standalone
union-mode repetition_metrics — 3 text scans) vs fused gopher_quality
(2 scans), with full-frame equivalence via exceptAll both ways.
Usage: python .tmp/r11/ab_gopher.py <sf_dir> <reps>
"""
import sys, time, statistics
sys.path.insert(0, "/root/repo")
from feldman_spark.session import get_spark
from pyspark.sql import functions as F

sf_dir = sys.argv[1]
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

spark = get_spark(app_name="ab-gopher", master="local[32]",
                  shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
docs.count()

from feldman_spark.pipeline.text import (
    gopher_quality, quality_features, repetition_metrics, _gopher_verdict)


def old_form(df):
    # the committed r10 shape: quality base joined with the STANDALONE
    # union-mode repetition_metrics (own token_count denominator scan)
    q = quality_features(F.col("text"))
    base = df.select(
        F.col("doc_id"),
        q["n_tokens"].alias("_q_nt"),
        q["avg_token_len"].alias("_q_atl"),
        q["alpha_ratio"].alias("_q_ar"),
    )
    r = repetition_metrics(df, mode="union")
    joined = base.join(r, "doc_id", "left")
    qcols = {"n_tokens": F.col("_q_nt"), "avg_token_len": F.col("_q_atl"),
             "alpha_ratio": F.col("_q_ar")}
    rcols = {k: F.col(k) for k in
             ("dup_line_frac", "dup_ngram_frac", "top_token_frac")}
    return joined.withColumn(
        "keep", _gopher_verdict(qcols, rcols)
    ).drop("_q_nt", "_q_atl", "_q_ar")


def new_form(df):
    return gopher_quality(df)


a, b = old_form(docs), new_form(docs)
assert a.columns == b.columns, (a.columns, b.columns)
d1 = a.exceptAll(b).count()
d2 = b.exceptAll(a).count()
print(f"symdiff: {d1} + {d2} (rows {a.count()} vs {b.count()})")
assert d1 == 0 and d2 == 0, "VALUE MISMATCH"

# plan scan count
plan = b._sc._jvm.PythonSQLUtils.explainString(
    b._jdf.queryExecution(), "formatted")
n_scan = plan.count("Scan parquet")
n_scan_old = old_form(docs)._sc._jvm.PythonSQLUtils.explainString(
    old_form(docs)._jdf.queryExecution(), "formatted").count("Scan parquet")
print(f"scans: old {n_scan_old} -> new {n_scan}")

ta, tb = [], []
for i in range(reps):
    for name, fn, acc in (("old", old_form, ta), ("new", new_form, tb)):
        spark.sparkContext.setJobDescription(f"gopher {name} rep{i}")
        t0 = time.time()
        fn(docs).write.format("noop").mode("overwrite").save()
        acc.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
print("old:", [round(x, 3) for x in ta],
      "median", round(statistics.median(ta), 3), "min", round(min(ta), 3))
print("new:", [round(x, 3) for x in tb],
      "median", round(statistics.median(tb), 3), "min", round(min(tb), 3))
