"""Partitioned parquet layout: partition pruning must show in the plan."""

from pyspark.sql import functions as F

from feldman_spark.engine import load_measurement
from feldman_spark.io.parquet import read_measurement_parquet, write_measurement_parquet


def test_partition_pruning(spark, ref_testdata, tmp_out):
    depth = "Sediment Depth, unscaled (MBS / CSF-A)"
    md = load_measurement(spark, f"{ref_testdata}/GLAD9_Site1_XRF.csv", depth)
    path = f"{tmp_out}/md_partitioned.parquet"
    write_measurement_parquet(md, path)

    back = read_measurement_parquet(spark, path, depth)
    assert back.count() == md.count()

    filtered = back.filter((F.col("Site") == "1") & (F.col("Hole") == "A"))
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    # partition filters are listed separately from data filters
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters")[1][:200]
    assert "Site" in seg and "Hole" in seg


def test_ivf_index_partition_pruning(spark, tmp_out):
    """The materialized IVF index probes with partition pruning: the cid
    filter lands in PartitionFilters (only nprobe/C of the files read),
    and a full-probe query over the on-disk index equals brute force."""
    from feldman_spark.pipeline.similarity import (
        cosine_topk, ivf_build, ivf_read, ivf_topk, ivf_write)

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    corpus = e.filter(F.col("vec_id") != 0)
    q = e.filter(F.col("vec_id") == 0).first()["embedding"]

    path = f"{tmp_out}/ivf_index"
    assigned, cents = ivf_build(corpus, num_centroids=4, iters=1)
    ivf_write(assigned, cents, path)
    index = ivf_read(spark, path)

    probed = ivf_topk(corpus, q, k=5, num_centroids=4, nprobe=1, index=index)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "cid" in plan.split("PartitionFilters")[1][:200]

    exact = ivf_topk(corpus, q, k=5, num_centroids=4, nprobe=4, index=index)
    want = [(r["vec_id"], r["cosine"]) for r in cosine_topk(corpus, q, k=5).collect()]
    got = [(r["vec_id"], r["cosine"]) for r in exact.collect()]
    assert got == want


def test_ivf_incremental_append(spark, tmp_out):
    """Index growth without rebuild: new vectors are assigned with the
    frozen centroids and appended into the cid-partitioned layout; a
    full-probe query over the re-read index sees them."""
    from feldman_spark.pipeline.similarity import (
        ivf_assign, ivf_build, ivf_read, ivf_topk, ivf_write)

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    corpus = e.filter((F.col("vec_id") != 0) & (F.col("vec_id") < 500))
    fresh = e.filter(F.col("vec_id") >= 500)
    q = e.filter(F.col("vec_id") == 0).first()["embedding"]

    path = f"{tmp_out}/ivf_incr"
    assigned, cents = ivf_build(corpus, num_centroids=4, iters=1)
    ivf_write(assigned, cents, path)

    ivf_assign(fresh, cents).write.partitionBy("cid").mode("append").parquet(
        f"{path}/vectors")

    index = ivf_read(spark, path)
    assert index[0].count() == corpus.count() + fresh.count()
    got = ivf_topk(corpus.unionByName(fresh), q, k=5,
                   num_centroids=4, nprobe=4, index=index)
    from feldman_spark.pipeline.similarity import cosine_topk
    want = [(r["vec_id"], r["cosine"])
            for r in cosine_topk(corpus.unionByName(fresh), q, k=5).collect()]
    assert [(r["vec_id"], r["cosine"]) for r in got.collect()] == want
