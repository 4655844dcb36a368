"""Partitioned parquet layout: partition pruning must show in the plan."""

import pytest
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


def test_zorder_clustered_manifest_pruning(spark, tmp_out):
    from feldman_spark.io.parquet import read_pruned, write_clustered, zorder_key

    df = spark.range(0, 40000).select(
        (F.col("id") % 200).alias("x"),
        (F.col("id") / 200).cast("bigint").alias("y"),
        F.col("id").alias("id"))
    path = f"{tmp_out}/zorder_demo"
    write_clustered(df, path, zorder_key(["x", "y"], bits=8),
                    stats_cols=["x", "y"], num_files=16)

    full = spark.read.parquet(path)
    assert len(full.inputFiles()) == 16

    # a box filter on BOTH interleaved dims opens a small corner of the
    # files — that's the point of the Z-layout vs a single-key sort
    pruned = read_pruned(spark, path, {"x": (10, 20), "y": (10, 20)})
    want = full.filter(F.col("x").between(10, 20) & F.col("y").between(10, 20))
    assert pruned.count() == want.count() > 0
    assert pruned.exceptAll(want).count() == 0
    assert len(pruned.inputFiles()) <= 4

    # each dim alone also prunes (z-interleave keeps both selective)
    for dim in ("x", "y"):
        p1 = read_pruned(spark, path, {dim: (0, 15)})
        assert p1.count() == full.filter(F.col(dim).between(0, 15)).count()
        assert len(p1.inputFiles()) < 16

    # empty intersection short-circuits to an empty frame, schema intact
    none = read_pruned(spark, path, {"x": (500, 600)})
    assert none.count() == 0 and set(none.columns) == {"x", "y", "id"}


def test_zorder_key_validation(spark):
    from feldman_spark.io.parquet import zorder_key

    with pytest.raises(ValueError):
        zorder_key([], bits=8)
    with pytest.raises(ValueError):
        zorder_key(["a", "b"], bits=32)  # 64 bits overflows a signed long


def test_ivf_pq_store_partition_pruning(spark, tmp_out):
    """The PQ code store in its production layout — codes written
    partitionBy(cid) — probes with partition pruning (the cid filter
    lands in PartitionFilters, so non-probed buckets' files are never
    read), and a full probe over the ON-DISK codes equals pq_topk over
    the in-memory codes exactly."""
    from feldman_spark.pipeline.similarity import (ivf_build, ivf_pq_topk,
                                                   pq_encode, pq_topk,
                                                   pq_train)

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    corpus = e.filter(F.col("vec_id") != 0)
    q = e.filter(F.col("vec_id") == 0).first()["embedding"]

    assigned, cents = ivf_build(corpus, num_centroids=4, iters=1)
    books = pq_train(corpus, m=4, k=16, iters=4, sample=2048)
    enc = pq_encode(assigned, books, carry=["cid"])
    path = f"{tmp_out}/ivf_pq_store"
    enc.write.mode("overwrite").partitionBy("cid").parquet(path)
    stored = spark.read.parquet(path)

    pruned = ivf_pq_topk(stored, cents, books, q, k=5, nprobe=1)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "cid" in plan.split("PartitionFilters")[1][:200]

    full_disk = [(r["vec_id"], r["adc_dist"]) for r in
                 ivf_pq_topk(stored, cents, books, q, k=5, nprobe=4).collect()]
    memory = [(r["vec_id"], r["adc_dist"]) for r in
              pq_topk(pq_encode(corpus, books), books, q, k=5).collect()]
    assert full_disk == memory
