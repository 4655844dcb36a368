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
