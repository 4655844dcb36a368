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

__all__ = ["write_measurement_parquet", "read_measurement_parquet",
           "zorder_key", "write_clustered", "read_pruned"]


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


def zorder_key(cols: Sequence[str], bits: int = 16) -> "Column":
    """Morton (Z-order) key: interleave the low ``bits`` bits of each
    column (beyond reference — multi-dimensional data clustering).

    A table sorted by ONE key prunes scans on that key only; sorted by
    the Z-key, file/row-group min-max ranges stay tight on EVERY
    interleaved dimension at once, so :func:`read_pruned` (and parquet's
    own row-group skipping) cuts the scan for a filter on any of them.
    Callers pre-scale values onto [0, 2^bits) — ranks, bucket ids, or
    truncated ints; the key masks inputs to ``bits`` to keep the
    interleave total. Pure codegen bit arithmetic, zero shuffles.
    """
    from pyspark.sql import functions as F

    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if bits * len(cols) > 63:
        raise ValueError(f"{len(cols)} cols x {bits} bits overflows a signed long")
    key = F.lit(0).cast("bigint")
    n = len(cols)
    for ci, c in enumerate(cols):
        v = F.col(c).cast("bigint").bitwiseAND(F.lit((1 << bits) - 1))
        for b in range(bits):
            bit = F.shiftright(v, b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * n + ci))
    return key


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_key,
    stats_cols: Sequence[str],
    num_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Cluster-sorted parquet layout with a file-level min/max manifest —
    Delta/Iceberg-style DATA SKIPPING on plain parquet (beyond
    reference). Rows are range-partitioned and sorted by ``cluster_key``
    (a column name or Column — e.g. :func:`zorder_key` for
    multi-dimensional locality), so each output file owns a narrow key
    range; a manifest of per-file min/max for ``stats_cols`` is then
    computed in ONE aggregate pass over the written files and stored at
    ``<path>/_manifest``.

    Scale shape: the write is one range shuffle (sampled boundaries keep
    files even under skew); the manifest pass reads back only the stats
    columns (column pruning) and aggregates to num_files rows. At 100 TB
    the manifest is what turns a selective query from "open every file's
    footer" into "open the handful that can match" — file listing +
    footer reads are the scan bottleneck long before bytes are.
    """
    from pyspark.sql import functions as F

    key = F.col(cluster_key) if isinstance(cluster_key, str) else cluster_key
    staged = df.withColumn("_ck", key)
    (
        staged.repartitionByRange(num_files, F.col("_ck"))
        .sortWithinPartitions("_ck")
        .drop("_ck")
        .write.mode(mode)
        .parquet(path)
    )
    spark = df.sparkSession
    back = spark.read.parquet(path).select(
        F.input_file_name().alias("file"),
        *[F.col(c) for c in stats_cols],
    )
    aggs = []
    for c in stats_cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    back.groupBy("file").agg(*aggs).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/_manifest"
    )


def read_pruned(
    spark: SparkSession,
    path: str,
    ranges: dict,
) -> DataFrame:
    """Manifest-pruned read of a :func:`write_clustered` table:
    ``ranges`` maps column → (lo, hi) inclusive bounds; files whose
    manifest [min, max] cannot intersect every requested range are never
    opened. The residual filter is still applied, so the result is
    EXACTLY the filtered full scan — the manifest only removes I/O.

    The manifest is num_files rows and collects driver-side (file lists
    are driver-sized by definition — the same contract as any catalog).
    """
    from pyspark.sql import functions as F

    mf = spark.read.parquet(f"{path}/_manifest")
    cond = F.lit(True)
    residual = F.lit(True)
    for c, (lo, hi) in ranges.items():
        cond = cond & (F.col(f"max_{c}") >= F.lit(lo)) & (F.col(f"min_{c}") <= F.lit(hi))
        residual = residual & F.col(c).between(F.lit(lo), F.lit(hi))
    files = [r["file"] for r in mf.filter(cond).select("file").collect()]
    if not files:
        return spark.read.parquet(path).filter(residual).limit(0)
    return spark.read.parquet(*files).filter(residual)
