"""SQL access to the engine's canonical tables.

The reference has no SQL surface; on Spark it comes free once the
canonical DataFrames are registered as views — every Feldman-domain
question is then one ``spark.sql(...)`` away, optimized by the same
Catalyst pipeline as the DataFrame API.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession

__all__ = ["register_views", "bucketed_table"]

CANONICAL_VIEWS = (
    "section_summary", "sparse_splice", "affine", "sit", "measurement")


def register_views(spark: SparkSession, **frames: DataFrame) -> None:
    """Register DataFrames as temp views, e.g.
    ``register_views(spark, section_summary=ss, sit=sit)`` then
    ``spark.sql("SELECT ... FROM sit JOIN section_summary USING (...)")``."""
    for name, df in frames.items():
        df.createOrReplaceTempView(name)


def bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: tuple,
    num_buckets: int = 16,
    sort_cols: Optional[tuple] = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Persist a DataFrame as a bucketed (and optionally sorted) catalog
    table. Two tables bucketed identically on their join key co-locate:
    the join runs with NO exchange on either side — the pre-shuffled
    layout for repeated large-large joins (e.g. measurement ⋈ calibration
    keyed by core at corpus scale).
    """
    spark = df.sparkSession
    if mode == "overwrite":
        # the in-memory catalog forgets tables across sessions while their
        # warehouse directories persist — clear any orphaned location
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        import shutil

        warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
        if warehouse.startswith("file:"):
            warehouse = warehouse[len("file:"):]
        if warehouse:
            shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(name)
    return spark.table(name)
