"""One-pass table profiling: per-column null counts, cardinality, and
value range — the data-quality "analyze" step of a pipeline.

Beyond-reference capability. The whole profile is ONE aggregation pass
regardless of column count (every statistic is an aggregate expression in
the same `agg`), then a row-per-column unpivot of the single result row —
so profiling a 100 TB table costs one scan, and approximate cardinality
(HyperLogLog++ via ``approx_count_distinct``) keeps the state per column
constant. ``exact=True`` switches to exact distinct counts (one expanding
aggregate per column — fine at oracle scale, expensive at corpus scale).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_table"]


def profile_table(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
    exact: bool = False,
) -> DataFrame:
    """Profile ``columns`` (default: all) into a long-format DataFrame
    ``(column, n_rows, n_nulls, n_distinct, min_value, max_value)`` —
    min/max rendered as strings so one schema serves every column type."""
    cols = list(columns) if columns is not None else df.columns
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        col = F.col(f"`{c}`")
        aggs.append(F.count(F.when(col.isNull(), 1)).alias(f"_nulls_{c}"))
        distinct = F.count_distinct(col) if exact else F.approx_count_distinct(col)
        aggs.append(distinct.alias(f"_dist_{c}"))
        aggs.append(F.min(col).cast("string").alias(f"_min_{c}"))
        aggs.append(F.max(col).cast("string").alias(f"_max_{c}"))
    wide = df.agg(*aggs)

    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("_n").alias("n_rows"),
            F.col(f"`_nulls_{c}`").alias("n_nulls"),
            F.col(f"`_dist_{c}`").alias("n_distinct"),
            F.col(f"`_min_{c}`").alias("min_value"),
            F.col(f"`_max_{c}`").alias("max_value"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*per_col)).alias("s")).select("s.*")
