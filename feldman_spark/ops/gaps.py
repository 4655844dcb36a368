"""Gap parsing and gap arithmetic (SURVEY §2.9 C7, §2.5 A5).

A section's ``Gaps`` column is a string of 0+ space-separated ``top-bot``
cm pairs, e.g. ``"0.0-0.5 94.5-96.0"`` (``doc/manual.markdown:67-70``).
The reference parses it per lookup (``coring/sectionSummary.py:132-150``);
here it is parsed once at load into the engine's only nested type,
``array<struct<top:double, bot:double>>``, and the conditional sum is a
higher-order function — everything stays JVM-side, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["parse_gaps", "with_parsed_gaps", "gap_above", "merge_gap_columns"]

GAPS_SCHEMA = "array<struct<top:double,bot:double>>"


def parse_gaps(col: Column) -> Column:
    """C7: ``"10-20 30-40"`` → ``[{10.0,20.0},{30.0,40.0}]``; empty/null →
    empty array (``coring/sectionSummary.py:132-140``)."""
    pairs = F.split(F.trim(col), r"\s+")
    parsed = F.transform(
        pairs,
        lambda p: F.struct(
            F.split(p, "-").getItem(0).cast("double").alias("top"),
            F.split(p, "-").getItem(1).cast("double").alias("bot"),
        ),
    )
    empty = F.array().cast(GAPS_SCHEMA)
    return F.when(col.isNull() | (F.trim(col) == ""), empty).otherwise(parsed)


def with_parsed_gaps(df: DataFrame, gaps_col: str = "Gaps", out: str = "GapsParsed") -> DataFrame:
    return df.withColumn(out, parse_gaps(F.col(f"`{gaps_col}`")))


def gap_above(gaps: Column, section_depth_cm: Column) -> Column:
    """A5: total gap length (cm) above a section depth — Σ (bot−top) over
    gaps whose top is strictly above the depth
    (``coring/sectionSummary.py:145-150``: ``sectionDepth > gap.top``)."""
    return F.aggregate(
        F.filter(gaps, lambda g: section_depth_cm > g["top"]),
        F.lit(0.0),
        lambda acc, g: acc + (g["bot"] - g["top"]),
    )


def merge_gap_columns(df: DataFrame, max_gap_cols: int, out: str = "Gaps") -> DataFrame:
    """P11: LacCore-DB wide gap columns (``Gap 1 T``, ``Gap 1 B``, …) →
    a single ``"t-b t-b"`` string column
    (``coring/sectionSummary.py:190-203`` ``convertSSGapColumnsToSingle``)."""
    pieces = []
    for i in range(1, max_gap_cols + 1):
        t = F.col(f"`Gap {i} T`")
        b = F.col(f"`Gap {i} B`")
        pieces.append(
            F.when(
                t.isNotNull() & b.isNotNull(),
                F.concat(t.cast("string"), F.lit("-"), b.cast("string")),
            )
        )
    merged = F.concat_ws(" ", F.filter(F.array(*pieces), lambda p: p.isNotNull()))
    return df.withColumn(out, merged)
