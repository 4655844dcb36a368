"""Filter/predicate operators (SURVEY §2.3 F1-F7).

The reference implements these as pandas boolean-mask scans
(``coring/sectionSummary.py:158-177``, ``coring/measurement.py:32-56``);
here they are declarative Column predicates so Catalyst pushes them into
the scan (parquet ``PushedFilters``) and prunes partitions.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "eq_filter",
    "conjunctive_filter",
    "range_filter",
    "in_filter",
    "point_in_interval",
    "valid_section_column",
]


def eq_filter(**eq: object) -> Optional[Column]:
    """F1: conjunctive equality predicate over identity columns, e.g.
    ``eq_filter(Site='1', Hole='A', Core='25')``
    (``coring/sectionSummary.py:158-170``)."""
    pred: Optional[Column] = None
    for name, value in eq.items():
        clause = F.col(f"`{name}`") == F.lit(value)
        pred = clause if pred is None else (pred & clause)
    return pred


def conjunctive_filter(df: DataFrame, **eq: object) -> DataFrame:
    pred = eq_filter(**eq)
    return df if pred is None else df.filter(pred)


def range_filter(df: DataFrame, column: str, lo: float, hi: float) -> DataFrame:
    """F2: inclusive-both-ends depth range (``coring/measurement.py:32-33``)."""
    return df.filter(F.col(f"`{column}`").between(F.lit(lo), F.lit(hi)))


def in_filter(df: DataFrame, column: str, values: Sequence[object]) -> DataFrame:
    """F3: IN-list membership (``coring/measurement.py:43-50``)."""
    return df.filter(F.col(f"`{column}`").isin(list(values)))


def point_in_interval(
    df: DataFrame, depth: float, top_col: str = "TopDepth", bot_col: str = "BottomDepth",
    **eq: object,
) -> DataFrame:
    """F4: rows whose [top, bot] interval contains ``depth``
    (``coring/sectionSummary.py:172-177``)."""
    pred = (F.lit(depth) >= F.col(f"`{top_col}`")) & (F.lit(depth) <= F.col(f"`{bot_col}`"))
    extra = eq_filter(**eq)
    if extra is not None:
        pred = extra & pred
    return df.filter(pred)


def valid_section_column(df: DataFrame, colname: str) -> bool:
    """F7: True iff every value in ``colname`` is an integer string or the
    ``'CC'`` sentinel (``feldman.py:78-89``). One distributed count, no
    collect of the data."""
    col = F.col(f"`{colname}`")
    bad = df.filter(~(col.rlike(r"^-?\d+$") | (col == "CC"))).limit(1).count()
    return bad == 0
