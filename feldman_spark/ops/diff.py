"""Snapshot diff (beyond reference — corpus-version reconciliation).

A training-data pipeline republishes its corpus every crawl; downstream
consumers need "what changed since the version I trained on" without
re-reading either snapshot wholesale. ``table_diff`` classifies every
key as added / removed / changed / unchanged between two snapshots.

Scale shape: JOIN-FREE. Both snapshots union with a side tag (a
plan-level concat — no movement), then ONE aggregate keyed on the diff
key gathers each side's payload as a struct via conditional ``max``
(map-side partial aggregation; a key never has more than two rows, so
state per key is two slim structs). The classic FULL OUTER JOIN form
shuffles both sides too — but builds join hash tables and loses the
partial-aggregate path. Payload comparison is exact struct equality, not
a hash — no collision caveat.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["table_diff"]


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Optional[Sequence[str]] = None,
    status_col: str = "diff_status",
) -> DataFrame:
    """Classify each key across two snapshots: ``added`` (new only),
    ``removed`` (old only), ``changed`` (both, payload differs),
    ``unchanged`` (both, payload equal — null-safe: NULL == NULL).

    ``compare_cols`` defaults to every shared non-key column. Each
    snapshot must be unique per key (it's a snapshot); duplicate keys
    raise downstream of an arbitrary pick, so enforce upstream.
    Returns one row per key: the key columns + ``status_col``.
    """
    ks = list(keys)
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c in set(new.columns) and c not in ks
        ]
    cc = list(compare_cols)
    for side_name, side in (("old", old), ("new", new)):
        missing = [c for c in ks + cc if c not in side.columns]
        if missing:
            raise ValueError(f"{side_name} side is missing columns {missing}")

    def tagged(df: DataFrame, side: int) -> DataFrame:
        return df.select(
            *ks,
            F.struct(*[F.col(c) for c in cc]).alias("_payload"),
            F.lit(side).alias("_side"),
        )

    u = tagged(old, 0).unionByName(tagged(new, 1))
    agg = u.groupBy(*ks).agg(
        F.max(F.when(F.col("_side") == 0, F.col("_payload"))).alias("_o"),
        F.max(F.when(F.col("_side") == 1, F.col("_payload"))).alias("_n"),
    )
    status = (
        F.when(F.col("_o").isNull(), F.lit("added"))
        .when(F.col("_n").isNull(), F.lit("removed"))
        .when(F.col("_o").eqNullSafe(F.col("_n")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return agg.select(*ks, status.alias(status_col))
