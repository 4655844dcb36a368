"""CDC merge / upsert (beyond reference — the MERGE INTO of incremental
pipelines).

The reference recomputes every artifact from scratch on each run
(``feldman.py`` has no incremental path at all); a 100 TB corpus cannot.
``merge_upsert`` applies a change batch (upserts + deletes, ordered by a
sequence column) to a snapshot and yields the next snapshot — the core of
Delta/Hudi/Iceberg's MERGE, expressed on plain DataFrames.

Scale shape: JOIN-FREE. Snapshot and changes union (a plan-level concat,
no movement), then ONE aggregate keyed on the merge key picks the winner
via ``max_by`` over a (is-change, seq) priority struct — so the reduction
partial-aggregates map-side and a hot key (one entity churning millions of
times in a batch) collapses before the exchange instead of funnelling
through a single reducer the way the obvious ``row_number`` window would.
Total movement: one slim shuffle of (key, payload-struct) rows.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["merge_upsert"]


def merge_upsert(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "delete",
) -> DataFrame:
    """Apply a CDC change batch to a snapshot; return the new snapshot.

    ``snapshot`` holds at most one row per key (its current state).
    ``changes`` carries the snapshot's columns plus ``seq_col`` (a
    totally-ordered version — event id, LSN, commit timestamp; (key,
    seq) must be unique) and ``op_col`` (``delete_op`` removes the key,
    anything else upserts). Semantics match SQL MERGE replayed in
    sequence order: the highest-seq change per key wins; a key with no
    change carries its snapshot row forward; a winning delete drops the
    key entirely.

    Any change outranks the snapshot row (priority 1 vs 0), so the
    snapshot needs no sequence of its own — its ``seq_col`` rides along
    as a typed null that the priority field makes unreachable.
    """
    if op_col not in changes.columns:
        raise ValueError(f"changes is missing op column {op_col!r}")
    if seq_col not in changes.columns:
        raise ValueError(f"changes is missing sequence column {seq_col!r}")
    payload_cols = [c for c in snapshot.columns]
    missing = [c for c in payload_cols if c not in changes.columns]
    if missing:
        raise ValueError(f"changes is missing snapshot columns {missing}")
    seq_type = changes.schema[seq_col].dataType

    snap = snapshot.select(
        *payload_cols,
        F.lit(None).cast(seq_type).alias(seq_col),
        F.lit("upsert").alias(op_col),
        F.lit(0).alias("_pri"),
    )
    chg = changes.select(
        *payload_cols,
        F.col(seq_col),
        F.col(op_col).cast("string").alias(op_col),
        F.lit(1).alias("_pri"),
    )
    value_cols = [c for c in payload_cols if c not in keys]
    unioned = snap.unionByName(chg)
    # max_by over the (priority, seq) struct: changes beat the snapshot,
    # later changes beat earlier ones. Partial-aggregates map-side.
    winner = unioned.groupBy(*[F.col(k) for k in keys]).agg(
        F.max_by(
            F.struct(*[F.col(c) for c in value_cols], F.col(op_col).alias("_op")),
            F.struct(F.col("_pri"), F.col(seq_col)),
        ).alias("_w")
    )
    out = winner.filter(F.col("_w._op") != F.lit(delete_op)).select(
        *keys, *[F.col(f"_w.{c}").alias(c) for c in value_cols]
    )
    return out
