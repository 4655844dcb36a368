"""E2: splice (export) measurement data — the scalability centerpiece.

The reference loops over SIT intervals, full-scanning the measurement table
per interval, then loops over affine rows full-scanning again for off-splice
rows (``feldman.py:298-382`` — O(intervals × md_rows) + O(cores × md_rows)).

Here the whole export is two broadcast joins over ONE distributed pass of
the measurement table:

* on-splice: measurement ⋈ section-exploded SIT on (Site, Hole, Core,
  Section) equi keys + depth-range residual (J1/J2), SIT side broadcast;
* off-splice: the anti-joined remainder ⋈ broadcast affine (J4);
* rows matching no affine core go to the "unwritten" side output (S7).

At 100 TB the measurement side never shuffles and never hits the driver;
partition the parquet by (Site, Hole) for partition pruning.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .formats.columns import find_all_starts_with
from .ops.windows import section_range
from .splice import IDX

__all__ = ["SpliceExport", "ROW_ID", "export_columns", "splice_export"]

ROW_ID = "_row_id"


@dataclass
class SpliceExport:
    """Result of :func:`splice_export`."""

    spliced: DataFrame            # on-splice (+ off-splice when requested)
    unwritten: Optional[DataFrame]  # off-splice rows matching no affine core


def export_columns(md_columns: List[str]) -> List[str]:
    """Final export column order: measurement columns with
    ``Splice Depth``, ``Offset``, ``On-Splice`` inserted after the last
    column whose name starts with "Sediment Depth" (las-normalized), or at
    the front if none (``feldman.py:385-393``, P4)."""
    cols = [c for c in md_columns if c not in (ROW_ID,)]
    matches = find_all_starts_with("Sediment Depth", cols)
    idx = max(cols.index(m) for m in matches) + 1 if matches else 0
    return cols[:idx] + ["Splice Depth", "Offset", "On-Splice"] + cols[idx:]


def _expand_sit_sections(sit: DataFrame) -> DataFrame:
    """W5: one row per (interval, section). Single-section intervals keep
    their section verbatim; multi-section intervals expand the inclusive
    integer range (``feldman.py:323-327``)."""
    single = F.col("TopSection") == F.col("BottomSection")
    sections = F.when(single, F.array(F.col("TopSection"))).otherwise(
        section_range("TopSection", "BottomSection"))
    return sit.select(
        "Site", "Hole", "Core",
        F.explode(sections).alias("Section"),
        "TopDepthCSF", "TopDepthCCSF", "BottomDepthCSF",
        (F.col("TopDepthCCSF") - F.col("TopDepthCSF")).alias("__offset"),
    )


def splice_export(
    md: DataFrame,
    affine: DataFrame,
    sit: DataFrame,
    depth_column: str,
    include_off_splice: bool = True,
    whole_splice_section: bool = False,
) -> SpliceExport:
    """Export measurement rows with composite depth and on-/off-splice flag.

    ``md`` must carry a unique ``_row_id`` column (added by the loaders) —
    it replaces the reference's positional-index anti-join
    (``feldman.py:346,370``) since Spark rows have no stable index.
    """
    depth = F.col(f"`{depth_column}`")
    out_cols = export_columns(md.columns)
    sit_exp = _expand_sit_sections(sit)

    on_join = md.join(F.broadcast(sit_exp), ["Site", "Hole", "Core", "Section"], "inner")
    if not whole_splice_section:
        on_join = on_join.filter(depth.between(F.col("TopDepthCSF"), F.col("BottomDepthCSF")))

    def finalize(df: DataFrame, offset_col, flag: str) -> DataFrame:
        return df.withColumns({
            "Splice Depth": depth + offset_col,
            "Offset": offset_col,
            "On-Splice": F.lit(flag),
        }).select([F.col(f"`{c}`") for c in out_cols])

    on_rows = finalize(on_join, F.col("__offset"), "splice")

    if not include_off_splice:
        return SpliceExport(spliced=on_rows, unwritten=None)

    matched_ids = on_join.select(ROW_ID).distinct()
    off_md = md.join(matched_ids, ROW_ID, "left_anti")
    aff_offsets = affine.select("Site", "Hole", "Core", F.col("Offset").alias("__offset"))
    off_join = off_md.join(F.broadcast(aff_offsets), ["Site", "Hole", "Core"], "inner")
    off_rows = finalize(off_join, F.col("__offset"), "off-splice")

    unwritten = off_md.join(
        F.broadcast(aff_offsets.select("Site", "Hole", "Core").distinct()),
        ["Site", "Hole", "Core"], "left_anti",
    ).drop(ROW_ID)

    return SpliceExport(spliced=on_rows.unionByName(off_rows), unwritten=unwritten)
