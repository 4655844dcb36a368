"""E1: Sparse Splice → Affine table + Splice Interval Table (SIT).

Pipeline (re-expressing ``feldman.py:96-142,155-291,404-529``):

1. :func:`with_offset_depths` — every per-row ``getOffsetDepth`` point
   lookup of the reference (``feldman.py:181,187``, two per splice row,
   each an O(n) pandas mask scan, ``coring/sectionSummary.py:158-181``)
   becomes ONE broadcast equi-join of the splice against the section
   summary, computing all four needed depths (top/bottom × unscaled/scaled)
   distributively with higher-order-function gap arithmetic.

2. :func:`splice_scan` — the genuinely recursive part (W1): each
   interval's affine shift depends on the previous interval's *shifted*
   bottom (``prevBotCCSF = shiftBot + affine``), so it cannot be a
   fixed-frame window function. The enriched splice table is tiny (≤
   hundreds of rows, ``BASELINE.md``), so the scan runs in a single
   ``applyInPandas`` group; everything expensive stays distributed.

3. :func:`off_splice_affines` — off-splice cores get shifts via the
   manual-correlation join (J6) or the nearest-top join (J7), replacing the
   reference's per-core linear search (``coring/sectionSummary.py:88-100``).

4. :func:`fill_affine` — differential offset (lag, W2) and expanding
   regression slope (``regr_slope``, W3/A6) per hole.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType, DoubleType, LongType, StringType, StructField, StructType,
)

from .ops.gaps import gap_above, parse_gaps
from .ops.joins import broadcast_equi_join, nearest_join
from .ops.windows import expanding_slope, lag_diff

__all__ = [
    "IDX",
    "section_lookup",
    "with_offset_depths",
    "splice_scan",
    "sit_from_scan",
    "on_splice_affines",
    "off_splice_affines",
    "fill_affine",
    "AFFINE_OUT_COLUMNS",
]

IDX = "_idx"  # stable input-order column carried by loaders

AFFINE_OUT_COLUMNS = [
    "Site", "Hole", "Core", "Tool", "DepthCSF", "DepthCCSF", "Offset",
    "DifferentialOffset", "GrowthRate", "ShiftType", "FixedCore",
    "FixedTieCSF", "ShiftedTieCSF", "DataUsed", "Comment",
]


def _core_int() -> Column:
    return F.col("Core").cast("int")


def section_lookup(secsumm: DataFrame) -> DataFrame:
    """Per-(Site,Hole,Core,Section) lookup table with depths pre-rounded to
    3 places — the reference rounds at every lookup
    (``coring/sectionSummary.py:105-123``) — and gaps pre-parsed."""
    return secsumm.select(
        "Site", "Hole", "Core", "Section",
        F.bround("TopDepth", 3).alias("SecTop"),
        F.bround("BottomDepth", 3).alias("SecBot"),
        F.bround("TopDepthScaled", 3).alias("SecTopScaled"),
        F.bround("BottomDepthScaled", 3).alias("SecBotScaled"),
        F.bround("CuratedLength", 3).alias("Curated"),
        parse_gaps(F.col("Gaps")).alias("GapsParsed")
        if "Gaps" in secsumm.columns
        else F.array().cast("array<struct<top:double,bot:double>>").alias("GapsParsed"),
    )


def _offset_depth(offset_cm: Column, scaled: bool) -> Column:
    """``getOffsetDepth`` as a column expression (``feldman.py:52-74``,
    ``coring/sectionSummary.py:53-75``): section top + offset (cm→m) −
    total gap length above the offset; in scaled mode, depths whose curated
    length exceeds the drilled length are compressed to the drilled
    interval (the curated/drilled comparison keeps the reference's mixed
    m-vs-cm units for exact parity, ``coring/sectionSummary.py:67-73``)."""
    top = F.col("SecTopScaled") if scaled else F.col("SecTop")
    bot = F.col("SecBotScaled") if scaled else F.col("SecBot")
    depth = top + offset_cm / 100.0 - gap_above(F.col("GapsParsed"), offset_cm) / 100.0
    if scaled:
        drilled_cm = (bot - top) * 100.0
        compressed = top + (offset_cm / 100.0) * (drilled_cm / F.col("Curated"))
        depth = F.when(F.col("Curated") > drilled_cm, compressed).otherwise(depth)
    return depth


def with_offset_depths(sparse: DataFrame, lookup: DataFrame) -> DataFrame:
    """J8 batched: attach ShiftTop/ShiftBot (unscaled and scaled) to every
    splice row with two broadcast equi-joins — replacing 4 point lookups ×
    N splice rows of the reference (``feldman.py:181-187,211-213``)."""
    out = sparse
    for role, sec_col, off_col in (
        ("Top", "TopSection", "TopOffset"),
        ("Bot", "BottomSection", "BottomOffset"),
    ):
        look = lookup.withColumnRenamed("Section", sec_col)
        joined = broadcast_equi_join(
            out, look, on=["Site", "Hole", "Core", sec_col], how="left")
        off = F.col(off_col)
        out = joined.withColumns({
            f"Shift{role}": _offset_depth(off, scaled=False),
            f"Shift{role}Scaled": _offset_depth(off, scaled=True),
        }).drop("SecTop", "SecBot", "SecTopScaled", "SecBotScaled", "Curated", "GapsParsed")
    return out


def _scan_schema(enriched: DataFrame) -> StructType:
    fields = list(enriched.schema.fields)
    extra = [
        StructField("TopDepthCSF", DoubleType()),
        StructField("TopDepthCCSF", DoubleType()),
        StructField("BottomDepthCSF", DoubleType()),
        StructField("BottomDepthCCSF", DoubleType()),
        StructField("_affine", DoubleType()),
        StructField("_newCore", BooleanType()),
        StructField("_shiftType", StringType()),
        StructField("_fixedCore", StringType()),
        StructField("_fixedTieCsf", DoubleType()),
        StructField("_shiftedTieCsf", DoubleType()),
    ]
    return StructType(fields + extra)


def _splice_shift_to_affine(sptype: Optional[str], gap: Optional[float]) -> str:
    # feldman.py:284-291: TIE→TIE, APPEND-with-user-gap→SET, else REL.
    if sptype == "TIE":
        return "TIE"
    if sptype == "APPEND" and gap is not None:
        return "SET"
    return "REL"


def _scan_group(
    pdf: pd.DataFrame,
    use_scaled_depths: bool,
    lazy_append: bool,
    splice_start_depth: Optional[float],
) -> pd.DataFrame:
    """The recursive interval scan (``feldman.py:155-269``), on the tiny
    pre-enriched splice table. State carried row to row: previous affine,
    previous shifted bottom (CCSF), previous row's splice type and gap."""
    pdf = pdf.sort_values(IDX).reset_index(drop=True)
    n = len(pdf)
    top_csf = np.empty(n); top_ccsf = np.empty(n)
    bot_csf = np.empty(n); bot_ccsf = np.empty(n)
    affines = np.empty(n)
    new_core = np.zeros(n, dtype=bool)
    shift_types: List[str] = []
    fixed_cores: List[str] = []
    fixed_tie = np.full(n, np.nan)
    shifted_tie = np.full(n, np.nan)

    seen = set()
    prev_affine = 0.0
    prev_bot_ccsf: Optional[float] = None
    prev: Optional[pd.Series] = None
    sptype: Optional[str] = None
    gap: Optional[float] = None

    top_col = "ShiftTopScaled" if use_scaled_depths else "ShiftTop"
    bot_col = "ShiftBotScaled" if use_scaled_depths else "ShiftBot"

    for i in range(n):
        row = pdf.iloc[i]
        shift_top = row[top_col]
        shift_bot = row[bot_col]
        if pd.isna(shift_top) or pd.isna(shift_bot):
            raise ValueError(
                "Section summary lookup failed for splice interval {} "
                "({}{}-{} sections {}..{})".format(
                    i + 1, row["Site"], row["Hole"], row["Core"],
                    row["TopSection"], row["BottomSection"]))
        if shift_top >= shift_bot:
            raise ValueError(
                "Interval is inverted or zero-length: computed top depth "
                "{} >= computed bottom depth {}".format(shift_top, shift_bot))

        affine = 0.0
        if sptype is None and i == 0:
            if splice_start_depth is not None:
                affine = splice_start_depth - shift_top
        elif sptype == "APPEND":
            if gap is not None:
                affine = (prev_bot_ccsf + gap) - shift_top
            elif row["Hole"] == prev["Hole"] or lazy_append:
                affine = prev_affine
            else:
                # inter-hole APPEND preserves the scaled (CSF-B) gap
                # (feldman.py:210-218)
                scaled_gap = row["ShiftTopScaled"] - prev["_prevBotScaled"]
                affine = (prev_bot_ccsf - shift_top) + scaled_gap
        elif sptype == "TIE":
            affine = prev_bot_ccsf - shift_top
        else:
            raise ValueError("Encountered unknown splice type {}".format(sptype))

        # overlap repair for APPEND (feldman.py:227-233)
        if prev_bot_ccsf is not None and prev_bot_ccsf > shift_top + affine:
            if sptype == "APPEND":
                affine += prev_bot_ccsf - (shift_top + affine)

        coreid = "{}{}-{}".format(row["Site"], row["Hole"], row["Core"])
        if coreid not in seen:
            seen.add(coreid)
            new_core[i] = True
            shift_types.append(_splice_shift_to_affine(sptype, gap))
            if sptype == "TIE":
                fixed_cores.append(str(prev["Hole"]) + str(prev["Core"]))
                fixed_tie[i] = bot_csf[i - 1]
                shifted_tie[i] = shift_top
            else:
                fixed_cores.append("")
        else:
            shift_types.append("")
            fixed_cores.append("")

        top_csf[i] = shift_top
        top_ccsf[i] = shift_top + affine
        bot_csf[i] = shift_bot
        bot_ccsf[i] = shift_bot + affine
        affines[i] = affine

        prev_bot_ccsf = shift_bot + affine
        prev_affine = affine
        prev = row.copy()
        prev["_prevBotScaled"] = row["ShiftBotScaled"]
        sptype = str(row["SpliceType"]).upper()
        gap = None if pd.isna(row["Gap"]) else float(row["Gap"])

    out = pdf.copy()
    out["TopDepthCSF"] = top_csf
    out["TopDepthCCSF"] = top_ccsf
    out["BottomDepthCSF"] = bot_csf
    out["BottomDepthCCSF"] = bot_ccsf
    out["_affine"] = affines
    out["_newCore"] = new_core
    out["_shiftType"] = shift_types
    out["_fixedCore"] = fixed_cores
    out["_fixedTieCsf"] = fixed_tie
    out["_shiftedTieCsf"] = shifted_tie
    return out


def splice_scan(
    enriched: DataFrame,
    use_scaled_depths: bool = False,
    lazy_append: bool = False,
    splice_start_depth: Optional[float] = None,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """W1: run the recursive scan. With ``group_cols`` empty the whole
    splice is one ordered group (the reference's semantics — a splice is a
    single ordered document); pass e.g. ``["Site"]`` to scan many
    independent splices in parallel, one group per key.

    Execution note: ``groupBy + applyInPandas`` beats a tempting
    ``coalesce(1).mapInPandas`` formulation 4-5× here — coalesce collapses
    the *upstream* enrichment joins into one task, while the tiny grouped
    shuffle keeps them parallel."""
    schema = _scan_schema(enriched)

    def apply_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _scan_group(pdf, use_scaled_depths, lazy_append, splice_start_depth)

    if group_cols:
        grouped = enriched.groupBy(*[F.col(c) for c in group_cols])
    else:
        # single ordered group: a splice is one ordered document
        # (a plain integer literal would be read as a group-by ordinal)
        grouped = enriched.groupBy(F.lit("all").alias("_g"))
    return grouped.applyInPandas(apply_fn, schema=schema)


def sit_from_scan(scanned: DataFrame, sparse_columns: Sequence[str]) -> DataFrame:
    """Project the scan output to SIT column order: sparse columns with the
    four computed depth columns inserted at positions 6 and 10
    (``feldman.py:271-273`` — positional insert is a final ``select`` in
    Spark, SURVEY §2.2 P4)."""
    cols = [c for c in sparse_columns if c != IDX]
    out = (
        cols[:6]
        + ["TopDepthCSF", "TopDepthCCSF"]
        + cols[6:8]
        + ["BottomDepthCSF", "BottomDepthCCSF"]
        + cols[8:]
    )
    return scanned.orderBy(IDX).select([F.col(f"`{c}`") for c in out])


def on_splice_affines(scanned: DataFrame, core_tops: DataFrame) -> DataFrame:
    """One affine row per first-seen core in splice order
    (``feldman.py:236-248``), depths anchored at the core's top —
    ``getCoreTop`` = section '1' top (``coring/sectionSummary.py:102-103``)
    supplied via broadcast join against ``core_tops``."""
    rows = scanned.filter(F.col("_newCore"))
    rows = broadcast_equi_join(rows, core_tops, on=["Site", "Hole", "Core"], how="left")
    return rows.select(
        "Site", "Hole", "Core", "Tool",
        F.col("CoreTop").alias("DepthCSF"),
        (F.col("CoreTop") + F.col("_affine")).alias("DepthCCSF"),
        F.col("_affine").alias("Offset"),
        F.col("_shiftType").alias("ShiftType"),
        F.col("_fixedCore").alias("FixedCore"),
        F.col("_fixedTieCsf").alias("FixedTieCSF"),
        F.col("_shiftedTieCsf").alias("ShiftedTieCSF"),
        F.lit("").alias("DataUsed"),
        F.lit("splice").alias("Comment"),
        F.col(IDX).alias(IDX),
    )


def core_top_lookup(secsumm: DataFrame) -> DataFrame:
    """(Site,Hole,Core) → rounded top depth of section '1'
    (``coring/sectionSummary.py:102-107``)."""
    return (
        secsumm.filter(F.col("Section") == "1")
        .select("Site", "Hole", "Core", F.bround("TopDepth", 3).alias("CoreTop"))
    )


def sit_core_offsets(sit: DataFrame) -> DataFrame:
    """(Site,Hole,Core) → first SIT row's ``TopDepthCCSF − TopDepthCSF``
    (``coring/spliceInterval.py:73-77`` ``getCoreOffset`` takes the first
    matching row). The SIT must carry ``_idx`` (file/splice order)."""
    w = Window.partitionBy("Site", "Hole", "Core").orderBy(IDX)
    return (
        sit.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "Site", "Hole", "Core",
            (F.col("TopDepthCCSF") - F.col("TopDepthCSF")).alias("SitOffset"),
        )
    )


def off_splice_affines(
    sit: DataFrame,
    secsumm: DataFrame,
    manual_correlation: Optional[DataFrame] = None,
    manual_offsets: Optional[DataFrame] = None,
) -> DataFrame:
    """Affine shifts for cores absent from the splice
    (``feldman.py:404-497``). Precedence per core:

    1. manual correlation TIE whose on-splice core is actually in the SIT
       (offset aligns the two correlation points in composite depth);
    2. manual SET offset;
    3. default: the SIT offset of the on-splice core with the nearest
       section-'1' top depth (J7; first-in-file order wins ties, matching
       the reference's strict ``<`` scan, ``coring/sectionSummary.py:92-98``).
    """
    cores = secsumm.filter(F.col("Section") == "1").select(
        "Site", "Hole", "Core", "Tool", "TopDepth", F.col(IDX))
    sit_keys = sit.select("Site", "Hole", "Core").distinct()
    on_cores = cores.join(F.broadcast(sit_keys), ["Site", "Hole", "Core"], "left_semi")
    off_cores = cores.join(F.broadcast(sit_keys), ["Site", "Hole", "Core"], "left_anti")

    offsets = sit_core_offsets(sit)
    lookup = section_lookup(secsumm)

    # --- default method: nearest on-splice core top (J7 + A4) ------------
    on_with_offsets = broadcast_equi_join(
        on_cores.select("Site", "Hole", "Core", "TopDepth", IDX),
        offsets, on=["Site", "Hole", "Core"], how="left")
    # search key: the off-splice core's *rounded* section-'1' top
    # (getSectionTop rounds, candidate TopDepth is raw — feldman parity)
    off_search = off_cores.withColumn("SearchTop", F.bround("TopDepth", 3))
    nearest = nearest_join(
        off_search,
        on_with_offsets.select("Site", "Hole", "Core", "TopDepth", "SitOffset", IDX),
        left_value="SearchTop",
        right_value="TopDepth",
        left_keys=["Site", "Hole", "Core"],
        partition_on=(),  # reference searches across ALL on-splice cores
        tie_break=[IDX],
        exclude_self_on=["Site", "Hole", "Core"],
    )
    default_offsets = nearest.select(
        "Site", "Hole", "Core", "Tool", "TopDepth", IDX,
        F.col("SitOffset_near").alias("DefaultOffset"),
    )

    result = default_offsets.withColumns({
        "Offset": F.col("DefaultOffset"),
        "ShiftType": F.lit("REL"),
        "FixedCore": F.lit(""),
        "FixedTieCSF": F.lit(None).cast("double"),
        "ShiftedTieCSF": F.lit(None).cast("double"),
    })

    # --- manual SET offsets (ManualOffsetTable, feldman.py:478-481) ------
    if manual_offsets is not None:
        mo = manual_offsets.select(
            "Site", "Hole", "Core", F.col("Offset").alias("ManualOffset"))
        result = broadcast_equi_join(result, mo, on=["Site", "Hole", "Core"], how="left")
        result = result.withColumns({
            "ShiftType": F.when(F.col("ManualOffset").isNotNull(), F.lit("SET"))
                          .otherwise(F.col("ShiftType")),
            "Offset": F.coalesce("ManualOffset", "Offset"),
        }).drop("ManualOffset")

    # --- manual correlation TIEs (ManualCorrelationTable, feldman.py:452-474)
    if manual_correlation is not None:
        mc = manual_correlation
        # getOffsetDepth for both correlation points (unscaled)
        look1 = lookup.select(
            F.col("Site").alias("Site1"), F.col("Hole").alias("Hole1"),
            F.col("Core").alias("Core1"), F.col("Section").alias("Section1"),
            "SecTop", "GapsParsed")
        mc = F.broadcast(mc).join(F.broadcast(look1),
                                  ["Site1", "Hole1", "Core1", "Section1"], "left")
        mc = mc.withColumn(
            "OffSpliceMbsf",
            F.col("SecTop") + F.col("SectionDepth1") / 100.0
            - gap_above(F.col("GapsParsed"), F.col("SectionDepth1")) / 100.0,
        ).drop("SecTop", "GapsParsed")
        look2 = lookup.select(
            F.col("Site").alias("Site2"), F.col("Hole").alias("Hole2"),
            F.col("Core").alias("Core2"), F.col("Section").alias("Section2"),
            "SecTop", "GapsParsed")
        mc = mc.join(F.broadcast(look2), ["Site2", "Hole2", "Core2", "Section2"], "left")
        mc = mc.withColumn(
            "OnSpliceMbsf",
            F.col("SecTop") + F.col("SectionDepth2") / 100.0
            - gap_above(F.col("GapsParsed"), F.col("SectionDepth2")) / 100.0,
        ).drop("SecTop", "GapsParsed")
        # on-splice core must actually be in the SIT (feldman.py:455,475-477)
        sit_offsets2 = offsets.select(
            F.col("Site").alias("Site2"), F.col("Hole").alias("Hole2"),
            F.col("Core").alias("Core2"), F.col("SitOffset"))
        mc = mc.join(F.broadcast(sit_offsets2), ["Site2", "Hole2", "Core2"], "inner")
        ties = mc.select(
            F.col("Site1").alias("Site"), F.col("Hole1").alias("Hole"),
            F.col("Core1").alias("Core"),
            (F.col("OnSpliceMbsf") + F.col("SitOffset") - F.col("OffSpliceMbsf"))
            .alias("TieOffset"),
            F.concat(F.col("Hole2"), F.col("Core2")).alias("TieFixedCore"),
            F.col("OnSpliceMbsf").alias("TieFixedCSF"),
            F.col("OffSpliceMbsf").alias("TieShiftedCSF"),
        )
        # first correlation per core wins; later ones ignored (feldman.py:438-442)
        ties = ties.groupBy("Site", "Hole", "Core").agg(
            F.first("TieOffset").alias("TieOffset"),
            F.first("TieFixedCore").alias("TieFixedCore"),
            F.first("TieFixedCSF").alias("TieFixedCSF"),
            F.first("TieShiftedCSF").alias("TieShiftedCSF"),
        )
        result = broadcast_equi_join(result, ties, on=["Site", "Hole", "Core"], how="left")
        has_tie = F.col("TieOffset").isNotNull()
        result = result.withColumns({
            "Offset": F.when(has_tie, F.col("TieOffset")).otherwise(F.col("Offset")),
            "ShiftType": F.when(has_tie, F.lit("TIE")).otherwise(F.col("ShiftType")),
            "FixedCore": F.when(has_tie, F.col("TieFixedCore")).otherwise(F.col("FixedCore")),
            "FixedTieCSF": F.when(has_tie, F.col("TieFixedCSF")).otherwise(F.col("FixedTieCSF")),
            "ShiftedTieCSF": F.when(has_tie, F.col("TieShiftedCSF")).otherwise(F.col("ShiftedTieCSF")),
        }).drop("TieOffset", "TieFixedCore", "TieFixedCSF", "TieShiftedCSF")

    core_top = F.bround("TopDepth", 3)
    return result.select(
        "Site", "Hole", "Core", "Tool",
        core_top.alias("DepthCSF"),
        (core_top + F.col("Offset")).alias("DepthCCSF"),
        "Offset", "ShiftType", "FixedCore", "FixedTieCSF", "ShiftedTieCSF",
        F.lit("").alias("DataUsed"),
        F.lit("off-splice").alias("Comment"),
        F.col(IDX),
    )


def fill_affine(affine_rows: DataFrame) -> DataFrame:
    """Sort by (Site, Hole, int(Core)) and fill DifferentialOffset (W2 lag)
    and GrowthRate (W3 expanding ``regr_slope``) — ``feldman.py:500-529``.

    Reference parity note: the reference groups by **hole letter alone**,
    across sites (``feldman.py:503-505``: ``holes = set(r.hole ...)``), so
    the windows below partition by Hole only, ordered by the global sort key.
    """
    order = [F.col("Site").asc(), F.col("Hole").asc(), _core_int().asc()]
    out = lag_diff(affine_rows, "Offset", partition_by=["Hole"],
                   order_by=order, out="DifferentialOffset")
    out = expanding_slope(out, x="DepthCSF", y="DepthCCSF", partition_by=["Hole"],
                          order_by=order, out="GrowthRate", digits=3)
    return out.orderBy("Site", "Hole", _core_int()).select(AFFINE_OUT_COLUMNS)
