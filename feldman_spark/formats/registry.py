"""Format registry: every tabular format the reference understands.

Mirrors the per-domain format declarations spread across the reference
(``coring/columns.py:10-31``, ``coring/sectionSummary.py:18-26``,
``coring/sparseSplice.py:16-20``, ``coring/affine.py:17-34``,
``coring/spliceInterval.py:15-26``, ``coring/measurement.py:16-18``,
``coring/manualCorrelation.py:18-36``) as one metadata module.

Identity columns (Site, Hole, Core, Section…) are deliberately STRING even
when they look numeric — the reference filters with string equality
(``coring/measurement.py:61-69``) and sections may be ``'CC'``.
"""

from __future__ import annotations

from typing import Dict, List

from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from .columns import ColumnIdentity, TabularDatatype, TabularFormat

NUMERIC = TabularDatatype.NUMERIC

# --- core identity vocabulary (coring/columns.py:10-27) ---------------------

_IDENTITY: Dict[str, ColumnIdentity] = {
    "Project": ColumnIdentity(
        "Project", ["Exp", "Name", "Expedition", "Proj", "Cruise"],
        desc="Project, expedition, cruise or other high-level identifier"),
    "Site": ColumnIdentity("Site", ["Location"], desc="Location of core collection"),
    "Hole": ColumnIdentity("Hole", ["Track"], desc="Penetration from which cores are collected"),
    "Core": ColumnIdentity("Core", ["Drive"], desc="Material collected in a single drive"),
    "Tool": ColumnIdentity(
        "Tool", ["Core Type", "Type"],
        org_names={"IODP": "Core type", "LacCore": "Tool"},
        desc="Identifier of tool used to collect a core"),
    "Section": ColumnIdentity("Section", desc="Subdivision of core performed post-extraction"),
    "TopSection": ColumnIdentity("TopSection", desc="Top section of an interval"),
    "BottomSection": ColumnIdentity("BottomSection", desc="Bottom section of an interval"),
    "TopOffset": ColumnIdentity(
        "TopOffset", desc="Section depth at the top of an interval", datatype=NUMERIC, unit="cm"),
    "BottomOffset": ColumnIdentity(
        "BottomOffset", desc="Section depth at the bottom of an interval", datatype=NUMERIC, unit="cm"),
    "Comment": ColumnIdentity(
        "Comment", ["Quality Comment", "Quality Comments", "Comments", "Notes", "Remarks"],
        org_names={"IODP": "Quality comment"}, desc="Comments", optional=True),
    "DataUsed": ColumnIdentity(
        "DataUsed", ["Data"], org_names={"IODP": "Data used"},
        desc="Datatype used to determine e.g. a tie point", optional=True),
}


def identity(name: str) -> ColumnIdentity:
    return _IDENTITY[name]


def identities(names: List[str]) -> List[ColumnIdentity]:
    return [_IDENTITY[n] for n in names]


CORE_IDENTITY_COLS = identities(["Site", "Hole", "Core", "Tool"])
SECTION_IDENTITY_COLS = identities(["Site", "Hole", "Core", "Tool", "Section"])

# --- Section Summary (coring/sectionSummary.py:18-26) -----------------------

SECTION_SUMMARY_FORMAT = TabularFormat("Section Summary", SECTION_IDENTITY_COLS + [
    ColumnIdentity("TopDepth", ["TopDepthUnscaled", "Top Depth CSF-A"],
                   desc="Top drilled depth of a core (CSF-A)", datatype=NUMERIC, unit="m"),
    ColumnIdentity("BottomDepth", ["BottomDepthUnscaled", "Bottom Depth CSF-A"],
                   desc="Bottom drilled depth of a core (CSF-A)", datatype=NUMERIC, unit="m"),
    ColumnIdentity("TopDepthScaled", ["Top Depth CSF-B"],
                   desc="Top drilled depth of a core, scaled (CSF-B)", datatype=NUMERIC, unit="m"),
    ColumnIdentity("BottomDepthScaled", ["Bottom Depth CSF-B"],
                   desc="Bottom drilled depth of a core, scaled (CSF-B)", datatype=NUMERIC, unit="m"),
    ColumnIdentity("CuratedLength", ["Length"],
                   desc="Length of core or section as measured post-extraction",
                   datatype=NUMERIC, unit="m"),
    ColumnIdentity("Gaps",
                   desc="Section intervals treated as gaps: 0+ 'top-bot' pairs",
                   unit="cm", optional=True),
])

# --- Sparse Splice (coring/sparseSplice.py:16-20) ---------------------------

SPARSE_SPLICE_FORMAT = TabularFormat("Sparse Splice", CORE_IDENTITY_COLS + identities(
    ["TopSection", "TopOffset", "BottomSection", "BottomOffset"]) + [
    ColumnIdentity("SpliceType", desc="Type of splice operation: TIE or APPEND"),
    ColumnIdentity("Gap", desc="Space added before an APPEND of the next interval",
                   datatype=NUMERIC, unit="m", optional=True),
] + identities(["DataUsed", "Comment"]))

# --- Affine Table (coring/affine.py:17-34) ----------------------------------

AFFINE_FORMAT = TabularFormat("Affine Table", CORE_IDENTITY_COLS + [
    ColumnIdentity("DepthCSF", ["Depth CSF-A", "Depth MBSF", "Depth MBLF", "Core top depth CSF-A"],
                   org_names={"IODP": "Core top depth CSF-A (m)"},
                   desc="Depth below sea floor", datatype=NUMERIC, unit="m"),
    ColumnIdentity("DepthCCSF", ["Depth CCSF-A", "Depth MCD", "Core top depth CCSF"],
                   org_names={"IODP": "Core top depth CCSF (m)"},
                   desc="Composite depth below sea floor", datatype=NUMERIC, unit="m"),
    ColumnIdentity("Offset", ["Cumulative Offset", "Total Offset"],
                   org_names={"IODP": "Cumulative offset (m)"},
                   desc="Difference between a core's CSF-A and CCSF-A depth",
                   datatype=NUMERIC, unit="m"),
    ColumnIdentity("DifferentialOffset", org_names={"IODP": "Differential offset (m)"},
                   desc="Difference between offsets of current and preceding core in hole",
                   datatype=NUMERIC, unit="m", optional=True),
    ColumnIdentity("GrowthRate", org_names={"IODP": "Growth rate"},
                   desc="Expanding OLS slope of CCSF vs CSF", datatype=NUMERIC, optional=True),
    ColumnIdentity("ShiftType", ["Affine Type", "Shift", "Shift type"],
                   org_names={"IODP": "Shift type"},
                   desc="Core's affine shift type: TIE, SET, REL or ANCHOR"),
    ColumnIdentity("FixedCore", ["Reference Core"], org_names={"IODP": "Reference core"},
                   desc="For a TIE, the Hole+Core of the fixed core", optional=True),
    ColumnIdentity("FixedTieCSF", ["Fixed Tie CSF-A", "Reference tie point CSF-A"],
                   org_names={"IODP": "Reference tie point CSF-A (m)"},
                   desc="CSF depth of the TIE point on the fixed core",
                   datatype=NUMERIC, unit="m", optional=True),
    ColumnIdentity("ShiftedTieCSF", ["Shifted Tie CSF-A", "Shift tie point CSF-A"],
                   org_names={"IODP": "Shift tie point CSF-A (m)"},
                   desc="CSF depth of the TIE point on the shifted core",
                   datatype=NUMERIC, unit="m", optional=True),
] + identities(["DataUsed", "Comment"]))

# --- Splice Interval Table (coring/spliceInterval.py:15-26) -----------------

SIT_FORMAT = TabularFormat("Splice Interval Table", CORE_IDENTITY_COLS + identities(
    ["TopSection", "TopOffset"]) + [
    ColumnIdentity("TopDepthCSF", ["Top Depth CSF-A"], org_names={"IODP": "Top Depth CSF-A"},
                   desc="Depth of splice interval top", datatype=NUMERIC, unit="m"),
    ColumnIdentity("TopDepthCCSF", ["Top Depth CCSF-A"], org_names={"IODP": "Top Depth CCSF-A"},
                   desc="Composite depth of splice interval top", datatype=NUMERIC, unit="m"),
] + identities(["BottomSection", "BottomOffset"]) + [
    ColumnIdentity("BottomDepthCSF", ["Bottom Depth CSF-A"],
                   org_names={"IODP": "Bottom Depth CSF-A"},
                   desc="Depth of splice interval bottom", datatype=NUMERIC, unit="m"),
    ColumnIdentity("BottomDepthCCSF", ["Bottom Depth CCSF-A"],
                   org_names={"IODP": "Bottom Depth CCSF-A"},
                   desc="Composite depth of splice interval bottom", datatype=NUMERIC, unit="m"),
    ColumnIdentity("SpliceType", desc="Type of splice operation: TIE or APPEND"),
    ColumnIdentity("Gap", desc="Space added before an APPEND of the next interval",
                   datatype=NUMERIC, unit="m", optional=True),
] + identities(["DataUsed", "Comment"]))

# --- Measurement Data (coring/measurement.py:16-18) -------------------------
# Only the section identity columns are required; every other column passes
# through untouched. The depth column is user-chosen at call time.

MEASUREMENT_FORMAT = TabularFormat("Measurement Data", SECTION_IDENTITY_COLS)

# --- Manual correlation formats (coring/manualCorrelation.py:18-36) ---------

MANUAL_CORRELATION_FORMAT = TabularFormat("Manual Correlation Tie Table", [
    ColumnIdentity("Site1", desc="Site of off-splice core"),
    ColumnIdentity("Hole1", desc="Hole of off-splice core"),
    ColumnIdentity("Core1", desc="Core of off-splice core"),
    ColumnIdentity("Tool1", desc="Tool of off-splice core"),
    ColumnIdentity("Section1", desc="Section of off-splice core"),
    ColumnIdentity("SectionDepth1", desc="Correlation point depth on off-splice core",
                   datatype=NUMERIC, unit="cm"),
    ColumnIdentity("Site2", desc="Site of on-splice core"),
    ColumnIdentity("Hole2", desc="Hole of on-splice core"),
    ColumnIdentity("Core2", desc="Core of on-splice core"),
    ColumnIdentity("Tool2", desc="Tool of on-splice core"),
    ColumnIdentity("Section2", desc="Section of on-splice core"),
    ColumnIdentity("SectionDepth2", desc="Correlation point depth on on-splice core",
                   datatype=NUMERIC, unit="cm"),
])

MANUAL_OFFSET_FORMAT = TabularFormat("Manual Offset Table", identities(["Site", "Hole", "Core"]) + [
    ColumnIdentity("Offset", ["Cumulative Offset", "Shift Distance"],
                   desc="Affine shift for the associated core", datatype=NUMERIC),
])

ALL_FORMATS = [
    SECTION_SUMMARY_FORMAT,
    SPARSE_SPLICE_FORMAT,
    AFFINE_FORMAT,
    SIT_FORMAT,
    MEASUREMENT_FORMAT,
    MANUAL_CORRELATION_FORMAT,
    MANUAL_OFFSET_FORMAT,
]


def struct_type(fmt: TabularFormat) -> StructType:
    """Canonical Spark schema for a format: StringType for STRING columns,
    DoubleType for NUMERIC — the reference's entire type surface
    (``tabular/columns.py:13-15``, ``tabular/pandasutils.py:92-99``)."""
    return StructType([
        StructField(c.name,
                    StringType() if c.is_string() else DoubleType(),
                    nullable=True)
        for c in fmt.cols
    ])


def pretty_rename_map(fmt: TabularFormat, df_columns: List[str], org: str = "IODP") -> Dict[str, str]:
    """canonical → vocabulary output names for columns present in the frame
    (``feldman.py:533-535``)."""
    return {c.name: c.pretty_name(org) for c in fmt.cols if c.name in df_columns}
