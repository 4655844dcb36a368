"""Core-identity parsing (SURVEY §2.2 P7, §2.9 C8/C10).

Re-expresses ``coring/identity.py:74-103`` (``parseIdentity``) and
``coring/utils.py:13-29`` (``splitSectionID``) as column expressions:
LacCore-style section IDs like ``GLAD9-PET06-1A-25H-1`` (or IODP-style
``327-U1363B-2H-5``) split into Name/Site/Hole/Core/Tool/Section[/Half]
with no UDF — one pass, codegen-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["parse_section_id", "split_section_id_columns", "make_section_id"]

_NUM_ALPHA = r"([0-9]+)([A-Z]+)"


def parse_section_id(sid: Column) -> Column:
    """Parse a 5- or 6-token section ID into a struct
    (name, site, hole, core, tool, section, half). Invalid half tokens
    (not A/W/WR) become null, like the reference's warning path
    (``coring/identity.py:85-90``)."""
    toks = F.split(sid, "-")
    n = F.size(toks)
    site_hole = toks.getItem(2)
    core_tool = toks.getItem(3)
    half_raw = F.when(n == 6, toks.getItem(5))
    return F.struct(
        F.concat_ws("-", toks.getItem(0), toks.getItem(1)).alias("name"),
        F.regexp_extract(site_hole, _NUM_ALPHA, 1).alias("site"),
        F.regexp_extract(site_hole, _NUM_ALPHA, 2).alias("hole"),
        F.regexp_extract(core_tool, _NUM_ALPHA, 1).alias("core"),
        F.regexp_extract(core_tool, _NUM_ALPHA, 2).alias("tool"),
        toks.getItem(4).alias("section"),
        F.when(half_raw.isin("A", "W", "WR"), half_raw).alias("half"),
    )


def split_section_id_columns(df: DataFrame, sid_col: str = "SectionID") -> DataFrame:
    """P7 applied: add Name/Site/Hole/Core/Tool/Section columns right
    after the SectionID column (the reference's positional-insert contract,
    ``coring/utils.py:17-29`` — realized as an explicit select order)."""
    parsed = parse_section_id(F.col(f"`{sid_col}`"))
    cols = list(df.columns)
    idx = cols.index(sid_col) + 1
    new = [("Name", parsed["name"]), ("Site", parsed["site"]), ("Hole", parsed["hole"]),
           ("Core", parsed["core"]), ("Tool", parsed["tool"]), ("Section", parsed["section"])]
    exprs = [F.col(f"`{c}`") for c in cols[:idx]]
    exprs += [e.alias(name) for name, e in new]
    exprs += [F.col(f"`{c}`") for c in cols[idx:]]
    return df.select(exprs)


def make_section_id(
    name: Column, site: Column, hole: Column, core: Column, tool: Column,
    section: Column,
) -> Column:
    """C10 inverse: assemble ``Name-SiteHole-CoreTool-Section``
    (``coring/identity.py:57-66`` ``__repr__``)."""
    return F.concat(
        name, F.lit("-"), site, hole, F.lit("-"), core, tool, F.lit("-"), section
    )
