"""IO robustness + format application, against the reference's own edge-case
fixtures (read in place from /root/reference/testdata — never copied)."""

import os

import pytest

from feldman_spark.formats.registry import (
    MANUAL_CORRELATION_FORMAT,
    SECTION_SUMMARY_FORMAT,
)
from feldman_spark.io.csv import (
    FormatError,
    can_create_with_file,
    read_csv,
    read_headers,
    read_tabular,
)


def test_utf8_bom_blanklines(spark, ref_testdata):
    # UTF-8 BOM header + interleaved blank lines must load as 4 rows
    # (tabular/pandasutils.py:176-178)
    df = read_csv(spark, os.path.join(ref_testdata, "utf8_bom_blanklines.csv"))
    assert df.count() == 4
    assert not df.columns[0].startswith("﻿")


def test_utf8err_fallback(spark, ref_testdata):
    # invalid UTF-8 byte: loads via Latin-1 fallback, 2 rows
    # (tabular/pandasutils.py:172-174)
    df = read_csv(spark, os.path.join(ref_testdata, "utf8err.csv"))
    assert df.count() == 2


def test_read_headers(ref_testdata):
    hs = read_headers(os.path.join(ref_testdata, "GLAD9_SectionSummary.csv"))
    assert len(hs) == 10
    assert "Site" in hs and "CuratedLength" in hs


def test_missing_optional_gaps_added(spark, ref_testdata):
    # optional Gaps column absent -> auto-added empty
    # (coring/sectionSummary.py:275-278)
    df = read_tabular(spark, os.path.join(ref_testdata, "SectionSummaryNoGaps.csv"),
                      SECTION_SUMMARY_FORMAT)
    assert "Gaps" in df.columns
    assert df.filter(df.Gaps != "").count() == 0


def test_missing_required_raises(spark, ref_testdata):
    # missing required column -> FormatError (coring/sectionSummary.py:281-282)
    with pytest.raises(FormatError):
        read_tabular(spark, os.path.join(ref_testdata, "SectionSummaryNoSite.csv"),
                     SECTION_SUMMARY_FORMAT)


def test_format_sniff(ref_testdata):
    assert can_create_with_file(
        os.path.join(ref_testdata, "ManualCorrelationTable.csv"),
        MANUAL_CORRELATION_FORMAT)
    assert not can_create_with_file(
        os.path.join(ref_testdata, "GLAD9_SectionSummary.csv"),
        MANUAL_CORRELATION_FORMAT)


def test_question_marks_null(spark, tmp_out):
    p = os.path.join(tmp_out, "qmarks.csv")
    with open(p, "w") as f:
        f.write("A,B\n?,1.5\nx,??\n")
    df = read_csv(spark, p)
    rows = sorted(df.collect(), key=lambda r: (r["B"] is None, r["B"] or ""))
    assert rows[0]["A"] is None and rows[0]["B"] == "1.5"
    assert rows[1]["A"] == "x" and rows[1]["B"] is None
