"""Error-handling parity: the reference bails on invalid splices
(feldman.py:189-192, 223-225); our engine must raise with a matching
diagnosis rather than produce garbage."""

import pytest
from pyspark.sql import functions as F

from feldman_spark.engine import convert_sparse_splice_frames
from feldman_spark.io.csv import FormatError


def _secsumm(spark):
    rows = []
    for c in (1, 2):
        for s in (1, 2, 3):
            top = (c - 1) * 4.5 + (s - 1) * 1.5
            rows.append(("1", "A", str(c), "H", str(s),
                         top, top + 1.5, top * 1.01, (top + 1.5) * 1.01, 1.5, ""))
    return spark.createDataFrame(rows, (
        "Site string, Hole string, Core string, Tool string, Section string, "
        "TopDepth double, BottomDepth double, TopDepthScaled double, "
        "BottomDepthScaled double, CuratedLength double, Gaps string")) \
        .coalesce(1).withColumn("_idx", F.monotonically_increasing_id())


def _sparse(spark, rows):
    return spark.createDataFrame(rows, (
        "Site string, Hole string, Core string, Tool string, TopSection string, "
        "TopOffset double, BottomSection string, BottomOffset double, "
        "SpliceType string, Gap double, DataUsed string, Comment string, _idx long"))


def test_inverted_interval_raises(spark):
    # top below bottom -> reference logs error and bails (feldman.py:189-192)
    sp = _sparse(spark, [
        ("1", "A", "1", "H", "3", 100.0, "1", 10.0, "TIE", None, "", "", 0),
    ])
    with pytest.raises(Exception, match="inverted or zero-length"):
        aff, sit = convert_sparse_splice_frames(_secsumm(spark), sp)
        sit.collect()


def test_unknown_splice_type_raises(spark):
    sp = _sparse(spark, [
        ("1", "A", "1", "H", "1", 10.0, "2", 100.0, "SPLICE???", None, "", "", 0),
        ("1", "A", "2", "H", "1", 10.0, "2", 100.0, "TIE", None, "", "", 1),
    ])
    with pytest.raises(Exception, match="unknown splice type"):
        aff, sit = convert_sparse_splice_frames(_secsumm(spark), sp, validate=False)
        sit.collect()


def test_missing_section_lookup_raises(spark):
    # splice references a section absent from the summary
    sp = _sparse(spark, [
        ("1", "A", "1", "H", "1", 10.0, "9", 100.0, "TIE", None, "", "", 0),
    ])
    with pytest.raises(Exception, match="lookup failed"):
        aff, sit = convert_sparse_splice_frames(_secsumm(spark), sp)
        sit.collect()


def test_non_integer_section_validation(spark):
    # F7 validation fires before the scan (feldman.py:107-112)
    sp = _sparse(spark, [
        ("1", "A", "1", "H", "1x", 10.0, "2", 100.0, "TIE", None, "", "", 0),
    ])
    with pytest.raises(FormatError, match="non-integer"):
        convert_sparse_splice_frames(_secsumm(spark), sp)
