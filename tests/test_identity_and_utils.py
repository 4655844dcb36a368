"""P7 SectionID parsing, P5 column-index helpers, S3 numeric discovery,
P11 gap-column merge, S5 Correlator funky-format reader."""

from pyspark.sql import functions as F

from feldman_spark.formats.columns import (
    first_column_starting_with,
    last_column_starting_with,
)
from feldman_spark.io.csv import numeric_columns, read_correlator_funky, read_headers
from feldman_spark.ops.gaps import merge_gap_columns
from feldman_spark.ops.identity import (
    make_section_id,
    parse_section_id,
    split_section_id_columns,
)


def test_parse_section_id(spark):
    # examples from coring/identity.py:10-31 and its __main__ block
    df = spark.createDataFrame(
        [("GLAD9-PET06-1A-25H-1",),
         ("TDP-TOW15-1B-23H-2",),
         ("FOO-BAR69-6Z-3A-4-A",),
         ("FOO-BAR69-6Z-3A-4-J",)],  # invalid half -> null
        "sid string")
    rows = df.select(parse_section_id(F.col("sid")).alias("p")).collect()
    p0 = rows[0]["p"]
    assert (p0["name"], p0["site"], p0["hole"], p0["core"], p0["tool"], p0["section"]) == \
        ("GLAD9-PET06", "1", "A", "25", "H", "1")
    assert rows[1]["p"]["tool"] == "H" and rows[1]["p"]["hole"] == "B"
    assert rows[2]["p"]["half"] == "A"
    assert rows[3]["p"]["half"] is None


def test_split_section_id_columns_order(spark):
    df = spark.createDataFrame(
        [("x", "GLAD9-PET06-1A-25H-1", 3.14)], "pre string, SectionID string, val double")
    out = split_section_id_columns(df)
    assert out.columns == ["pre", "SectionID", "Name", "Site", "Hole", "Core",
                           "Tool", "Section", "val"]
    r = out.first()
    assert r["Site"] == "1" and r["Core"] == "25" and r["Section"] == "1"


def test_make_section_id_roundtrip(spark):
    df = spark.createDataFrame([("GLAD9-PET06", "1", "A", "25", "H", "1")],
                               "n string, s string, h string, c string, t string, sec string")
    sid = df.select(make_section_id(*[F.col(c) for c in df.columns]).alias("sid")).first()["sid"]
    assert sid == "GLAD9-PET06-1A-25H-1"


def test_column_index_helpers(ref_testdata):
    # tabular/pandasutils.py:181-188 goldens on the XRF header
    headers = read_headers(f"{ref_testdata}/GLAD9_Site1_XRF.csv")
    assert first_column_starting_with("Sediment Depth", headers) == 10
    assert last_column_starting_with("Sediment Depth", headers) == 11


def test_numeric_columns(spark):
    df = spark.createDataFrame([(1, "a", 2.5)], "i long, s string, d double")
    assert numeric_columns(df) == ["i", "d"]


def test_merge_gap_columns(spark):
    df = spark.createDataFrame(
        [(1, 0.0, 0.5, 94.5, 96.0), (2, None, None, None, None)],
        "id long, `Gap 1 T` double, `Gap 1 B` double, `Gap 2 T` double, `Gap 2 B` double")
    out = {r["id"]: r["Gaps"] for r in merge_gap_columns(df, 2).collect()}
    assert out[1] == "0.0-0.5 94.5-96.0"
    assert out[2] == ""


def test_correlator_funky_reader(spark, tmp_out):
    p = f"{tmp_out}/funky.dat"
    with open(p, "w") as f:
        f.write("# comment line\n")
        f.write("GLAD9 \t1 \tA \t25 \tH \t1 \t0.0 \t84.0 \t12.3 \t0.5 \t1\n")
        f.write("GLAD9 \t1 \tB \t2 \tH \t1 \t10.0 \t90.0 \t13.1 \t0.7 \t2\n")
    df = read_correlator_funky(spark, p)
    assert df.count() == 2
    assert df.columns[:6] == ["Exp", "Site", "Hole", "Core", "CoreType", "Section"]
    assert df.filter(F.col("Hole") == "B").first()["Depth"] == "13.1"


def test_append_date():
    from datetime import date

    from feldman_spark.engine import append_date

    assert append_date("out") == f"out_{date.today().isoformat()}"


def test_convert_gap_columns_csv(spark, tmp_out):
    from feldman_spark.engine import convert_gap_columns_csv

    src = f"{tmp_out}/wide_gaps.csv"
    with open(src, "w") as f:
        f.write("Site,Hole,Gap 1 T,Gap 1 B,Gap 2 T,Gap 2 B\n")
        f.write("1,A,0.0,0.5,94.5,96.0\n")
        f.write("1,B,,,,\n")
    out = convert_gap_columns_csv(spark, src, f"{tmp_out}/merged_gaps.csv", 2)
    rows = {r["Hole"]: r["Gaps"] for r in out.collect()}
    assert rows["A"] == "0.0-0.5 94.5-96.0"
    assert rows["B"] == ""
    import pandas as pd
    written = pd.read_csv(f"{tmp_out}/merged_gaps.csv")
    assert "Gaps" in written.columns


def test_progress_listener_surface(spark, tmp_path, ref_testdata):
    """The listener protocol matches the reference's (clear +
    setValueAndText); E1 reports 0/25/100 milestones in order."""
    from feldman_spark.engine import convert_sparse_splice
    from feldman_spark.progress import report_progress, set_progress_listener

    events = []

    class Listener:
        def clear(self):
            events.append(("clear",))

        def setValueAndText(self, value, text):
            events.append((value, text))

    set_progress_listener(Listener())
    try:
        convert_sparse_splice(
            spark,
            f"{ref_testdata}/GLAD9_SectionSummary.csv",
            f"{ref_testdata}/GLAD9_Site1_SparseSplice.csv",
            str(tmp_path / "aff.csv"), str(tmp_path / "sit.csv"))
    finally:
        set_progress_listener(None)
    values = [e[0] for e in events]
    assert values[0] == "clear"
    assert [v for v in values[1:]] == [0, 25, 100]
    # uninstalled listener: report is a no-op
    report_progress(50, "ignored")
    assert len(events) == 4
