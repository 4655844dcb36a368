"""SQL views over canonical tables, and bucketed-join co-location."""

import pytest
from pyspark.sql import functions as F

from feldman_spark.engine import load_section_summary, load_sparse_splice
from feldman_spark.sql import bucketed_table, register_views


def test_sql_over_canonical_views(spark, ref_testdata):
    ss = load_section_summary(spark, f"{ref_testdata}/GLAD9_SectionSummary.csv")
    sp = load_sparse_splice(spark, f"{ref_testdata}/GLAD9_Site1_SparseSplice.csv")
    register_views(spark, section_summary=ss, sparse_splice=sp)
    row = spark.sql("""
        SELECT s.Site, count(*) AS n_sections,
               round(max(s.BottomDepth), 3) AS max_depth
        FROM section_summary s
        WHERE s.Site IN (SELECT DISTINCT Site FROM sparse_splice)
        GROUP BY s.Site
    """).first()
    assert row["Site"] == "1" and row["n_sections"] > 0
    # point lookup through SQL matches the operator result
    top = spark.sql("""
        SELECT round(TopDepth, 3) AS t FROM section_summary
        WHERE Site='1' AND Hole='A' AND Core='33' AND Section='9'
    """).first()["t"]
    assert top == 92.73


def test_bucketed_join_has_no_exchange(spark):
    """Identically bucketed tables join with zero Exchange on either side —
    the pre-shuffled layout for repeated large-large joins."""
    for t in ("bkt_left", "bkt_right"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    left = spark.range(0, 100_000).selectExpr("id AS k", "id * 2 AS a")
    right = spark.range(0, 100_000).selectExpr("id AS k", "id * 3 AS b")
    lt = bucketed_table(left, "bkt_left", ("k",), num_buckets=8, sort_cols=("k",))
    rt = bucketed_table(right, "bkt_right", ("k",), num_buckets=8, sort_cols=("k",))

    # force the large-large path (at toy scale the planner would rather
    # broadcast and ignore bucketing entirely)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = lt.join(rt, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan[:800]
        assert "Bucketed: true" in plan
        assert joined.count() == 100_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
