#!/usr/bin/env python3
"""Capture `.explain("formatted")` for named registered queries into
plans/<round>/<query>_<tag>.txt (round from $SPARK_GRAFT_PLANS_ROUND, default r11) — the optimization round's before/after
plan evidence. Usage:

    python tools/explain_to_file.py before q1_pricing_summary,text_winnow
    python tools/explain_to_file.py after  text_winnow
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r11"))
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entry
    from feldman_spark.session import get_spark

    spark = get_spark(app_name="feldman-spark-explain",
                      master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange, "
              f"{plan.count('SortMergeJoin')} SMJ, "
              f"{plan.count('EvalPython')} PythonEval)")


if __name__ == "__main__":
    main()
