#!/usr/bin/env python3
"""A/B harness for the r10 optimization round: measure each named query
with the plain `_t` read vs the row-group-floor `_tw` read (monkeypatch
swap), alternating arms rep-by-rep so host bursts hit both equally.
Prints per-query medians and the verdict. Usage:

    python tools/ab_parallel_read.py q1,q2,... [reps_per_arm]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1].split(",")
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import __spark_entry__ as entry
    from feldman_spark.session import get_spark

    spark = get_spark(app_name="ab-parallel-read",
                      master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    spark.range(int(cpus)).repartition(int(cpus)).mapInPandas(
        lambda it: it, "id long").count()

    orig_t = entry._t
    qs = entry.queries()

    def tw_t(s, d, n):
        df = orig_t(s, d, n)
        cores = s.sparkContext.defaultParallelism
        if entry._scan_row_groups(f"{d}/{n}.parquet") < cores:
            return df.repartition(cores)
        return df

    def run(name, use_tw):
        entry._t = tw_t if use_tw else orig_t
        try:
            t0 = time.time()
            qs[name](spark, sf_dir).write.format(
                "noop").mode("overwrite").save()
            return time.time() - t0
        finally:
            entry._t = orig_t

    for name in names:
        # warm both arms (codegen compile for each plan shape)
        run(name, False)
        run(name, True)
        spark.catalog.clearCache()
        base, tw = [], []
        for _ in range(reps):
            base.append(run(name, False))
            spark.catalog.clearCache()
            tw.append(run(name, True))
            spark.catalog.clearCache()
        mb, mt = statistics.median(base), statistics.median(tw)
        verdict = "TW_WINS" if mt < 0.9 * mb else (
            "BASE_WINS" if mb < 0.9 * mt else "WASH")
        print(f"{name}: base {mb:.3f}s tw {mt:.3f}s -> {verdict}  "
              f"b={[round(x,2) for x in base]} t={[round(x,2) for x in tw]}",
              flush=True)


if __name__ == "__main__":
    main()
