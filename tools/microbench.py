#!/usr/bin/env python3
"""Ad-hoc per-query microbench: median-of-N wall clock to the noop sink
for a comma-separated list of registered queries, same harness shape as
bench.py (warm-up, noop materialization). Usage:

    python tools/microbench.py q1_pricing_summary,dedup_minhash_lsh [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1].split(",")
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import __spark_entry__ as entry
    from feldman_spark.session import get_spark

    spark = get_spark(app_name="feldman-spark-microbench",
                      master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    spark.range(int(cpus)).repartition(int(cpus)).mapInPandas(
        lambda it: it, "id long").count()

    qs = entry.queries()
    for name in names:
        # same hygiene as bench.py: drop every cached frame the previous
        # query registered, so a multi-query invocation can't accumulate
        # session-lifetime persists (measured: an sf20 7-query sequence
        # OOMed the 8g driver without this; bench.py has cleared per
        # query since round 7)
        spark.catalog.clearCache()
        fn = qs[name]
        samples = []
        for _ in range(reps):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        med = statistics.median(samples)
        print(f"{name}: median {med:.3f}s  samples "
              f"{[round(s, 3) for s in samples]}")


if __name__ == "__main__":
    main()
