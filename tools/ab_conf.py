#!/usr/bin/env python3
"""A/B a runtime-settable SQL conf over registered queries: alternating
base/variant reps to the noop sink in ONE session, medians of each arm —
the same-session methodology the r10 round log uses everywhere (host
ratios drift too much between sessions to trust cross-session deltas).

Usage:
    SPARK_GRAFT_SF_DIR=.tmp/sf20 python tools/ab_conf.py \
        q3_shipping_priority,a5_conditional_sum_hof \
        spark.sql.adaptive.coalescePartitions.initialPartitionNum 256 [reps]

The base arm UNSETS the conf (session default); the variant arm sets it
to the given value. Prints per-query medians and the full sample lists.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1].split(",")
    key, value = sys.argv[2], sys.argv[3]
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import __spark_entry__ as entry
    from feldman_spark.session import get_spark

    spark = get_spark(app_name="feldman-spark-ab-conf",
                      master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    spark.range(int(cpus)).repartition(int(cpus)).mapInPandas(
        lambda it: it, "id long").count()

    qs = entry.queries()
    for name in names:
        fn = qs[name]
        arms: dict[str, list[float]] = {"base": [], "variant": []}
        # one untimed warm-up per arm (codegen compile, file listing)
        for arm in ("base", "variant"):
            if arm == "variant":
                spark.conf.set(key, value)
            else:
                spark.conf.unset(key)
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        for _ in range(reps):
            for arm in ("base", "variant"):
                if arm == "variant":
                    spark.conf.set(key, value)
                else:
                    spark.conf.unset(key)
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                arms[arm].append(time.time() - t0)
        spark.conf.unset(key)
        b, v = statistics.median(arms["base"]), statistics.median(arms["variant"])
        print(f"{name}: base median {b:.3f}s  variant median {v:.3f}s  "
              f"({v / b:.2f}x)  base={[round(s, 2) for s in arms['base']]} "
              f"variant={[round(s, 2) for s in arms['variant']]}",
              flush=True)


if __name__ == "__main__":
    main()
