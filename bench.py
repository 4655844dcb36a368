#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries from __spark_entry__ at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the summed wall-clock of all headline queries (execution time
to a fully-materialized result, JVM/session startup excluded). Each query
is timed as the median of REPS runs (default 3) to a ``noop`` sink — the
noop data source materializes every row of every column without letting
Catalyst prune the projection the way ``count()`` does, and the median
absorbs one-off GC/CPU-contention spikes that a single run reports as
phantom regressions. Each query additionally gets ONE untimed warm-up
run so per-query one-time costs (Janino compile of its generated
stages, persist materialization) don't pollute the steady-state median.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    # the reference-parity operator surface, heaviest shapes first
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_revenue_forecast",
    "q10_returned_items",
    "j1_containment_join",
    "j4_broadcast_equi",
    "j7_nearest_join",
    "j9_asof_join",
    "a5_conditional_sum_hof",
    "w2_lag_diff",
    "w3_expanding_slope",
    "w1_splice_scan",
    "feldman_e2_export",
    "q17_avg_subquery",
    "q18_large_volume",
    "q19_disjunctive",
    # beyond-reference pipeline operators (present from the round they land)
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_quality",
    "knn_brute_force",
    "knn_ivf",
    "events_sessionize",
    "events_sessionize_native",
    "dedup_embedding_cosine",
    "q21_waiting_supplier",
    "sample_split",
    "decontaminate_corpus",
    "pipeline_dedup_stats",
    "dedup_ngram_jaccard",
    # round-5 continuation flagships
    "dedup_paragraphs",
    "dedup_semantic",
    "text_gopher_quality",
    # round-6 additions: corpus-wide boilerplate strip, keyless range
    # join, DSIR data selection
    "dedup_frequent_spans",
    "j11_binned_range_join",
    "sample_dsir",
    "decontaminate_semantic",
    "text_strip_html",
    "w8_rolling_time",
    "pack_chunks",
]

# slack for the regression gate: sub-second queries jitter by whole
# fractions of themselves run-to-run; a second of fixed overhead absorbs
# that without hiding real plan regressions on the heavy queries
def _limit(floor: float) -> float:
    return max(1.5 * floor, floor + 1.0)


def _autosize_driver_memory(sf_dir: str) -> None:
    """Scale the local-mode JVM heap with the input size.

    In ``local[N]`` everything — scans, 32 concurrent shuffle tasks, the
    block manager — shares the DRIVER heap, so the 8g default that is
    right for the sf0.1 gate becomes a GC trap at sf20 (3.2 GB parquet
    ≈ 15-25 GB live during wide shuffles; measured: the first sf20 run
    under 8g lost shuffle files and ran ~2x slow on pure GC). Heuristic:
    ~12 GB heap per on-disk GB (decompression + shuffle double-buffering
    across 32 threads), floored at the 8g gate default so sf0.1 floors
    stay comparable, capped at half of physical RAM. An explicit
    SPARK_DRIVER_MEMORY always wins. On a real cluster this knob is
    per-executor memory and comes from cluster_conf() sizing instead.
    """
    if os.environ.get("SPARK_DRIVER_MEMORY"):
        return
    try:
        disk = sum(
            os.path.getsize(os.path.join(root, f))
            for root, _, files in os.walk(sf_dir) for f in files
        )
        with open("/proc/meminfo") as f:
            ram_kb = int(next(l for l in f if l.startswith("MemTotal"))
                         .split()[1])
        heap = min(max(8, 4 + int(12 * disk / 2**30)), ram_kb // 1024 // 2048)
        os.environ["SPARK_DRIVER_MEMORY"] = f"{heap}g"
    except (OSError, StopIteration, ValueError):
        pass  # keep the session.py default


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    _autosize_driver_memory(sf_dir)

    import __spark_entry__ as entry
    from feldman_spark.session import get_spark

    spark = get_spark(app_name="feldman-spark-bench", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM codegen paths, parquet footers, and the Python/Arrow
    # worker pool — so per-query numbers measure steady-state execution,
    # not one-time session initialization
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    spark.range(int(cpus)).repartition(int(cpus)).mapInPandas(
        lambda it: it, "id long").count()

    # the IVF index is built once and amortized across queries in
    # production — build it outside the timed region, report separately
    t0 = time.time()
    ivf_index = entry.knn_ivf_index(spark, sf_dir)
    setup = {"knn_ivf_build": round(time.time() - t0, 3)}

    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    qs = entry.queries()
    timings = {}
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        samples = []
        # rep 0 is an untimed warm-up: it carries the per-query one-time
        # costs (Janino compile of that query's unique generated stages,
        # persist materialization, first touch of its tables) that
        # otherwise land in the median on slow/contended hosts — the
        # documented metric is steady-state execution (measured: first
        # runs are 2.5-6x steady state for the cache-heavy dedup
        # queries)
        for rep in range(reps + 1):
            t0 = time.time()
            if name == "knn_ivf":
                df = fn(spark, sf_dir, index=ivf_index)
            else:
                df = fn(spark, sf_dir)
            # noop sink: full materialization of every column, immune to
            # the projection pruning count() allows
            df.write.format("noop").mode("overwrite").save()
            if rep > 0:
                samples.append(time.time() - t0)
            if rep == 0 and df.isEmpty():
                print(f"warning: {name} returned 0 rows", file=sys.stderr)
        timings[name] = round(statistics.median(samples), 3)

        if name == "feldman_e2_export":
            # plan-posture pin for the E2 flagship (export.py:102-150):
            # the measurement table must never sort-merge shuffle — its
            # joins broadcast the dimension side; the ONE allowed
            # exchange is the final (flag, Site) summary aggregate
            import re

            plan = df._jdf.queryExecution().executedPlan().toString()
            smj = plan.count("SortMergeJoin")
            shuf = len(re.findall(r"Exchange (hash|range|round|single)",
                                  plan))
            if smj > 0 or shuf > 1:
                print(f"PLAN REGRESSION: feldman_e2_export has "
                      f"{smj} SortMergeJoin / {shuf} shuffle exchanges "
                      f"(expected 0 / <=1)", file=sys.stderr)
                if os.environ.get("BENCH_ENFORCE") == "1":
                    sys.exit(1)

    total = round(sum(timings.values()), 3)

    sf_name = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    # regression gate against the committed per-query floor — the floors
    # are sf0.1 numbers, so only meaningful at that scale (scale-proof
    # runs at other SFs are compared in docs/SCALING.md instead)
    regressions = {}
    floor_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "bench_floor.json")
    if os.path.exists(floor_path) and sf_name == "0.1":
        with open(floor_path) as f:
            floors = json.load(f).get("queries", {})
        for name, t in timings.items():
            fl = floors.get(name)
            if fl is not None and t > _limit(fl):
                regressions[name] = {"floor": fl, "now": t}
                print(f"REGRESSION: {name} {t}s > limit {_limit(fl):.2f}s "
                      f"(floor {fl}s)", file=sys.stderr)
    try:
        sf_val = float(sf_name)
    except ValueError:
        sf_val = sf_name
    out = {
        "metric": "headline_queries_total_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "setup": setup,
    }
    if regressions:
        out["regressions"] = regressions
    print(json.dumps(out))
    if regressions and os.environ.get("BENCH_ENFORCE") == "1":
        sys.exit(1)


if __name__ == "__main__":
    main()
