#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate: run every
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB at sf0.01, compare row count + column names + order-insensitive
values. Exits non-zero on any mismatch.

Usage: python tools/check_oracle.py [--sf-dir DIR] [--only name1,name2]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


FLOAT_SIG = None  # None = exact (driver-faithful); int = significant digits


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        # exact comparison: the driver's value hash may be bit-strict, so
        # every query must round its floats to hash-identical values itself.
        # --float-sig N relaxes to N significant digits for SCALE runs,
        # where a rounded SUM over 10x the addends legitimately differs
        # from DuckDB's at the last ulp (summation order is associativity-
        # dependent; both answers are "right") — never use it at sf0.01.
        if FLOAT_SIG is not None:
            return float(f"%.{FLOAT_SIG}g" % v)
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v


def _decimals(v: float) -> int:
    s = repr(v)
    return len(s.split(".", 1)[1]) if "." in s and "e" not in s else 0


def canonical(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument("--float-sig", type=int, default=None,
                    help="compare floats at N significant digits instead of "
                         "exactly — for scale runs (sf>=1) where rounded "
                         "sums differ at the last ulp by summation order")
    ap.add_argument("--stock-session", action="store_true",
                    help="use an unconfigured SparkSession (mirrors the "
                         "driver harness, which owns its own session and "
                         "does not apply feldman_spark.get_spark defaults)")
    args = ap.parse_args()
    if args.float_sig is not None:
        global FLOAT_SIG
        FLOAT_SIG = args.float_sig

    import duckdb

    import __spark_entry__ as entry

    if args.stock_session:
        from pyspark.sql import SparkSession

        spark = (SparkSession.builder.appName("oracle-check-stock")
                 .master("local[8]").config("spark.ui.enabled", "false")
                 .getOrCreate())
    else:
        from feldman_spark.session import get_spark

        spark = get_spark(app_name="oracle-check", master="local[8]",
                          shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            # Spark writes <name>.parquet as a directory of part files
            p = os.path.join(p, "*.parquet")
        if os.path.exists(os.path.dirname(p)) or os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    only = set(args.only.split(",")) if args.only else None

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows-only (no oracle), {len(srows)} rows "
                  f"[{time.time()-t0:.1f}s]")
            if len(srows) == 0:
                failures.append(name)
                print(f"FAIL  {name}: rows-only query returned 0 rows")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = rel.columns
            drows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            continue

        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns spark={sorted(scols)} duck={sorted(dcols)}")
        elif len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        else:
            a = canonical(srows, scols)
            b = canonical(drows, dcols)
            if a != b and FLOAT_SIG is not None:
                # scale-run leniency: a pre-round sum that lands within one
                # ulp of a rounding boundary (summation-order effect) shows
                # up as exactly one unit in the last rounded decimal —
                # accept float cells within that step, nothing else
                straddles = 0
                for i in range(len(a)):
                    if a[i] == b[i]:
                        continue
                    for x, y in zip(a[i], b[i]):
                        if x == y:
                            continue
                        if not (isinstance(x, float) and isinstance(y, float)):
                            straddles = -1
                            break
                        step = 10.0 ** -max(_decimals(x), _decimals(y))
                        if abs(x - y) > step * 1.001:
                            straddles = -1
                            break
                    if straddles < 0:
                        break
                    straddles += 1
                if straddles >= 0:
                    if straddles:
                        print(f"      {name}: {straddles} rounding-straddle "
                              f"row(s) accepted at one-rounding-step tolerance")
                    a = b
            if a != b:
                bad = next(i for i in range(len(a)) if a[i] != b[i])
                problems.append(f"values differ at sorted-row {bad}:\n"
                                f"        spark={a[bad]}\n        duck ={b[bad]}")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(f"ok    {name}: {len(srows)} rows match [{time.time()-t0:.1f}s]")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        return 1
    print(f"all {len([n for n in qs if not only or n in only])} queries match")
    return 0


if __name__ == "__main__":
    sys.exit(main())
