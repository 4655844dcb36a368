#!/usr/bin/env python3
"""Guard against the r6 `knn_group_centroids` failure class: the driver's
correctness canonicalizer does a pandas ``sort_values`` over every output
column, which raises ``TypeError: unhashable type`` on array/map/struct
cells. Build every ``__spark_entry__.queries()`` DataFrame at sf0.001 and
fail if any registered query's output schema contains a complex type —
such queries must register a scalar canonical form (``to_json`` or a long
(key, pos, value) layout) and keep the array-returning library function
for programmatic callers.

Usage: python tools/audit_output_types.py [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import types as T

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("audit-output-types")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    complex_types = (T.ArrayType, T.MapType, T.StructType)
    bad, errs = [], []
    qs = entry.queries()
    for name, fn in qs.items():
        try:
            df = fn(spark, args.sf_dir)
        except Exception as e:  # noqa: BLE001 - report, keep auditing
            errs.append((name, repr(e)[:200]))
            continue
        hits = [f.name for f in df.schema.fields
                if isinstance(f.dataType, complex_types)]
        if hits:
            bad.append((name, hits))
        print(f"  {name}: {'COMPLEX ' + str(hits) if hits else 'ok'}",
              flush=True)

    print(f"\naudited {len(qs)} queries; "
          f"{len(bad)} with complex output columns; {len(errs)} build errors")
    for name, hits in bad:
        print(f"  COMPLEX {name}: {hits}")
    for name, e in errs:
        print(f"  ERR {name}: {e}")
    return 1 if (bad or errs) else 0


if __name__ == "__main__":
    sys.exit(main())
