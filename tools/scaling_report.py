#!/usr/bin/env python3
"""Parallel-efficiency report from two bench JSONs (same SF, different
core counts): per query, t_low/t_high ratio vs the ideal cores ratio.
Usage: python tools/scaling_report.py BENCH_c8.json BENCH_c32.json [8 32]
Prints a markdown table sorted by efficiency ascending (worst first).
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    # the JSON is the LAST parseable line (the bench contract)
    doc = None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                try:
                    doc = json.loads(line)
                except json.JSONDecodeError:
                    pass
    if doc is None:
        raise SystemExit(f"no JSON line in {path}")
    return doc


def main() -> None:
    lo_doc, hi_doc = _load(sys.argv[1]), _load(sys.argv[2])
    c_lo = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    c_hi = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    ideal = c_hi / c_lo
    qlo, qhi = lo_doc["queries"], hi_doc["queries"]
    rows = []
    for name in qhi:
        if name in qlo and qhi[name] > 0:
            r = qlo[name] / qhi[name]
            rows.append((r / ideal, r, qlo[name], qhi[name], name))
    rows.sort()
    print(f"| query | {c_lo}c s | {c_hi}c s | speedup | efficiency |")
    print("|---|---|---|---|---|")
    for eff, r, tlo, thi, name in rows:
        print(f"| {name} | {tlo:.3f} | {thi:.3f} | {r:.2f} | {eff:.2f} |")
    tot_lo = sum(qlo[n] for n in qhi if n in qlo)
    tot_hi = sum(qhi[n] for n in qhi if n in qlo)
    print(f"\ntotal {tot_lo:.1f}s @ {c_lo}c vs {tot_hi:.1f}s @ {c_hi}c "
          f"(speedup {tot_lo / tot_hi:.2f}, ideal {ideal:.0f})")


if __name__ == "__main__":
    main()
