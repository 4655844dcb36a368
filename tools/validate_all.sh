#!/bin/bash
# Full validation ladder, in the order that fails fastest:
#   unit/golden suite -> oracle gate (stock session, mirrors the driver)
#   -> E1/E2 scale smoke -> pipeline scale smoke -> bench.
# Any non-zero exit stops the ladder.
set -e
cd "$(dirname "$0")/.."

echo "== pytest =="           && python -m pytest tests/ -q
echo "== oracle gate =="      && python tools/check_oracle.py --stock-session
echo "== scale smoke =="      && python tools/scale_smoke.py --rows 10000000
echo "== pipeline smoke =="   && python tools/pipeline_smoke.py --docs 1000000
echo "== bench =="            && BENCH_ENFORCE=1 python bench.py
