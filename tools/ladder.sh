#!/bin/bash
# End-of-round scale ladder, ONE host session, final code: headline bench
# at sf0.1 -> sf1 -> sf5 -> sf20 plus full-registry sweeps (warm reps) at
# sf1/sf5. Produces the BENCH_r{N}_sf*.json + SWEEP_r{N}_sf*.json
# artifacts the scale story cites. Scale dirs come from tools/make_sf.py
# (driver data is read-only and tops out at sf0.1).
#
# Usage: bash tools/ladder.sh r7
set -e
cd "$(dirname "$0")/.."
TAG="${1:?usage: ladder.sh rN}"

# sf0.1 rung named _sf0.1 so it can't collide with the driver's own
# BENCH_${TAG}.json artifact
echo "== bench sf0.1 ==" >&2
python bench.py > "BENCH_${TAG}_sf0.1.json"
for SF in 1 5 20; do
  DIR=".tmp/sf${SF}"
  [ -d "$DIR" ] || { echo "missing $DIR (run tools/make_sf.py --target $SF)" >&2; exit 1; }
  echo "== bench sf${SF} ==" >&2
  SPARK_GRAFT_SF_DIR="$PWD/$DIR" python bench.py > "BENCH_${TAG}_sf${SF}.json"
done
for SF in 1 5; do
  echo "== sweep sf${SF} ==" >&2
  python tools/sweep.py --sf-dir ".tmp/sf${SF}" --out "SWEEP_${TAG}_sf${SF}.json" || true
done
python tools/sweep.py --compare "SWEEP_${TAG}_sf1.json" "SWEEP_${TAG}_sf5.json" --factor 5 > "SWEEP_${TAG}_compare.txt" || true
echo "== ladder done ==" >&2
for f in BENCH_${TAG}_sf0.1.json BENCH_${TAG}_sf1.json BENCH_${TAG}_sf5.json BENCH_${TAG}_sf20.json; do
  python - "$f" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
print(sys.argv[1], d.get("value"), "sec,", len(d.get("queries", {})), "queries,",
      "host_ratio", d.get("host_ratio"), "regr", list(d.get("regressions", {}) or []))
EOF
done
