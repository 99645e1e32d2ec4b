#!/bin/bash
# Scaling-efficiency campaign: 3 fresh-JVM invocations per side (pinned
# taskset inside scaling_bench.py --single), sides interleaved so slow host
# drift hits both equally. Combine with:
#   python scaling_bench.py --from-json lo1.json,lo2.json,lo3.json \
#                           hi1.json,hi2.json,hi3.json
set -e
LOW=${LOW:-8}
HIGH=${HIGH:-32}
MULT=${MULT:-240}
TEXTREP=${TEXTREP:-16}
OUT=${OUT:-/tmp/scale_r2}
mkdir -p "$OUT"
cd /root/repo
kill_spark() {
  pkill -9 java 2>/dev/null || true
  pkill -9 -f pyspark.daemon 2>/dev/null || true
  sleep 2
}
kill_spark
for i in 1 2 3; do
  for side in lo hi; do
    cpus=$LOW; [ "$side" = hi ] && cpus=$HIGH
    echo "=== invocation $i side $side (${cpus} cores) $(date +%T) ==="
    python scaling_bench.py --single "$cpus" --multiplier "$MULT" \
      --textrep "$TEXTREP" --reps 2 > "$OUT/${side}${i}.json"
    cat "$OUT/${side}${i}.json"
    kill_spark
  done
done
python scaling_bench.py --from-json \
  "$OUT/lo1.json,$OUT/lo2.json,$OUT/lo3.json" \
  "$OUT/hi1.json,$OUT/hi2.json,$OUT/hi3.json"
echo "=== campaign done $(date +%T) ==="
