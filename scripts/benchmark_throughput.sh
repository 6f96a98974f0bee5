#!/usr/bin/env bash
# Throughput sweep over stage counts (counterpart of the reference's
# scripts/benchmark_throughput.sh): runs the pipeline benchmark for
# NSTAGES in {1,2,4,8}, extracts the BENCHMARK_JSON line, and derives a
# fill/steady/throughput CSV.
#
# Usage: scripts/benchmark_throughput.sh [outdir] [backend] [model]
#   backend: cpu (virtual 8-device mesh, default) | tpu
set -euo pipefail

OUTDIR="${1:-benchmark_results}"
BACKEND="${2:-cpu}"
MODEL="${3:-dummy}"
STEPS="${4:-32}"
SAMPLES="${5:-8}"
mkdir -p "$OUTDIR"
STAMP=$(date +%Y%m%d_%H%M%S)
CSV="$OUTDIR/throughput_${STAMP}.csv"
echo "stages,model,total_steps,num_samples,fill_s,steady_s,throughput_sps,bubble" > "$CSV"

export XLA_FLAGS="${XLA_FLAGS:---xla_force_host_platform_device_count=8}"

for NSTAGES in 1 2 4 8; do
  echo "=== $NSTAGES stages ===" >&2
  LINE=$(python -m vdpp_tpu.modes.benchmark \
      --backend "$BACKEND" --model "$MODEL" \
      --num-stages "$NSTAGES" --total-steps "$STEPS" \
      --num-samples "$SAMPLES" --warmup-samples 1 2>/dev/null \
      | grep '^BENCHMARK_JSON=' | head -1 | sed 's/^BENCHMARK_JSON=//')
  python - "$NSTAGES" "$MODEL" "$CSV" <<EOF
import json, sys
r = json.loads('''$LINE''')
row = [sys.argv[1], sys.argv[2], r["total_steps"], r["num_samples_measured"],
       r["first_sample_time_s"], r["avg_sample_time_s"],
       r["throughput_samples_per_s"], r.get("bubble_fraction", "")]
with open(sys.argv[3], "a") as f:
    f.write(",".join(str(x) for x in row) + "\n")
EOF
done

echo "wrote $CSV" >&2
cat "$CSV"
