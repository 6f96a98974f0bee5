#!/usr/bin/env bash
# Pipeline-vs-data-parallel comparison sweep (counterpart of the
# reference's scripts/benchmark_comparison.sh): for each device count,
# run the pipeline benchmark and the DP baseline with identical settings
# and write a unified CSV consumed by scripts/plot_benchmark_comparison.py.
set -euo pipefail

OUTDIR="${1:-benchmark_results}"
BACKEND="${2:-cpu}"
MODEL="${3:-dummy}"
STEPS="${4:-32}"
SAMPLES="${5:-8}"
mkdir -p "$OUTDIR"
STAMP=$(date +%Y%m%d_%H%M%S)
CSV="$OUTDIR/comparison_${STAMP}.csv"
echo "mode,devices,model,total_steps,num_samples,first_sample_s,avg_sample_s,throughput_sps" > "$CSV"

export XLA_FLAGS="${XLA_FLAGS:---xla_force_host_platform_device_count=8}"

# The CSV mode label comes from the BENCHMARK_JSON itself (r["mode"]).
append_row() {
  python - "$CSV" <<EOF
import json, sys
r = json.loads('''$1''')
row = [r["mode"], r["world_size"], r["model"], r["total_steps"],
       r["num_samples_measured"], r["first_sample_time_s"],
       r["avg_sample_time_s"], r["throughput_samples_per_s"]]
with open(sys.argv[1], "a") as f:
    f.write(",".join(str(x) for x in row) + "\n")
EOF
}

for NDEV in 1 2 4 8; do
  echo "=== $NDEV devices: pipeline ===" >&2
  PP=$(python -m vdpp_tpu.modes.benchmark \
      --backend "$BACKEND" --model "$MODEL" --num-stages "$NDEV" \
      --total-steps "$STEPS" --num-samples "$SAMPLES" --warmup-samples 1 \
      2>/dev/null | grep '^BENCHMARK_JSON=' | sed 's/^BENCHMARK_JSON=//')
  append_row "$PP"

  echo "=== $NDEV devices: data-parallel ===" >&2
  DP=$(python -m vdpp_tpu.modes.benchmark_data_parallel \
      --backend "$BACKEND" --model "$MODEL" --num-devices "$NDEV" \
      --total-steps "$STEPS" --num-samples "$SAMPLES" \
      2>/dev/null | grep '^BENCHMARK_JSON=' | sed 's/^BENCHMARK_JSON=//')
  append_row "$DP"
done

echo "wrote $CSV" >&2
cat "$CSV"
