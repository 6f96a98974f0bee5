"""PP x DP sweep: pipeline-stage vs data-parallel splits of one 8-device mesh.

Beyond the reference's 1-D PP-vs-DP comparison
(reference: scripts/benchmark_comparison.sh + benchmark_results CSVs): the
TPU build supports a combined 2-D (stage x data) mesh, where each data
column pipelines its own shard of the sample stream. This sweep runs every
(S, D) factorization of an 8-device mesh with S*D = 8 through
``vdpp_tpu.modes.benchmark --data-parallel-size`` on the virtual CPU mesh
and writes a CSV + figure into benchmark_results/.

Usage:
    python scripts/benchmark_2d_sweep.py [--model svd_tiny] [--steps 24]
        [--samples 16] [--out-dir benchmark_results]
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_case(stages: int, dp: int, args) -> dict:
    env = dict(os.environ)
    flags = [
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    flags.append("--xla_force_host_platform_device_count=8")
    env["XLA_FLAGS"] = " ".join(flags)
    cmd = [
        sys.executable, "-m", "vdpp_tpu.modes.benchmark",
        "--backend", "cpu", "--model", args.model,
        "--total-steps", str(args.steps),
        "--num-samples", str(args.samples), "--warmup-samples", "0",
        "--num-stages", str(stages), "--data-parallel-size", str(dp),
        "--fused",
    ]
    out = subprocess.run(
        cmd, env=env, cwd=REPO, capture_output=True, text=True, check=True
    ).stdout
    line = next(l for l in out.splitlines() if l.startswith("BENCHMARK_JSON="))
    return json.loads(line[len("BENCHMARK_JSON="):])


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="svd_tiny")
    ap.add_argument("--steps", type=int, default=24)
    ap.add_argument("--samples", type=int, default=16)
    ap.add_argument("--out-dir", default=os.path.join(REPO, "benchmark_results"))
    args = ap.parse_args()

    cases = [(8, 1), (4, 2), (2, 4), (1, 8)]
    rows = []
    for stages, dp in cases:
        t0 = time.perf_counter()
        r = run_case(stages, dp, args)
        print(
            f"S={stages} D={dp}: {r['throughput_samples_per_s']:.3f} samples/s, "
            f"steady {r['avg_sample_time_s']*1e3:.0f} ms, "
            f"bubble {r['bubble_fraction']:.3f} "
            f"({time.perf_counter()-t0:.0f}s wall)",
            flush=True,
        )
        rows.append({
            "num_stages": stages,
            "data_parallel_size": dp,
            "throughput_samples_per_s": r["throughput_samples_per_s"],
            "first_sample_time_s": r["first_sample_time_s"],
            "avg_sample_time_s": r["avg_sample_time_s"],
            "bubble_fraction": r["bubble_fraction"],
            "model": r["model"],
            "total_steps": r["total_steps"],
            "num_samples": r["num_samples_measured"],
        })

    os.makedirs(args.out_dir, exist_ok=True)
    stamp = time.strftime("%Y%m%d_%H%M%S")
    csv_path = os.path.join(args.out_dir, f"comparison_2d_{stamp}.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {csv_path}")

    fig_path = os.path.join(args.out_dir, "figures", f"comparison_2d_{stamp}.png")
    os.makedirs(os.path.dirname(fig_path), exist_ok=True)
    _plot(rows, fig_path, args)
    print(f"wrote {fig_path}")
    return 0


def _plot(rows, fig_path, args):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    labels = [f"{r['num_stages']}x{r['data_parallel_size']}\n(PP x DP)" for r in rows]
    thr = [r["throughput_samples_per_s"] for r in rows]
    lat = [r["first_sample_time_s"] for r in rows]

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(9, 3.6))
    bar_color = "#4269d0"  # single series: one restrained hue, no legend
    for ax, vals, title, unit in (
        (ax1, thr, "Steady throughput", "samples/s"),
        (ax2, lat, "First-sample latency (fill)", "s"),
    ):
        bars = ax.bar(labels, vals, color=bar_color, width=0.55)
        ax.bar_label(bars, fmt="%.2f", padding=2, fontsize=9)
        ax.set_title(f"{title} ({unit})", fontsize=11)
        ax.grid(axis="y", color="#e2e2e2", linewidth=0.7)
        ax.set_axisbelow(True)
        for spine in ("top", "right"):
            ax.spines[spine].set_visible(False)
        ax.margins(y=0.15)
    fig.suptitle(
        f"8-device mesh factorizations — {args.model}, {args.steps} steps, "
        f"{args.samples} samples (virtual CPU mesh)",
        fontsize=11,
    )
    fig.tight_layout()
    fig.savefig(fig_path, dpi=150)
    plt.close(fig)


if __name__ == "__main__":
    sys.exit(main())
