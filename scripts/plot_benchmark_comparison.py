"""Plot PP-vs-DP benchmark comparison CSVs.

Counterpart of the reference's scripts/plot_benchmark_comparison.py:
reads the CSV written by scripts/benchmark_comparison.sh and renders
(1) a throughput bar chart, (2) a per-sample latency line chart, and
(3) a scaling-efficiency chart with the ideal-linear overlay, into
<outdir>/figures/.

Usage: python scripts/plot_benchmark_comparison.py <comparison.csv> [outdir]
"""

from __future__ import annotations

import csv
import os
import sys
from collections import defaultdict


def read_csv(path: str):
    rows = []
    with open(path) as f:
        for row in csv.DictReader(f):
            rows.append(
                {
                    "mode": row["mode"],
                    "devices": int(row["devices"]),
                    "first": float(row["first_sample_s"]),
                    "avg": float(row["avg_sample_s"]),
                    "thr": float(row["throughput_sps"]),
                }
            )
    return rows


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    csv_path = sys.argv[1]
    outdir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(csv_path) or ".", "figures"
    )
    os.makedirs(outdir, exist_ok=True)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = read_csv(csv_path)
    by_mode: dict[str, list] = defaultdict(list)
    for r in sorted(rows, key=lambda r: r["devices"]):
        by_mode[r["mode"]].append(r)

    labels = {"pipeline": "Step pipeline (PP)", "data_parallel": "Data parallel (DP)"}
    colors = {"pipeline": "#3a6ea5", "data_parallel": "#c1666b"}

    # 1. throughput bars
    fig, ax = plt.subplots(figsize=(7, 4.5))
    modes = list(by_mode)
    width = 0.8 / max(len(modes), 1)
    devices = sorted({r["devices"] for r in rows})
    for mi, mode in enumerate(modes):
        xs = [devices.index(r["devices"]) + mi * width for r in by_mode[mode]]
        ax.bar(xs, [r["thr"] for r in by_mode[mode]], width,
               label=labels.get(mode, mode), color=colors.get(mode))
    ax.set_xticks([i + width * (len(modes) - 1) / 2 for i in range(len(devices))])
    ax.set_xticklabels(devices)
    ax.set_xlabel("devices")
    ax.set_ylabel("throughput (samples/s)")
    ax.set_title("Throughput: step pipeline vs data parallel")
    ax.legend()
    fig.tight_layout()
    p1 = os.path.join(outdir, "throughput.png")
    fig.savefig(p1, dpi=120)

    # 2. per-sample latency
    fig, ax = plt.subplots(figsize=(7, 4.5))
    for mode in modes:
        ax.plot([r["devices"] for r in by_mode[mode]],
                [r["avg"] for r in by_mode[mode]],
                marker="o", label=labels.get(mode, mode), color=colors.get(mode))
    ax.set_xlabel("devices")
    ax.set_ylabel("steady-state s/sample")
    ax.set_title("Per-sample latency")
    ax.set_xscale("log", base=2)
    ax.legend()
    fig.tight_layout()
    p2 = os.path.join(outdir, "latency.png")
    fig.savefig(p2, dpi=120)

    # 3. scaling efficiency vs ideal
    fig, ax = plt.subplots(figsize=(7, 4.5))
    for mode in modes:
        base = by_mode[mode][0]
        xs = [r["devices"] for r in by_mode[mode]]
        speedup = [r["thr"] / base["thr"] * base["devices"] for r in by_mode[mode]]
        ax.plot(xs, speedup, marker="o", label=labels.get(mode, mode),
                color=colors.get(mode))
    ax.plot(devices, devices, "--", color="gray", label="ideal linear")
    ax.set_xlabel("devices")
    ax.set_ylabel("speedup vs 1 device")
    ax.set_title("Scaling efficiency")
    ax.legend()
    fig.tight_layout()
    p3 = os.path.join(outdir, "scaling.png")
    fig.savefig(p3, dpi=120)

    print(f"wrote {p1}\n{p2}\n{p3}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
