"""Benchmark charts from benchmark_archs.py CSVs.

Parity: reference scripts/benchmarking/generate_charts.py (fps-vs-quality
scatter with VRAM-scaled markers). Quality columns are optional here — with
only speed data the chart plots fps vs parameter count; add a `psnr` column
(e.g. from scripts/metrics/calculate_psnr_ssim.py runs) to get the
fps-vs-PSNR frontier the reference draws.

    python scripts/benchmarking/benchmark_archs.py --csv bench.csv
    python scripts/benchmarking/generate_charts.py bench.csv --out chart.png
"""

from __future__ import annotations

import argparse
import csv


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("csv", help="CSV from benchmark_archs.py")
    ap.add_argument("--out", default="benchmark_chart.png")
    ap.add_argument("--title", default=None)
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    with open(args.csv, newline="") as f:
        rows = list(csv.DictReader(f))
    if not rows:
        raise SystemExit("empty csv")

    fps = np.array([float(r["fps"]) for r in rows])
    names = [r["arch"] for r in rows]
    has_psnr = "psnr" in rows[0] and all(r.get("psnr") for r in rows)
    ys = (
        np.array([float(r["psnr"]) for r in rows])
        if has_psnr
        else np.array([float(r["params"]) / 1e6 for r in rows])
    )
    peaks = np.array(
        [float(r["peak_gb"]) if r.get("peak_gb") else 0.1 for r in rows]
    )
    sizes = np.interp(peaks, (peaks.min(), max(peaks.max(), peaks.min() + 1e-9)),
                      (40, 1200))

    plt.figure(figsize=(10, 6), dpi=200)
    colors = plt.cm.tab20(np.linspace(0, 1, len(rows)))
    for i, name in enumerate(names):
        plt.scatter(fps[i], ys[i], s=sizes[i], color=colors[i], alpha=0.35)
        plt.scatter(fps[i], ys[i], s=18, color=colors[i])
        plt.annotate(name, (fps[i], ys[i]), fontsize=7,
                     xytext=(4, 4), textcoords="offset points")
    plt.xscale("log")
    if not has_psnr:
        plt.yscale("log")
    plt.xlabel("inference FPS (log)")
    plt.ylabel("PSNR (dB)" if has_psnr else "parameters (M, log)")
    plt.title(args.title or ("Speed vs quality" if has_psnr else "Speed vs size"))
    plt.grid(alpha=0.3)
    plt.tight_layout()
    plt.savefig(args.out)
    print(f"wrote {args.out} ({len(rows)} archs)")


if __name__ == "__main__":
    main()
