"""Figure: always-graced vs signature-GATED rescue, full 8-seed LOO.

Grouped bars — per seed (x), avg-best min-20 ADE over the 5 folds (y),
both arms measured at every seed on one code version and one eval
cadence (block 1000): always = patience 5 / grace 2 / cap 3 (the r4l
policy); gated = `--ade-stall-recover -1 --ade-stall-classify 5`
(rescue fires only on the measured broad-under-fit signature).  Gated
wins all 8 seeds with exactly one rescue fired across 40 fold-runs
(BASELINE.md r5).  Same visual conventions as fig_loo_rescue.py.

Usage: python benchmarks/fig_loo_gated.py [--out figs/loo-gated-ab.png]
"""

from __future__ import annotations

import argparse
import json
import os

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

SURFACE, INK, INK2, GRID = "#fcfcfb", "#0b0b0b", "#52514e", "#e8e7e4"
BLUE, AQUA = "#2a78d6", "#1baf7a"

ARMS = [
    ("always-on graced rescue", BLUE,
     {s: f"ethucy_timematched_loo_r5gresc_s{s}.json" for s in range(8)}),
    ("signature-gated rescue (shipped: --recipe loo)", AQUA,
     {s: f"ethucy_timematched_loo_r5gated_s{s}.json" for s in range(8)}),
]


def avg_best(fname: str) -> float:
    with open(os.path.join(HERE, fname)) as fh:
        d = json.load(fh)
    folds = [v for v in d.values() if isinstance(v, dict) and "best" in v]
    return sum(f["best"]["ade_min20"] for f in folds) / len(folds)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "figs",
                                                  "loo-gated-ab.png"))
    args = ap.parse_args()

    seeds = list(range(8))
    fig, ax = plt.subplots(figsize=(8.4, 3.4), dpi=160)
    fig.patch.set_facecolor(SURFACE)
    ax.set_facecolor(SURFACE)

    width = 0.34
    cells = []
    for ai, (label, color, files) in enumerate(ARMS):
        xs = [s + (ai - 0.5) * (width + 0.02) for s in seeds]
        ys = [avg_best(files[s]) for s in seeds]
        ax.bar(xs, ys, width=width, color=color, label=label, zorder=3,
               edgecolor=SURFACE, linewidth=1.0)
        cells.extend(zip(ys, xs))

    for y, x in (min(cells), max(cells)):
        ax.annotate(f"{y:.3f}", (x, y), xytext=(0, 3),
                    textcoords="offset points", ha="center",
                    fontsize=7.5, color=INK2)

    ax.set_xticks(seeds)
    ax.set_xticklabels([str(s) for s in seeds], color=INK2, fontsize=8.5)
    ax.set_xlabel("seed", color=INK2, fontsize=9)
    ax.set_ylabel("avg best min-20 ADE (5 folds)", color=INK2, fontsize=9)
    ax.tick_params(colors=INK2, length=0)
    ax.grid(axis="y", color=GRID, linewidth=0.8, zorder=0)
    for sp in ax.spines.values():
        sp.set_visible(False)
    ax.set_title("Full 8-seed LOO: gated rescue wins every seed "
                 "(mean 0.0657 vs 0.0717, worst 0.0686 vs 0.0921)\n"
                 "(synthetic ETH/UCY, 30k epochs/fold, one code version; "
                 "lower is better)",
                 color=INK, fontsize=9.5, loc="left", pad=10)
    ax.legend(frameon=False, fontsize=8, labelcolor=INK2, ncols=2,
              loc="upper left")
    fig.tight_layout()
    fig.savefig(args.out, facecolor=SURFACE)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
