"""Figure: rescue-policy A/B on the flagship LOO matrix (BASELINE.md
"rescue matrix" tables, drawn from the artifacts).

Grouped bars — per seed (x), avg-best min-20 ADE over the 5 folds (y),
one bar per rescue policy where that (seed, policy) cell was measured:
no rescue (r4i/r4j), unbounded rescue (r4k), graced+capped rescue
(r4l, `--stall-grace 2 --stall-max-rescues 3`).  Categorical hues in
fixed slot order (blue/orange/aqua — the documented 3-slot all-pairs
validated combination), thin baseline-anchored bars with surface gaps,
selective direct labels (record cells only), recessive grid.

Direct labels annotate the overall record and worst cells only.

Usage: python benchmarks/fig_loo_rescue.py [--out figs/loo-rescue-ab.png]
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
# categorical slots 1-3 (documented all-pairs validated, light mode)
BLUE, ORANGE, AQUA = "#2a78d6", "#eb6834", "#1baf7a"

BASE = "ethucy_timematched_loo_r4afsocial_ema_floor02"
ARMS = [
    ("no rescue", BLUE,
     {0: f"{BASE}.json", 1: f"{BASE}_s1.json", 2: f"{BASE}_s2.json",
      3: f"{BASE}_s3.json", 4: f"{BASE}_s4.json"}),
    ("unbounded rescue", ORANGE,
     {s: f"{BASE}_rescue_s{s}.json" for s in (1, 3, 4, 5, 6)}),
    ("graced+capped rescue", AQUA,
     {s: f"{BASE}_gresc_s{s}.json" for s in (3, 5, 6, 7)}),
]


def avg_best(fname: str) -> float:
    with open(os.path.join(HERE, fname)) as fh:
        d = json.load(fh)
    folds = [v for v in d.values() if isinstance(v, dict) and "best" in v]
    return sum(f["best"]["ade_min20"] for f in folds) / len(folds)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "figs",
                                                  "loo-rescue-ab.png"))
    args = ap.parse_args()

    seeds = list(range(8))
    fig, ax = plt.subplots(figsize=(8.4, 3.4), dpi=160)
    fig.patch.set_facecolor(SURFACE)
    ax.set_facecolor(SURFACE)

    width = 0.26
    cells = []                       # (value, bar-x) across all arms
    for ai, (label, color, files) in enumerate(ARMS):
        xs, ys = [], []
        for s in seeds:
            if s in files and os.path.exists(os.path.join(HERE, files[s])):
                xs.append(s + (ai - 1) * (width + 0.02))
                ys.append(avg_best(files[s]))
        ax.bar(xs, ys, width=width, color=color, label=label, zorder=3,
               edgecolor=SURFACE, linewidth=1.0)
        cells.extend(zip(ys, xs))

    # selective direct labels: the overall record and the worst cell
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
    ax.set_title("Flagship LOO: rescue policy A/B — graced+capped rescue "
                 "converts the stalls\n(synthetic ETH/UCY, 30k epochs/fold; "
                 "lower is better; missing bar = cell not measured)",
                 color=INK, fontsize=9.5, loc="left", pad=10)
    ax.legend(frameon=False, fontsize=8, labelcolor=INK2, ncols=3,
              loc="upper right")
    fig.tight_layout()
    fig.savefig(args.out, facecolor=SURFACE)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
