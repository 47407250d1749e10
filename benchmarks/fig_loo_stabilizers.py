"""Figure: per-fold best min-20 ADE across the round-4 LOO stabilizer
arms (BASELINE.md "LOO stabilizer A/B" table, drawn from the artifacts).

Small multiples — one panel per fold, single-hue bars over the arm
progression (world control → flagship composition → stabilizer levers).
Bars whose run diverges AFTER the best checkpoint carry a dagger.

Usage: python benchmarks/fig_loo_stabilizers.py [--out figs/loo-stabilizer-ab.png]
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
FOLDS = ["eth", "hotel", "univ", "zara1", "zara2"]

# (label, artifact, folds live under "folds"?, set of folds that diverge
#  after their best checkpoint — annotated with a dagger)
ARMS = [
    ("world", "ethucy_timematched_loo.json", True, set()),
    ("af+social", "ethucy_timematched_loo_r4afsocial.json", False, {"univ"}),
    ("+ema", "ethucy_timematched_loo_r4afsocial_ema.json", False, {"univ"}),
    ("+const-σ", "ethucy_timematched_loo_r4afsocial_constinoise.json",
     False, set()),
    ("+ema+const-σ",
     "ethucy_timematched_loo_r4afsocial_ema_constinoise.json", False, set()),
    ("+ema+anneal-σ",
     "ethucy_timematched_loo_r4afsocial_ema_annealinoise.json", False, set()),
    ("+ema+σ-floor",
     "ethucy_timematched_loo_r4afsocial_ema_floor02.json", False, set()),
]

# dataviz defaults (light mode): surface/ink tokens + one categorical hue
SURFACE, INK, INK2, BLUE = "#fcfcfb", "#0b0b0b", "#52514e", "#2a78d6"


def load_arm(fname: str, nested: bool) -> dict:
    with open(os.path.join(HERE, fname)) as fh:
        d = json.load(fh)
    if nested:
        d = d["folds"]
    return {f: d[f]["best"]["ade_min20"] for f in FOLDS}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "figs",
                                                  "loo-stabilizer-ab.png"))
    args = ap.parse_args()

    arms = [(label, load_arm(f, nested), div)
            for label, f, nested, div in ARMS]

    fig, axes = plt.subplots(1, len(FOLDS), figsize=(13, 3.1), sharey=True)
    fig.patch.set_facecolor(SURFACE)
    for ax, fold in zip(axes, FOLDS):
        ax.set_facecolor(SURFACE)
        vals = [a[1][fold] for a in arms]
        xs = range(len(arms))
        ax.bar(xs, vals, width=0.62, color=BLUE, zorder=3)
        for x, v, (label, _, div) in zip(xs, vals, arms):
            mark = "†" if fold in div else ""
            ax.text(x, v + 0.012, f"{v:.2f}{mark}", ha="center",
                    va="bottom", fontsize=7.2, color=INK2)
        ax.set_title(fold, fontsize=10, color=INK)
        ax.set_xticks(list(xs))
        ax.set_xticklabels([a[0] for a in arms], fontsize=6.6,
                           color=INK2, rotation=32, ha="right")
        ax.tick_params(axis="y", labelsize=7, colors=INK2, length=0)
        ax.grid(axis="y", color="#e8e7e3", linewidth=0.7, zorder=0)
        for s in ("top", "right", "left"):
            ax.spines[s].set_visible(False)
        ax.spines["bottom"].set_color("#d8d7d2")
        ax.set_ylim(0, 0.58)
    axes[0].set_ylabel("best min-20 ADE (lower = better)", fontsize=8,
                       color=INK2)
    fig.suptitle("ETH/UCY synthetic LOO: flagship composition + stabilizer "
                 "levers († = run diverges after its best checkpoint)",
                 fontsize=10.5, color=INK, y=1.02)
    fig.tight_layout()
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    fig.savefig(args.out, dpi=160, bbox_inches="tight",
                facecolor=SURFACE)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
