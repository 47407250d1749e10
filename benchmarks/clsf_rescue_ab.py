"""A/B: classifier-triggered rescue vs patience-only graced rescue.

Controls: the graced-policy LOO artifacts (seed 1 from the r5 8-seed
completion, seed 3 from r4l).  Treatment: identical arm + graced policy
plus ``--classify-blocks 2`` — the broad-under-fit signature
(avg-of-K >= 3x min-of-K, train ADE tracking the avg, flat min) fires
the rescue after 2 matching evals instead of the full 5-block patience
(benchmarks/tpu_runbook_r5_clsf.sh).

Reports per fold: first-rescue epoch (detection latency), rescues
fired / fired-by-classifier, best ADE — and the seed-level avg.  The
claim under test (VERDICT-r4 next #5): detection latency down at equal
compute, no regression on healthy folds.

Usage: python benchmarks/clsf_rescue_ab.py \
           [--out benchmarks/clsf_rescue_ab_r5.json]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
SCENES = ("eth", "hotel", "univ", "zara1", "zara2")

PAIRS = {
    1: ("ethucy_timematched_loo_r5gresc_s1.json",
        "ethucy_timematched_loo_r5clsf_s1.json"),
    3: ("ethucy_timematched_loo_r4afsocial_ema_floor02_gresc_s3.json",
        "ethucy_timematched_loo_r5clsf_s3.json"),
}


def _fold_row(fold: dict) -> dict:
    rescues = fold.get("rescues", [])
    return {
        "best_ade": fold["best"]["ade_min20"],
        "best_fde": fold["best"]["fde_min20"],
        "n_rescues": len(rescues),
        "first_rescue_epoch": rescues[0] if rescues else None,
        "fired_by_classifier": fold.get("rescues_fired_by_classifier"),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    out = {}
    for seed, (ctrl_f, trt_f) in PAIRS.items():
        row = {}
        for arm, fname in (("control", ctrl_f), ("classify", trt_f)):
            path = os.path.join(HERE, fname)
            if not os.path.exists(path):
                row[arm] = {"missing": fname}
                continue
            with open(path) as fh:
                d = json.load(fh)
            row[arm] = {
                "folds": {s: _fold_row(d[s]) for s in SCENES},
                "avg_best_ade": d["avg_best_ade_min20"],
                "avg_best_fde": d["avg_best_fde_min20"],
                "artifact": fname,
            }
        if all("missing" not in row[a] for a in ("control", "classify")):
            lat = {}
            for s in SCENES:
                c = row["control"]["folds"][s]["first_rescue_epoch"]
                t = row["classify"]["folds"][s]["first_rescue_epoch"]
                lat[s] = {"control": c, "classify": t,
                          "earlier_by_epochs":
                              (c - t) if (c and t) else None}
            row["detection_latency"] = lat
            row["delta_avg_best_ade"] = round(
                row["classify"]["avg_best_ade"]
                - row["control"]["avg_best_ade"], 4)
        out[f"seed{seed}"] = row

    print(json.dumps(out, indent=1))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
