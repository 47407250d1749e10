"""A/B: signature-GATED rescue vs always-on graced rescue vs no rescue.

The r5 8-seed completion showed the always-on graced rescue converts
stalled seeds (s1 0.1515 -> 0.0899) but HURTS healthy seeds (s0
0.0703 -> 0.0829, s2 0.0724 -> 0.1059 vs their no-rescue runs): the 2%
patience bar fires on healthy slow-improvement plateaus, and each
false rescue costs a transient plus a diverged stream.

Treatment (benchmarks/tpu_runbook_r5_clsf.sh): signature-GATED rescue —
patience 60 (never fires on the 60-eval protocol) + ``--classify-blocks
5``, so the rescue fires ONLY on 5 consecutive flat evals matching the
measured broad-under-fit signature (avg-of-K >= 3x min-of-K, train ADE
tracking the avg — benchmarks/stall_diagnosis_r4m.json).  Expected:
healthy seeds keep their no-rescue trajectory (zero false fires),
stalled folds still convert.

Reports per seed x fold: best ADE, rescues (total / classifier-fired),
first-rescue epoch, across the three arms.

CAVEAT on the no_rescue arm: those artifacts predate the round-4
RNG-observer-effect fix (commit a7a88b6), so their training streams
differ from current code — the r4i "stalled seed" labels (s1 0.1515)
do not reproduce under current streams (the gated runs that fired ZERO
rescues reached 0.0615-0.0653, not the r4i plateaus).  The valid
same-stream comparison is always-graced vs gated, both at block 1000
on current code.

Usage: python benchmarks/clsf_rescue_ab.py \
           [--out benchmarks/clsf_rescue_ab_r5.json]
"""

from __future__ import annotations

import argparse
import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))
SCENES = ("eth", "hotel", "univ", "zara1", "zara2")

ARMS = {
    # seed: {arm: artifact}
    0: {"no_rescue": "ethucy_timematched_loo_r4afsocial_ema_floor02.json",
        "always": "ethucy_timematched_loo_r5gresc_s0.json",
        "gated": "ethucy_timematched_loo_r5gated_s0.json"},
    1: {"no_rescue": "ethucy_timematched_loo_r4afsocial_ema_floor02_s1.json",
        "always": "ethucy_timematched_loo_r5gresc_s1.json",
        "gated": "ethucy_timematched_loo_r5gated_s1.json"},
    2: {"no_rescue": "ethucy_timematched_loo_r4afsocial_ema_floor02_s2.json",
        "always": "ethucy_timematched_loo_r5gresc_s2.json",
        "gated": "ethucy_timematched_loo_r5gated_s2.json"},
}


def _fold_row(fold: dict) -> dict:
    rescues = fold.get("rescues", [])
    return {
        "best_ade": fold["best"]["ade_min20"],
        "n_rescues": len(rescues),
        "first_rescue_epoch": rescues[0] if rescues else None,
        "fired_by_classifier": fold.get("rescues_fired_by_classifier"),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    out = {}
    for seed, arms in ARMS.items():
        row = {}
        for arm, fname in arms.items():
            path = os.path.join(HERE, fname)
            if not os.path.exists(path):
                row[arm] = {"missing": fname}
                continue
            with open(path) as fh:
                d = json.load(fh)
            row[arm] = {
                "avg_best_ade": d["avg_best_ade_min20"],
                "avg_best_fde": d["avg_best_fde_min20"],
                "folds": {s: _fold_row(d[s]) for s in SCENES},
                "artifact": fname,
            }
        present = [a for a in row if "missing" not in row[a]]
        if {"always", "gated"} <= set(present):
            row["gated_minus_always_avg_ade"] = round(
                row["gated"]["avg_best_ade"]
                - row["always"]["avg_best_ade"], 4)
        if {"no_rescue", "gated"} <= set(present):
            row["gated_minus_no_rescue_avg_ade"] = round(
                row["gated"]["avg_best_ade"]
                - row["no_rescue"]["avg_best_ade"], 4)
            row["gated_false_fires_on_healthy"] = sum(
                row["gated"]["folds"][s]["n_rescues"] for s in SCENES
                if row["no_rescue"]["folds"][s]["best_ade"] < 0.1)
        out[f"seed{seed}"] = row

    print(json.dumps(out, indent=1))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
