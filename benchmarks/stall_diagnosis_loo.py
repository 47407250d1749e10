"""Classify LOO fold-level early-plateau stalls from diag curves.

The r4i/r4j 5-seed flagship-LOO matrix exposed fold-runs that sit flat
at eval ADE 0.14-0.22 from the first eval blocks with adversarial
losses indistinguishable from healthy runs (BASELINE.md).  The r4m
queue re-ran a stalled fold (seed-1 eth), a second stalled fold
(seed-1 hotel) and a healthy control (seed-0 eth) with the harness's
avg-of-K + train-ADE curve logging (benchmarks/ethucy_timematched.py)
— identical seeds/streams, so the stalls reproduce exactly.

Three competing mechanisms, and how the two free signals separate them:

  mode collapse      -> avg-of-K ~ min-of-K (no sample diversity)
  overfit            -> train ADE low, eval ADE high
  under-fit broad    -> train ADE ~ eval avg-of-K, BOTH high, avg >>
  equilibrium           min (diverse but inaccurate everywhere)

Usage:
    python benchmarks/stall_diagnosis_loo.py \
        [--out benchmarks/stall_diagnosis_r4m.json]
reads the diag artifacts written by the r4m runbook and prints one
summary row per run plus the verdict.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))

RUNS = [
    ("eth/seed1 (stalled)", "ethucy_timematched_diag_eth_s1.json"),
    ("hotel/seed1 (stalled)", "ethucy_timematched_diag_hotel_s1.json"),
    ("eth/seed0 (healthy)", "ethucy_timematched_diag_eth_s0.json"),
]


def summarize(fname: str) -> dict:
    with open(os.path.join(HERE, fname)) as fh:
        d = json.load(fh)
    curve = d["curve"]
    # drop blocks whose fields predate the diag logging (robustness)
    curve = [c for c in curve if "ade_avg20" in c]
    mins = np.array([c["ade_min20"] for c in curve])
    avgs = np.array([c["ade_avg20"] for c in curve])
    trains = np.array([c["train_ade"] for c in curve])
    half = len(curve) // 2
    return {
        "fold": d["fold"],
        "best_ade_min20": d["best"]["ade_min20"],
        "blocks": len(curve),
        # flatness: relative improvement of min-ADE, first->second half
        "min_first_half": round(float(mins[:half].mean()), 4),
        "min_second_half": round(float(mins[half:].mean()), 4),
        "avg_mean": round(float(avgs.mean()), 4),
        "train_mean": round(float(trains.mean()), 4),
        # the two classifier ratios
        "avg_over_min": round(float((avgs / mins).mean()), 2),
        "train_over_avg": round(float((trains / avgs).mean()), 2),
    }


def classify(rows: dict) -> str:
    """Classify each STALLED run from its computed ratios (the healthy
    control is context, not classified).  Thresholds: flat = <10%
    min-ADE improvement first->second half; collapse = avg-of-K within
    1.5x of min-of-K; overfit = train ADE under half the eval avg;
    otherwise broad under-fit (diverse samples, bad everywhere)."""
    verdicts = []
    for label, r in rows.items():
        if "missing" in r:
            verdicts.append(f"{label}: artifact missing ({r['missing']}) "
                            "— no classification")
            continue
        if "healthy" in label:
            continue
        improve = 1.0 - r["min_second_half"] / max(r["min_first_half"],
                                                   1e-9)
        if improve >= 0.10:
            verdicts.append(f"{label}: NOT STALLED in this re-run "
                            f"(min-ADE improved {improve:.0%} "
                            "first->second half)")
            continue
        if r["avg_over_min"] <= 1.5:
            mech = ("MODE COLLAPSE: avg-of-K ~ min-of-K "
                    f"({r['avg_over_min']}x) — the K samples carry no "
                    "diversity")
        elif r["train_over_avg"] <= 0.5:
            mech = ("OVERFIT: train ADE is "
                    f"{r['train_over_avg']}x the eval avg — good on "
                    "train, bad held-out")
        else:
            mech = ("BROAD-DISTRIBUTION UNDER-FIT equilibrium: samples "
                    f"stay diverse (avg/min {r['avg_over_min']}x) and "
                    "train ADE tracks the eval avg "
                    f"({r['train_over_avg']}x) — G emits a high-variance "
                    "distribution whose center never sharpens; the LSGAN "
                    "losses cannot see it, which is why the fresh-D "
                    "rescue converts it")
        verdicts.append(f"{label}: stalled, {mech}")
    return "  |  ".join(verdicts) if verdicts else "no runs to classify"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    rows = {}
    for label, fname in RUNS:
        try:
            rows[label] = summarize(fname)
        except FileNotFoundError:
            rows[label] = {"missing": fname}
    for label, r in rows.items():
        print(label, json.dumps(r))

    verdict = classify(rows)
    print("\nVERDICT:", verdict)
    if args.out:
        with open(args.out, "w") as fh:
            json.dump({"runs": rows, "verdict": verdict}, fh, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
