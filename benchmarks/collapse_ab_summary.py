"""Assemble the 16-seed gated-matrix summaries for BOTH classifier
versions (round-5 closing session).

v1 = the shipped under-fit-only gate: 16 measured artifacts
(ethucy_timematched_loo_r5gated_s{0..15}.json).

v2 = + the diversity-collapse gate.  The post-hoc replay of every
fold-run curve (collapse_gate_scan.py) proves v2 changes exactly two
fold-runs — s2/eth (fires @8000) and s9/eth (fires @9000); every other
fold fires in neither version (or, s4/hotel, fires identically via the
unchanged under-fit gate at the same epoch), and a no-fire run is
bit-identical under both versions because observe() consumes no RNG
(rescue keys are split only inside the fire branch,
benchmarks/ethucy_timematched.py:194).  The v2-effective matrix is
therefore the v1 artifacts with those two folds substituted by the
measured v2 re-runs (collapse_ab_s2eth_v2.json / collapse_ab_s9eth_v2.json).

Usage: python benchmarks/collapse_ab_summary.py \
           [--out benchmarks/loo_16seed_collapse_v2_r5.json]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
SCENES = ("eth", "hotel", "univ", "zara1", "zara2")
SUBS = {  # (seed, fold) -> v2 re-run artifact
    (2, "eth"): "collapse_ab_s2eth_v2.json",
    (9, "eth"): "collapse_ab_s9eth_v2.json",
}


def load_matrix(version):
    rows = {}
    for seed in range(16):
        with open(os.path.join(
                HERE, f"ethucy_timematched_loo_r5gated_s{seed}.json")) as fh:
            d = json.load(fh)
        folds = {}
        for s in SCENES:
            fold = d[s]
            if version == "v2" and (seed, s) in SUBS:
                with open(os.path.join(HERE, SUBS[(seed, s)])) as fh:
                    fold = json.load(fh)
            folds[s] = {"ade": fold["best"]["ade_min20"],
                        "fde": fold["best"]["fde_min20"],
                        "rescues": len(fold.get("rescues", [])),
                        "substituted": version == "v2"
                        and (seed, s) in SUBS}
        rows[seed] = {
            "folds": folds,
            "avg_best_ade": round(float(np.mean(
                [folds[s]["ade"] for s in SCENES])), 4),
            "avg_best_fde": round(float(np.mean(
                [folds[s]["fde"] for s in SCENES])), 4),
        }
    return rows


def stats(rows):
    ades = [r["avg_best_ade"] for r in rows.values()]
    fdes = [r["avg_best_fde"] for r in rows.values()]
    worst = max(rows, key=lambda s: rows[s]["avg_best_ade"])
    best = min(rows, key=lambda s: rows[s]["avg_best_ade"])
    return {
        "mean_avg_ade": round(float(np.mean(ades)), 4),
        "median_avg_ade": round(float(np.median(ades)), 4),
        "mean_avg_fde": round(float(np.mean(fdes)), 4),
        "median_avg_fde": round(float(np.median(fdes)), 4),
        "worst_seed": {"seed": worst,
                       "avg_ade": rows[worst]["avg_best_ade"],
                       "avg_fde": rows[worst]["avg_best_fde"]},
        "best_seed": {"seed": best,
                      "avg_ade": rows[best]["avg_best_ade"],
                      "avg_fde": rows[best]["avg_best_fde"]},
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out",
                    default=os.path.join(HERE,
                                         "loo_16seed_collapse_v2_r5.json"))
    args = ap.parse_args()

    v1 = load_matrix("v1")
    v2 = load_matrix("v2")
    out = {
        "protocol": "16-seed LOO matrix (seeds 0-7 = the policy-selection "
                    "set; 8-15 = out-of-sample), per-fold best min-20 "
                    "ADE/FDE of a 30k-epoch run at --block 1000, gated "
                    "rescue --ade-stall-recover -1 --ade-stall-classify 5",
        "v1_underfit_only": stats(v1),
        "v2_plus_collapse": stats(v2),
        "v2_substitutions": {f"s{s}/{f}": SUBS[(s, f)] for s, f in SUBS},
        "ab": {
            "s9_eth": {"v1_best_ade": 0.2722, "v2_best_ade": 0.0966,
                       "note": "the out-of-sample stall: collapse fire "
                               "@9000 converts a 25k-epoch flat stall"},
            "s2_eth": {"v1_best_ade": 0.0782, "v2_best_ade": 0.0966,
                       "note": "a collapse phase that self-recovered "
                               "under v1; the v2 fire @8000 pre-empted "
                               "that recovery (the measured cost of the "
                               "gate, ~10x smaller than its benefit)"},
        },
        "safety": "replay of 80 gated fold-run curves: healthy folds "
                  "never exceed a 4-eval stalled-collapse streak "
                  "(s13/univ, which ran the v2 gate LIVE and ended "
                  "healthy at 0.0651); patience 5 fires only on the "
                  "two true collapse episodes",
        "per_seed_v1": v1,
        "per_seed_v2": v2,
    }
    for k in ("v1_underfit_only", "v2_plus_collapse"):
        print(k, json.dumps(out[k]))
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
