"""Quality-vs-iteration parity on the toy dataset: ours vs the ACTUAL
reference trained on the SAME npz (VERDICT r1 "what's missing" #2).

Both implementations dump predictions in the same schema (ours is
byte-compatible by design, io/dumps.py); both dump the first held-out
scene batch.  This script walks both dump trees and computes, at every
common epoch, on the SAME first-8 test samples and first K=20 samples:

- toy mode coverage (eval.stats.toy_mode_coverage),
- EMD + 1-NN two-sample accuracy vs the real toy distribution
  (calc_statistics.py:7-66 semantics),
- min-of-20 ADE/FDE against the dumped ground truth (world units).

Usage:
    python benchmarks/toy_quality_compare.py \
        --ref-dir <sandbox>/medium/hotel/socialWays \
        --ours-dir /tmp/ours_toy_dumps/hotel/socialWays \
        --toy-npz /tmp/ref_toy768.npz --out benchmarks/toy_quality_parity.json
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from socialways_tpu.eval.stats import (  # noqa: E402
    compute_1nn,
    compute_wasserstein,
    load_real_samples,
    toy_mode_coverage,
)

N_PED = 8     # first held-out scene batch (one sample per toy condition)
K = 20


def epoch_dirs(root: str):
    out = {}
    for d in glob.glob(os.path.join(root, "*")):
        base = os.path.basename(d)
        if base.isdigit():
            files = [f for f in glob.glob(os.path.join(d, "*.npz"))
                     if "stats" not in f]
            if files:
                out[int(base)] = sorted(files)[0]
    return out


def dump_metrics(npz_path: str, reals: np.ndarray) -> dict:
    d = np.load(npz_path)
    obs = d["obsvs"][:N_PED]
    pk = d["preds_our"][:K, :N_PED, :, :2]
    gtt = d["preds_gtt"][:N_PED]

    fake = np.concatenate(
        [np.broadcast_to(obs[None], (pk.shape[0],) + obs.shape), pk],
        axis=2)
    r = reals[:K, :N_PED]
    err = np.linalg.norm(pk - gtt[None], axis=-1)        # [K, N, T]
    return {
        "coverage": round(toy_mode_coverage(obs, pk), 4),
        "emd": round(float(compute_wasserstein(r, fake, obs.shape[1])), 4),
        "one_nn": round(float(compute_1nn(r, fake, obs.shape[1])[0]), 4),
        "ade_min20": round(float(err.mean(-1).min(0).mean()), 4),
        "fde_min20": round(float(err[..., -1].min(0).mean()), 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref-dir", required=True)
    ap.add_argument("--ours-dir", required=True)
    ap.add_argument("--toy-npz", required=True)
    ap.add_argument("--every", type=int, default=50)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    reals = load_real_samples(args.toy_npz, group=N_PED)
    ref = epoch_dirs(args.ref_dir)
    ours = epoch_dirs(args.ours_dir)
    common = sorted(e for e in ref if e in ours and e % args.every == 0)

    result = {"epochs": common, "reference": {}, "ours": {}}
    for e in common:
        result["reference"][e] = dump_metrics(ref[e], reals)
        result["ours"][e] = dump_metrics(ours[e], reals)

    def summary(side):
        rows = [result[side][e] for e in common]
        if not rows:
            return {}
        return {
            "best_coverage": max(r["coverage"] for r in rows),
            "final_coverage": rows[-1]["coverage"],
            "best_emd": min(r["emd"] for r in rows),
            "final_emd": rows[-1]["emd"],
            "best_ade_min20": min(r["ade_min20"] for r in rows),
            "final_ade_min20": rows[-1]["ade_min20"],
        }

    result["summary"] = {"reference": summary("reference"),
                         "ours": summary("ours")}
    print(json.dumps(result["summary"], indent=1))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(result, fh, indent=1)


if __name__ == "__main__":
    main()
