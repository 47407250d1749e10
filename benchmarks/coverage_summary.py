"""Summarize coverage_robustness/ensemble artifacts into one ranked table.

Reads every benchmarks/coverage_*<glob>*.json, groups rows by
(toy, recipe), and prints per-recipe seed lists with worst/mean under both
scorings (final and mean-of-last-5) — the judge's protocol view.

Usage:
    python benchmarks/coverage_summary.py [--glob r3_tpu] [--toy big]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re

HERE = os.path.dirname(os.path.abspath(__file__))


def _recipe_name(ov: dict) -> str:
    """Canonical recipe name from ensemble overrides, matching the
    coverage_robustness RECIPES naming — so the 8-seed protocol's
    ensemble rows (seeds 3-7) MERGE with the cli-train rows (seeds 0-2)
    instead of appearing as opaque JSON keys."""
    parts = ["robust1"]
    if ov.get("loss_info_w", 1.0) == 2.0:
        parts.append("info2")
    if ov.get("d_input_noise") == 0.05 and ov.get("d_input_noise_steps"):
        parts.append("inoise2")
    elif ov.get("d_input_noise"):
        parts.append("inoise")
    if ov.get("agent_frame"):
        parts.append("af")
    if ov.get("use_social"):
        parts.append("social")
    if ov.get("mb_std"):
        parts.append("mbstd")
    if ov.get("hidden_size") == 128:
        parts.append("h128")
    if ov.get("g_ema_decay"):
        parts.append("ema")
    if ov.get("loss_info_w_end"):
        parts.append("infosched")
    if ov.get("ms_weight"):
        parts.append("ms")
    if ov.get("ds_weight"):
        parts.append("ds")
    known = {"loss_info_w", "d_input_noise", "d_input_noise_steps",
             "agent_frame", "use_social", "mb_std", "hidden_size",
             "g_ema_decay", "loss_info_w_end", "loss_info_w_steps",
             "ms_weight", "ds_weight", "ds_tau", "ds_k", "lr_d",
             "d_lr_decay_rate", "d_lr_decay_steps",
             "social_feature_size", "noise_len"}
    extra = sorted(set(ov) - known)
    if extra:
        parts.append("?" + ",".join(extra))
    return "+".join(parts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--glob", default="", help="substring filter on filenames")
    ap.add_argument("--toy", default="", help="filter: small|big")
    args = ap.parse_args()

    rows = {}  # (toy, recipe) -> {seed: (final, last5)}
    for path in sorted(glob.glob(os.path.join(HERE, "coverage_*.json"))):
        if args.glob and args.glob not in os.path.basename(path):
            continue
        try:
            with open(path) as fh:
                data = json.load(fh)
        except Exception:
            continue
        if "seeds" in data:  # ensemble artifact
            toy = data.get("toy", "?")
            recipe = _recipe_name(data.get("overrides", {}))
            for seed, r in data["seeds"].items():
                rows.setdefault((toy, recipe), {})[int(seed)] = (
                    r.get("final_coverage"), r.get("mean_last5_coverage"),
                    os.path.basename(path))
            continue
        for key, r in data.items():  # robustness artifact
            m = re.match(r"(\w+)/(.+)/seed(\d+)$", str(key))
            if not m or not isinstance(r, dict) or "final_coverage" not in r:
                continue
            toy, recipe, seed = m.group(1), m.group(2), int(m.group(3))
            rows.setdefault((toy, recipe), {})[seed] = (
                r["final_coverage"], r.get("mean_last5_coverage"),
                os.path.basename(path))

    def fmt(v):
        return "  -  " if v is None else f"{v:.3f}"

    out = []
    for (toy, recipe), seeds in rows.items():
        if args.toy and toy != args.toy:
            continue
        finals = [v[0] for v in seeds.values() if v[0] is not None]
        last5s = [v[1] for v in seeds.values() if v[1] is not None]
        src = sorted({v[2] for v in seeds.values()})
        out.append((min(last5s) if last5s else -1, toy, recipe, seeds,
                    finals, last5s, src))
    out.sort(reverse=True)
    for _, toy, recipe, seeds, finals, last5s, src in out:
        ss = ",".join(str(s) for s in sorted(seeds))
        print(f"{toy:5s} {recipe}")
        print(f"      seeds [{ss}]  "
              f"final worst/mean {fmt(min(finals))}/{fmt(sum(finals)/len(finals))}  "
              f"last5 worst/mean {fmt(min(last5s) if last5s else None)}/"
              f"{fmt(sum(last5s)/len(last5s) if last5s else None)}  "
              f"({'; '.join(src)})")


if __name__ == "__main__":
    main()
