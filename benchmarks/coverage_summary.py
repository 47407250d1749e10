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
    instead of appearing as opaque JSON keys.

    Every override VALUE must be represented: recognized keys at their
    canonical recipe values map to the short tags; any other value is
    surfaced verbatim (`key=value`) so two different configurations can
    never alias into one table row (round-4 review finding)."""
    parts = ["robust1"]
    rep = set()     # keys whose value the emitted tags fully represent

    def canon(key, value, tag):
        """Mark `key` represented when it is absent or == `value` (part of
        the robust1 base / the named tag); emit `tag` when == value."""
        if key not in ov:
            rep.add(key)
        elif ov[key] == value:
            rep.add(key)
            if tag:
                parts.append(tag)

    canon("lr_d", 5e-4, "")                 # robust1 base, silent
    canon("d_lr_decay_rate", 0.7, "")
    canon("d_lr_decay_steps", 10000, "")
    iw = ov.get("loss_info_w", 1.0)
    if iw == 2.0:
        parts.append("info2")
    elif iw != 1.0:
        parts.append(f"info{iw:g}")
    rep.add("loss_info_w")
    if ov.get("d_input_noise") == 0.05:
        # steps vary with run length (40000, or -1 = whole run) — both
        # mean "annealed over the run", the inoise2 tag
        parts.append("inoise2" if ov.get("d_input_noise_steps")
                     else "inoise")
        rep.update(("d_input_noise", "d_input_noise_steps"))
    elif ov.get("d_input_noise"):
        parts.append(f"inoise{ov['d_input_noise']:g}"
                     f"x{ov.get('d_input_noise_steps', 0)}")
        rep.update(("d_input_noise", "d_input_noise_steps"))
    for key, tag in (("agent_frame", "af"), ("use_social", "social"),
                     ("mb_std", "mbstd")):
        if ov.get(key):
            parts.append(tag)
        rep.add(key)                        # boolean: presence == value
    if ov.get("hidden_size") == 128:
        parts.append("h128")                # tag names the scaled triple
        rep.add("hidden_size")
        canon("social_feature_size", 128, "")
        canon("noise_len", 64, "")
    ema = ov.get("g_ema_decay")
    if ema == 0.999:
        parts.append("ema")
    elif ema:
        parts.append(f"ema{ema:g}")
    rep.add("g_ema_decay")
    if ov.get("loss_info_w_end"):
        parts.append(f"infosched{ov['loss_info_w_end']:g}")
        rep.update(("loss_info_w_end", "loss_info_w_steps"))
    for key, tag in (("ms_weight", "ms"), ("ds_weight", "ds"),
                     ("ds_tau", "tau"), ("ds_k", "k")):
        if ov.get(key):
            parts.append(f"{tag}{ov[key]:g}")
        rep.add(key)
    extra = sorted(set(ov) - rep)
    parts += [f"{k}={ov[k]}" for k in extra]
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
