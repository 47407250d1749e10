"""Post-hoc validation of the diversity-collapse classifier gate (r5).

Replays every eval curve recorded in the round-5 LOO runbook logs
through the StallTracker EXACTLY as the gated policy runs it
(--ade-stall-recover -1 --ade-stall-classify 5: classify-only, grace 2,
max 3), and reports for each fold-run:

  * the maximum consecutive stalled-eval streak matching the COLLAPSE
    signature (avg-of-K <= 1.2 x min-of-K while not improving), and
  * whether the extended (v2) classifier would have fired where the
    shipped (v1, under-fit-only) classifier did not.

This answers two questions before shipping the gate:
  1. false-positive safety: does any HEALTHY fold-run accumulate >= 5
     consecutive stalled-collapse evals?  (Transient near-collapse
     ratios do occur during stall escapes — e.g. seed-6/eth ratio 1.12
     for exactly one eval — so the patience must cover them.)
  2. which folds the v2 gate would change, i.e. which artifacts of the
     16-seed gated matrix stay bit-identical under v2 (no fire in
     either) and which need a re-run.

Usage: python benchmarks/collapse_gate_scan.py [logs...]
       (default: the three r5 gated runbook logs)
"""

from __future__ import annotations

import ast
import re
import sys
import os

HERE = os.path.dirname(os.path.abspath(__file__))

DEFAULT_LOGS = [
    "tpu_runbook_r5_loo_tail.log",      # gated seeds 0/1/2 + always arm
    "tpu_runbook_r5_gated_tail.log",    # gated seeds 3-7
    "tpu_runbook_r5_gated_ext.log",     # gated seeds 8-15 (out-of-sample)
]

FOLDS = ("eth", "hotel", "univ", "zara1", "zara2")


def parse_runs(path):
    """Split a runbook log into (label, curve) runs.  A run starts at a
    `+ python benchmarks/ethucy_timematched.py ... --seed S` line; folds
    within a run are delimited by the eval-epoch counter resetting.
    Logs without launch lines (seed unknown) label seeds s?0, s?1, ...
    in order of appearance; the fold cycle is always eth..zara2."""
    runs = []
    seed, fold_i, curve = None, 0, []
    last_epoch = 0
    anon = 0

    def label():
        nonlocal seed, anon, fold_i
        if seed is None and fold_i % 5 == 0 and fold_i > 0:
            anon += 1
        s = seed if seed is not None else f"?{anon}"
        return f"s{s}/{FOLDS[fold_i % 5]}"

    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if line.startswith("+ python") and "ethucy_timematched" in line:
                if curve:
                    runs.append((label(), curve))
                m = re.search(r"--seed (\d+)", line)
                seed = int(m.group(1)) if m else None
                fold_i, curve, last_epoch = 0, [], 0
                continue
            if line.startswith("{'epoch'"):
                d = ast.literal_eval(line)
                if d["epoch"] <= last_epoch and curve:
                    runs.append((label(), curve))
                    fold_i += 1
                    curve = []
                last_epoch = d["epoch"]
                curve.append(d)
    if curve:
        runs.append((label(), curve))
    return runs


def replay(curve, collapse_ratio=1.2):
    """Replay one fold curve through the gated-policy tracker logic and
    return (max_collapse_streak, v1_fired_at, v2_fired_at).  Mirrors
    StallTracker(-1, grace=2, max_rescues=3, classify_patience=5) but
    tracks the two signatures separately; on a (simulated) fire the run
    is assumed rescued (counting stops — post-fire dynamics differ)."""
    bar = float("inf")
    hits_v1 = hits_v2 = 0
    max_collapse = collapse_streak = 0
    v1_at = v2_at = None
    for d in curve:
        ade, avg, train = d["ade_min20"], d["ade_avg20"], d["train_ade"]
        if ade < 0.98 * bar:
            bar = ade
            hits_v1 = hits_v2 = collapse_streak = 0
            continue
        underfit = avg >= 3.0 * ade and train > 0.5 * avg
        collapse = avg <= collapse_ratio * ade
        collapse_streak = collapse_streak + 1 if collapse else 0
        max_collapse = max(max_collapse, collapse_streak)
        hits_v1 = hits_v1 + 1 if underfit else 0
        hits_v2 = hits_v2 + 1 if (underfit or collapse) else 0
        if hits_v1 >= 5 and v1_at is None:
            v1_at = d["epoch"]
        if hits_v2 >= 5 and v2_at is None:
            v2_at = d["epoch"]
        if v1_at is not None and v2_at is not None:
            break
    return max_collapse, v1_at, v2_at


def main():
    logs = sys.argv[1:] or [os.path.join(HERE, p) for p in DEFAULT_LOGS]
    rows = []
    for log in logs:
        if not os.path.exists(log):
            print(f"skip (missing): {log}")
            continue
        for label, curve in parse_runs(log):
            mc, v1, v2 = replay(curve)
            rows.append((os.path.basename(log), label, len(curve),
                         mc, v1, v2))
    print(f"{'log':34} {'fold':10} {'evals':>5} {'maxCollapseStreak':>18} "
          f"{'v1_fire':>8} {'v2_fire':>8}")
    changed = []
    for log, label, n, mc, v1, v2 in rows:
        mark = "  <-- v2 differs" if (v1 is None) != (v2 is None) else ""
        if mark:
            changed.append((log, label, v2))
        print(f"{log:34} {label:10} {n:>5} {mc:>18} "
              f"{str(v1):>8} {str(v2):>8}{mark}")
    print(f"\n{len(rows)} fold-runs scanned; "
          f"v2 changes {len(changed)}: {changed}")


if __name__ == "__main__":
    main()
