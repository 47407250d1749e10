"""Seed-robustness sweep for full toy mode coverage (VERDICT r1 #5).

Round-1 status: categorical InfoGAN codes are the robust recipe but only
reach 0.72-0.78 coverage across seeds on the small toy; the continuous
info-5.0 recipe reaches 1.00 but sits on divergence cliffs.  This driver
A/Bs the two untried stabilizer axes — EMA of G (--g-ema-decay) and
warmup-style schedules (--lr-warmup-steps, --d-update-every-end/-switch)
— across seeds on BOTH toy configs, through the PRODUCTION train path
(fused epochs, block 2000 — sweep-path streams diverge differently,
ROADMAP §1), with NO peak-checkpoint cherry-picking: the scored number is
the FINAL-epoch coverage (peak is recorded for context only).

Usage:
    python benchmarks/coverage_robustness.py --recipes base,ema \
        --seeds 0,1,2 --toys small,big --epochs 40000 --out result.json
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

RECIPES = {
    # categorical codes: round-1's robust recipe (the baseline arm)
    "base": [],
    "ema": ["--g-ema-decay", "0.999"],
    "ema99": ["--g-ema-decay", "0.99"],
    "warmup": ["--lr-warmup-steps", "2000"],
    "dwarm": ["--d-update-every-end", "2", "--d-update-every-switch",
              "20000"],
    "ema+warmup": ["--g-ema-decay", "0.999", "--lr-warmup-steps", "2000"],
    # hard-divergence stoppers (the base recipe's late collapse)
    "ema+rec": ["--g-ema-decay", "0.999", "--auto-recover"],
    "ddecay": ["--d-lr-decay-rate", "0.7", "--d-lr-decay-steps", "10000"],
    "ema+ddecay": ["--g-ema-decay", "0.999", "--d-lr-decay-rate", "0.7",
                   "--d-lr-decay-steps", "10000"],
    "ema+ddecay+rec": ["--g-ema-decay", "0.999", "--d-lr-decay-rate",
                       "0.7", "--d-lr-decay-steps", "10000",
                       "--auto-recover"],
    "ddecay15": ["--d-lr-decay-rate", "0.75", "--d-lr-decay-steps",
                 "15000"],
    "ddecay+info1": ["--d-lr-decay-rate", "0.7", "--d-lr-decay-steps",
                     "10000", "--info-weight", "1.0"],
    "ddecay+rec": ["--d-lr-decay-rate", "0.7", "--d-lr-decay-steps",
                   "10000", "--auto-recover"],
    # denser eval/rescue cadence + stronger mode pressure
    "robust1": ["--d-lr-decay-rate", "0.7", "--d-lr-decay-steps", "10000",
                "--auto-recover", "--block-size", "1000",
                "--info-weight", "1.0"],
    # round-2 session-3 arms: the variety loss (corrected SGAN min-over-K
    # L2) is the one structural anti-collapse lever not yet swept — it
    # directly penalizes any sample's modes going uncovered; info2 probes
    # stronger categorical-code pressure on the slow big-toy seeds
    "robust1+var": ["--d-lr-decay-rate", "0.7", "--d-lr-decay-steps",
                    "10000", "--auto-recover", "--block-size", "1000",
                    "--info-weight", "1.0", "--use-variety-loss"],
    "robust1+info2": ["--d-lr-decay-rate", "0.7", "--d-lr-decay-steps",
                      "10000", "--auto-recover", "--block-size", "1000",
                      "--info-weight", "2.0"],
    # robust2: robust1 + coverage-stagnation rescue (--stall-recover 6 =
    # restart from the best-coverage checkpoint after 6k stalled steps)
    "robust2": ["--d-lr-decay-rate", "0.7", "--d-lr-decay-steps", "10000",
                "--auto-recover", "--block-size", "1000",
                "--info-weight", "1.0", "--stall-recover", "6"],
    # more codes than modes: redundant categorical codes raise the chance
    # every turn mode has at least one code mapped to it
    "robust1+codes6": ["--d-lr-decay-rate", "0.7", "--d-lr-decay-steps",
                       "10000", "--auto-recover", "--block-size", "1000",
                       "--info-weight", "1.0", "--n-latent-codes", "6"],
    # robust3: the big-toy winner (info 2.0) + D-reset stall rescue
    "robust3": ["--d-lr-decay-rate", "0.7", "--d-lr-decay-steps", "10000",
                "--auto-recover", "--block-size", "1000",
                "--info-weight", "2.0", "--stall-recover", "4",
                "--stall-reset-d"],
    # session-5 structural anti-collapse arms: PacGAN packing (D sees
    # pairs — low within-pack diversity is directly classifiable) and
    # annealed D instance noise (support overlap keeps D's boundary from
    # sharpening onto single modes)
    "robust1+pac2": ["--d-lr-decay-rate", "0.7", "--d-lr-decay-steps",
                     "10000", "--auto-recover", "--block-size", "1000",
                     "--info-weight", "1.0", "--pac", "2"],
    "robust1+inoise": ["--d-lr-decay-rate", "0.7", "--d-lr-decay-steps",
                       "10000", "--auto-recover", "--block-size", "1000",
                       "--info-weight", "1.0", "--d-input-noise", "0.1",
                       "--d-input-noise-steps", "30000"],
    "robust1+info2+pac2": ["--d-lr-decay-rate", "0.7", "--d-lr-decay-steps",
                           "10000", "--auto-recover", "--block-size",
                           "1000", "--info-weight", "2.0", "--pac", "2"],
    "robust1+info2+inoise": ["--d-lr-decay-rate", "0.7",
                             "--d-lr-decay-steps", "10000",
                             "--auto-recover", "--block-size", "1000",
                             "--info-weight", "2.0", "--d-input-noise",
                             "0.1", "--d-input-noise-steps", "30000"],
    # gentler noise annealed over the whole run: σ0.1/30k gave peaks of
    # 1.0 and the best small-toy ADE but end-phase coverage oscillation
    "robust1+inoise2": ["--d-lr-decay-rate", "0.7", "--d-lr-decay-steps",
                        "10000", "--auto-recover", "--block-size", "1000",
                        "--info-weight", "1.0", "--d-input-noise", "0.05",
                        "--d-input-noise-steps", "40000"],
    # inoise2 + the big-toy info weight (2.0): the small-toy winner's
    # noise schedule on the big toy's best base recipe
    "robust1+info2+inoise2": ["--d-lr-decay-rate", "0.7",
                              "--d-lr-decay-steps", "10000",
                              "--auto-recover", "--block-size", "1000",
                              "--info-weight", "2.0", "--d-input-noise",
                              "0.05", "--d-input-noise-steps", "40000"],
    # σ0.1 + stall rescue to catch the end-phase dip
    "robust1+inoise+rescue": ["--d-lr-decay-rate", "0.7",
                              "--d-lr-decay-steps", "10000",
                              "--auto-recover", "--block-size", "1000",
                              "--info-weight", "1.0", "--d-input-noise",
                              "0.1", "--d-input-noise-steps", "30000",
                              "--stall-recover", "4"],
    # session-6: anneal horizon matched to the run length via steps=-1
    # (the 80k arms showed coverage drifts once training continues
    # noise-free; -1 resolves to epochs × chunks inside cli train)
    "robust1+inoisefull": ["--d-lr-decay-rate", "0.7",
                           "--d-lr-decay-steps", "10000",
                           "--auto-recover", "--block-size", "1000",
                           "--info-weight", "1.0", "--d-input-noise",
                           "0.05", "--d-input-noise-steps", "-1"],
    "robust1+info2+inoisefull": ["--d-lr-decay-rate", "0.7",
                                 "--d-lr-decay-steps", "10000",
                                 "--auto-recover", "--block-size", "1000",
                                 "--info-weight", "2.0", "--d-input-noise",
                                 "0.05", "--d-input-noise-steps", "-1"],
    # long-run form: inoise2 + stall rescue, with --rescue-keep-clock so
    # the restore no longer rewinds the sigma anneal (the interaction that
    # made rescue+anneal fight in session 5) — the intended recipe for
    # runs longer than the anneal horizon
    "robust1+info2+inoise2+rescue": [
        "--d-lr-decay-rate", "0.7", "--d-lr-decay-steps", "10000",
        "--auto-recover", "--block-size", "1000", "--info-weight", "2.0",
        "--d-input-noise", "0.05", "--d-input-noise-steps", "40000",
        "--stall-recover", "4", "--rescue-keep-clock"],
    # round-3: ProGAN minibatch stddev — D sees the fake/real block's
    # diversity scalar; the one canonical anti-collapse lever untried,
    # alone and composed with the documented big-toy winner
    "robust1+inoise2+mbstd": ["--d-lr-decay-rate", "0.7",
                              "--d-lr-decay-steps", "10000",
                              "--auto-recover", "--block-size", "1000",
                              "--info-weight", "1.0", "--d-input-noise",
                              "0.05", "--d-input-noise-steps", "40000",
                              "--mb-std"],
    "robust1+info2+mbstd": ["--d-lr-decay-rate", "0.7",
                            "--d-lr-decay-steps", "10000",
                            "--auto-recover", "--block-size", "1000",
                            "--info-weight", "2.0", "--mb-std"],
    "robust1+info2+inoise2+mbstd": ["--d-lr-decay-rate", "0.7",
                                    "--d-lr-decay-steps", "10000",
                                    "--auto-recover", "--block-size",
                                    "1000", "--info-weight", "2.0",
                                    "--d-input-noise", "0.05",
                                    "--d-input-noise-steps", "40000",
                                    "--mb-std"],
    # round-3: MSGAN mode-seeking regularizer — direct pairwise-diversity
    # pressure on G (no ground truth involved, unlike the measured-negative
    # variety loss), alone and composed with the documented big-toy winner
    "robust1+info2+ms": ["--d-lr-decay-rate", "0.7",
                         "--d-lr-decay-steps", "10000",
                         "--auto-recover", "--block-size", "1000",
                         "--info-weight", "2.0", "--ms-weight", "0.1"],
    "robust1+info2+inoise2+ms": ["--d-lr-decay-rate", "0.7",
                                 "--d-lr-decay-steps", "10000",
                                 "--auto-recover", "--block-size", "1000",
                                 "--info-weight", "2.0", "--d-input-noise",
                                 "0.05", "--d-input-noise-steps", "40000",
                                 "--ms-weight", "0.1"],
    "robust1+info2+inoise2+ms05": ["--d-lr-decay-rate", "0.7",
                                   "--d-lr-decay-steps", "10000",
                                   "--auto-recover", "--block-size", "1000",
                                   "--info-weight", "2.0",
                                   "--d-input-noise", "0.05",
                                   "--d-input-noise-steps", "40000",
                                   "--ms-weight", "0.5"],
    # round-3: DSGAN per-sample diversity hinge (tau calibrated from the
    # measured per-row d/dz distribution on trained bestcov checkpoints:
    # healthy median ~0.10-0.13, legitimate same-mode tail ~0.01-0.02 —
    # tau 0.05 binds only the tail, tau 0.1 binds up to the median)
    "robust1+info2+inoise2+ds05": ["--d-lr-decay-rate", "0.7",
                                   "--d-lr-decay-steps", "10000",
                                   "--auto-recover", "--block-size", "1000",
                                   "--info-weight", "2.0",
                                   "--d-input-noise", "0.05",
                                   "--d-input-noise-steps", "40000",
                                   "--ds-weight", "5.0",
                                   "--ds-tau", "0.05"],
    "robust1+info2+inoise2+ds05k4": ["--d-lr-decay-rate", "0.7",
                                     "--d-lr-decay-steps", "10000",
                                     "--auto-recover", "--block-size",
                                     "1000", "--info-weight", "2.0",
                                     "--d-input-noise", "0.05",
                                     "--d-input-noise-steps", "40000",
                                     "--ds-weight", "5.0",
                                     "--ds-tau", "0.05", "--ds-k", "4"],
    "robust1+info2+inoise2+ds10": ["--d-lr-decay-rate", "0.7",
                                   "--d-lr-decay-steps", "10000",
                                   "--auto-recover", "--block-size", "1000",
                                   "--info-weight", "2.0",
                                   "--d-input-noise", "0.05",
                                   "--d-input-noise-steps", "40000",
                                   "--ds-weight", "2.0",
                                   "--ds-tau", "0.1"],
    # round-3: full-batch steps — batch 768 puts every condition (and all
    # train scene batches) in EVERY update, removing chunk-sampling
    # variance in what D sees (chunks_per_epoch() keeps the arm
    # iteration-matched: 1 chunk/epoch instead of 3)
    "robust1+info2+inoise2+bs768": ["--d-lr-decay-rate", "0.7",
                                    "--d-lr-decay-steps", "10000",
                                    "--auto-recover", "--block-size",
                                    "1000", "--info-weight", "2.0",
                                    "--d-input-noise", "0.05",
                                    "--d-input-noise-steps", "40000",
                                    "--batch-size", "768"],
    # round-3: deeper unrolled-GAN lookahead — THE paper lever for mode
    # collapse (Metz et al.; the reference defaults to 1)
    "robust1+info2+inoise2+unroll2": ["--d-lr-decay-rate", "0.7",
                                      "--d-lr-decay-steps", "10000",
                                      "--auto-recover", "--block-size",
                                      "1000", "--info-weight", "2.0",
                                      "--d-input-noise", "0.05",
                                      "--d-input-noise-steps", "40000",
                                      "--unroll", "2"],
    # SN-GAN spectral normalization: the Lipschitz-bound alternative to
    # instance noise, alone and composed with the inoise winner
    "robust1+sn": ["--d-lr-decay-rate", "0.7", "--d-lr-decay-steps",
                   "10000", "--auto-recover", "--block-size", "1000",
                   "--info-weight", "1.0", "--spectral-norm"],
    "robust1+info2+sn": ["--d-lr-decay-rate", "0.7", "--d-lr-decay-steps",
                         "10000", "--auto-recover", "--block-size", "1000",
                         "--info-weight", "2.0", "--spectral-norm"],
    # round-3 session-3: model capacity — the one untried stability axis
    # (h doubles G/D width AND the noise length; disclosed deviation from
    # the reference's h=64 parity constraint, quality-recipe only)
    "robust1+info2+inoise2+h128": ["--d-lr-decay-rate", "0.7",
                                   "--d-lr-decay-steps", "10000",
                                   "--auto-recover", "--block-size",
                                   "1000", "--info-weight", "2.0",
                                   "--d-input-noise", "0.05",
                                   "--d-input-noise-steps", "40000",
                                   "--hidden-size", "128"],
    # round-3 session-3: agent-centric canonical frames — the STRUCTURAL
    # fix for per-condition collapse (all approach directions become the
    # same problem in the heading frame; code→mode structure is learned
    # once, globally), alone on each base recipe
    "robust1+info2+inoise2+af": ["--d-lr-decay-rate", "0.7",
                                 "--d-lr-decay-steps", "10000",
                                 "--auto-recover", "--block-size", "1000",
                                 "--info-weight", "2.0",
                                 "--d-input-noise", "0.05",
                                 "--d-input-noise-steps", "40000",
                                 "--agent-frame"],
    "robust1+inoise2+af": ["--d-lr-decay-rate", "0.7",
                           "--d-lr-decay-steps", "10000",
                           "--auto-recover", "--block-size", "1000",
                           "--info-weight", "1.0",
                           "--d-input-noise", "0.05",
                           "--d-input-noise-steps", "40000",
                           "--agent-frame"],
    # round-4 dip-mechanism fix levers (benchmarks/dip_diagnosis*): the
    # info ramp anchors the code→mode map against early REMAPS; the EMA
    # generator time-averages the late within-code angle-drift
    # oscillation out of eval
    "robust1+inoise2+af+infosched": [
        "--d-lr-decay-rate", "0.7", "--d-lr-decay-steps", "10000",
        "--auto-recover", "--block-size", "1000",
        "--info-weight", "1.0", "--info-weight-end", "3.0",
        "--info-weight-steps", "40000",
        "--d-input-noise", "0.05", "--d-input-noise-steps", "40000",
        "--agent-frame"],
    "robust1+inoise2+af+ema": [
        "--d-lr-decay-rate", "0.7", "--d-lr-decay-steps", "10000",
        "--auto-recover", "--block-size", "1000",
        "--info-weight", "1.0", "--g-ema-decay", "0.999",
        "--d-input-noise", "0.05", "--d-input-noise-steps", "40000",
        "--agent-frame"],
    # round-4: the composition (accuracy winner on the LOO A/B) on the
    # toy coverage protocol
    "robust1+inoise2+af+social": [
        "--d-lr-decay-rate", "0.7", "--d-lr-decay-steps", "10000",
        "--auto-recover", "--block-size", "1000",
        "--info-weight", "1.0", "--use-social",
        "--d-input-noise", "0.05", "--d-input-noise-steps", "40000",
        "--agent-frame"],
    # af composes with the global diversity levers: agent frames make
    # collapse all-or-nothing GLOBAL (measured: the af seed-1 final dip is
    # one mode lost uniformly across every condition, flat in K), which is
    # exactly the statistic mode-seeking / the ds hinge can see — ms's
    # per-condition blind spot no longer exists
    "robust1+info2+inoise2+af+ms": ["--d-lr-decay-rate", "0.7",
                                    "--d-lr-decay-steps", "10000",
                                    "--auto-recover", "--block-size",
                                    "1000", "--info-weight", "2.0",
                                    "--d-input-noise", "0.05",
                                    "--d-input-noise-steps", "40000",
                                    "--agent-frame", "--ms-weight", "0.1"],
    "robust1+info2+inoise2+af+ds": ["--d-lr-decay-rate", "0.7",
                                    "--d-lr-decay-steps", "10000",
                                    "--auto-recover", "--block-size",
                                    "1000", "--info-weight", "2.0",
                                    "--d-input-noise", "0.05",
                                    "--d-input-noise-steps", "40000",
                                    "--agent-frame", "--ds-weight", "5.0",
                                    "--ds-tau", "0.05", "--ds-k", "4"],
    # redundant categorical codes (6 codes, 3 modes): raises the chance
    # every turn mode has at least one code mapped to it PER CONDITION —
    # attacks exactly the per-condition code-to-mode assignment failure
    "robust1+info2+inoise2+codes6": ["--d-lr-decay-rate", "0.7",
                                     "--d-lr-decay-steps", "10000",
                                     "--auto-recover", "--block-size",
                                     "1000", "--info-weight", "2.0",
                                     "--d-input-noise", "0.05",
                                     "--d-input-noise-steps", "40000",
                                     "--n-latent-codes", "6"],
}
COMMON = ["--d-lr", "5e-4", "--latent-code", "categorical",
          "--n-latent-codes", "3", "--info-weight", "0.5",
          "--fused-epochs", "--block-size", "2000", "--track-coverage"]

TOYS = {
    # (create-toy args, n_per_batch interleaves conditions -> usable split)
    "small": ["--n_conditions", "6", "--n_samples", "216",
              "--n_per_batch", "6"],
    "big": ["--n_conditions", "8", "--n_samples", "768",
            "--n_per_batch", "8"],
}
# steps/epoch differs per toy (1 vs 3 chunks): --epochs is interpreted as
# TARGET GAN STEPS and divided by the chunk count so the arms are
# iteration-matched across toys (round-1 sweeps counted iterations)
CHUNKS_PER_EPOCH = {"small": 1, "big": 3}
# train-split samples per toy (4/5 of the scene batches): used to recompute
# the chunk count when a recipe overrides --batch-size (e.g. bs768)
TRAIN_SAMPLES = {"small": 174, "big": 616}


def chunks_per_epoch(toy: str, recipe: str) -> int:
    args = RECIPES[recipe]
    if "--batch-size" in args:
        bs = int(args[args.index("--batch-size") + 1])
        return max(1, -(-TRAIN_SAMPLES[toy] // bs))
    return CHUNKS_PER_EPOCH[toy]

_COV_RE = re.compile(r"mode coverage = ([\d.]+)")
_ADE_RE = re.compile(r"Min\(20\) ADE,FDE \(\d+\)= \(([\d.]+), ([\d.]+)\)")


def ensure_toy(kind: str, workdir: str) -> str:
    path = os.path.join(workdir, f"toy_{kind}.npz")
    if not os.path.exists(path):
        subprocess.run([sys.executable, "-m", "socialways_tpu.cli.main",
                        "create-toy", "--npz", path] + TOYS[kind],
                       check=True, cwd=REPO)
    return path


def run_one(toy_npz: str, recipe: str, seed: int, epochs: int,
            workdir: str, cpu: bool = False) -> dict:
    import shutil
    import time
    model_dir = os.path.join(workdir, f"m_{recipe}_{seed}_{epochs}_"
                             f"{os.path.basename(toy_npz)}")
    cmd = ([sys.executable, "-m", "socialways_tpu.cli.main"]
           + (["--cpu"] if cpu else [])       # global flag: pre-subcommand
           + ["train", "--data", toy_npz, "--epochs", str(epochs),
              "--seed", str(seed), "--model-dir", model_dir,
              ] + COMMON + RECIPES[recipe])
    for attempt in range(2):
        # a leftover checkpoint would auto-resume and skip the whole run
        shutil.rmtree(model_dir, ignore_errors=True)
        try:
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 cwd=REPO, timeout=7200)
        except subprocess.TimeoutExpired as e:
            # a wedged tunnel contact can hang a run with ~zero CPU use —
            # observed: 1.5 h elapsed, 10 s CPU, nothing written
            out = subprocess.CompletedProcess(
                cmd, returncode=-1,
                stderr=f"timeout after {e.timeout}s (hung TPU contact?)",
                stdout="")
        if out.returncode == 0:
            break
        # transient TPU/tunnel failures (the chip is single-client; after a
        # process dies the next device contact can take ~4 min) — wait out
        # the recovery window and retry once
        if attempt == 0:
            print(f"  retrying {recipe}/seed{seed} after failure "
                  f"(tail: {out.stderr[-200:]!r})", flush=True)
            time.sleep(240)
    if out.returncode != 0:
        return {"error": out.stderr[-1500:]}
    covs = [float(m) for m in _COV_RE.findall(out.stdout)]
    ades = [float(m[0]) for m in _ADE_RE.findall(out.stdout)]
    if not covs:
        return {"error": "no coverage lines in output"}
    return {
        "final_coverage": covs[-1],
        "peak_coverage": max(covs),
        "mean_last5_coverage": round(sum(covs[-5:]) / len(covs[-5:]), 4),
        "final_ade_min20": ades[-1] if ades else None,
        "best_ade_min20": min(ades) if ades else None,
        "n_evals": len(covs),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--recipes", default="base,ema")
    ap.add_argument("--seeds", default="0,1,2")
    ap.add_argument("--toys", default="small,big")
    ap.add_argument("--epochs", type=int, default=40000)
    ap.add_argument("--workdir", default="")
    ap.add_argument("--out", default="")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend in the train subprocesses "
                         "(plumbing smoke tests while the TPU is busy/down)")
    args = ap.parse_args()

    workdir = args.workdir or tempfile.mkdtemp(prefix="covrob_")
    results = {"epochs": args.epochs}
    for toy in args.toys.split(","):
        npz = ensure_toy(toy, workdir)
        for recipe in args.recipes.split(","):
            epochs = args.epochs // chunks_per_epoch(toy, recipe)
            for seed in [int(s) for s in args.seeds.split(",")]:
                key = f"{toy}/{recipe}/seed{seed}"
                results[key] = run_one(npz, recipe, seed, epochs,
                                       workdir, cpu=args.cpu)
                print(key, results[key], flush=True)
                if args.out:
                    with open(args.out, "w") as fh:
                        json.dump(results, fh, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
