"""Time-matched deep-fold quality: what does OUR framework reach in a
fraction of the reference's wall-clock on the same fold?

The protocol-parity deep fold (benchmarks/ethucy_parity.py, hotel,
3000 epochs = 33k steps) cost the reference 81 min of wall time for
min-20 ADE/FDE 0.731/1.370.  This driver trains OUR engine on the SAME
fold npz for many more steps in a small slice of that wall budget
(fused epoch blocks; eval every block; best + final tracked) — the
throughput advantage (~530x) converted into quality-per-wall-clock.

Usage:
    python benchmarks/ethucy_timematched.py --dir /tmp/synth_ethucy \
        --fold hotel --epochs 30000 --block 500 --out result.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

from benchmarks.ethucy_parity import prepare_folds  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/synth_ethucy")
    ap.add_argument("--fold", default="hotel",
                    help="fold name, or 'all' for the full LOO protocol")
    ap.add_argument("--epochs", type=int, default=30000)
    ap.add_argument("--block", type=int, default=500)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="")
    ap.add_argument("--agent-frame", action="store_true",
                    help="A/B the agent-centric canonical frames on the "
                         "LOO protocol (cfg.agent_frame)")
    ap.add_argument("--use-social", action="store_true",
                    help="A/B the social attention pooling "
                         "(cfg.use_social; composes with --agent-frame — "
                         "world-frame pairwise geometry, canonical h)")
    ap.add_argument("--overrides", default="{}",
                    help="JSON dict of extra TrainConfig overrides "
                         "(e.g. '{\"g_ema_decay\": 0.999}') — same "
                         "convention as coverage_ensemble.py")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (same convention as the "
                         "other harnesses; safe while the TPU is held by "
                         "another process — the tunnel is single-client)")
    ap.add_argument("--stall-blocks", type=int, default=0,
                    help="ADE-stall rescue: after N eval blocks without a "
                         ">2%% best-ADE improvement, restore the best-so-"
                         "far state and re-initialize D + its optimizer "
                         "on a fresh key (the production "
                         "--ade-stall-recover mechanism — shared "
                         "bookkeeping in engine/rescue.py). 0 = off")
    ap.add_argument("--stall-grace", type=int, default=0,
                    help="post-rescue grace: skip stall counting for G "
                         "eval blocks after each rescue (G re-trains "
                         "against the fresh random D for a while — the "
                         "measured transient doubles ADE for 1-2 blocks "
                         "before recovery, r4k log)")
    ap.add_argument("--stall-max-rescues", type=int, default=0,
                    help="stop once M consecutive rescues produced no "
                         "new global best (the first rescue is never "
                         "counted — no prior rescue to judge — so up to "
                         "M+1 rescues can fire per stall episode; each "
                         "ineffective rescue costs a transient, r4k "
                         "thrash measurements). 0 = unlimited")
    ap.add_argument("--rescue-g-jitter", type=float, default=0.0,
                    help="second rescue lever: when a rescue fires with "
                         "a consecutive-ineffective streak >= 1 (the "
                         "previous fresh-D rescue found no new basin), "
                         "ALSO jitter the restored raw G params by this "
                         "relative sigma (per-leaf RMS-scaled Gaussian; "
                         "EMA/optimizers untouched) so the run cannot "
                         "re-enter the same metastable basin exactly. "
                         "0 = off (r4l shipped policy)")
    ap.add_argument("--classify-blocks", type=int, default=0,
                    help="signature-matched EARLY rescue: fire after N "
                         "consecutive flat evals whose avg-of-K >= 3x "
                         "min-of-K with train ADE tracking the avg (the "
                         "r4m broad-under-fit signature) instead of "
                         "waiting out the full --stall-blocks patience. "
                         "0 = patience-only (r4l shipped policy)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    folds = prepare_folds(args.dir)
    if args.fold == "all":
        from benchmarks.synth_ethucy import SCENES
        fold_results = {name: run_fold(folds[name]["npz"], name, args)
                        for name in SCENES}
        all_results = {name: {k: v for k, v in r.items() if k != "curve"}
                       for name, r in fold_results.items()}
        for name in SCENES:
            print(json.dumps({name: all_results[name]}), flush=True)
        bests = [r["best"] for r in fold_results.values()]
        all_results["avg_best_ade_min20"] = round(float(np.mean(
            [b["ade_min20"] for b in bests])), 4)
        all_results["avg_best_fde_min20"] = round(float(np.mean(
            [b["fde_min20"] for b in bests])), 4)
        print(json.dumps({"avg_best": [all_results["avg_best_ade_min20"],
                                       all_results["avg_best_fde_min20"]]}))
        if args.out:
            with open(args.out, "w") as fh:
                json.dump(all_results, fh, indent=1)
        return

    result = run_fold(folds[args.fold]["npz"], args.fold, args)
    print(json.dumps({k: v for k, v in result.items() if k != "curve"}))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(result, fh, indent=1)


def run_fold(fold_npz: str, fold_name: str, args) -> dict:
    import jax
    from socialways_tpu.config import TrainConfig
    from socialways_tpu.data.dataset import load_npz_dataset
    from socialways_tpu.engine.trainer import Trainer

    # --overrides wins over the flag-derived kwargs (a dict merge, not
    # duplicate keywords — '{"seed": 1}' must not TypeError)
    kwargs = dict(n_epochs=args.epochs, seed=args.seed,
                  agent_frame=args.agent_frame,
                  use_social=args.use_social)
    kwargs.update(json.loads(args.overrides))
    cfg = TrainConfig(**kwargs)
    ds = load_npz_dataset(fold_npz)
    trainer = Trainer(cfg, ds)
    state = trainer.init_state()
    rng = jax.random.PRNGKey(args.seed)

    from socialways_tpu.engine.rescue import (StallTracker,
                                              reinit_discriminator)

    best = {"ade_min20": float("inf"), "fde_min20": float("inf"),
            "at_epoch": 0}
    best_state = state  # pytrees are immutable; this is a cheap alias
    tracker = StallTracker(args.stall_blocks, grace=args.stall_grace,
                           max_rescues=args.stall_max_rescues,
                           classify_patience=args.classify_blocks)
    curve = []
    train_s = 0.0
    done = 0
    tic_total = time.perf_counter()
    while done < args.epochs:
        block = min(args.block, args.epochs - done)
        rng, sub = jax.random.split(rng)
        tic = time.perf_counter()
        state, m = trainer.train_epochs(state, sub, block)
        # train_epochs' float(metrics) forces the host transfer that
        # actually syncs on axon (block_until_ready returns early there)
        train_s += time.perf_counter() - tic
        done += block
        rng, sub = jax.random.split(rng)
        ev = trainer.evaluate(state, sub, n_gen_samples=20)
        # ade_avg20/ade_min20 gap = K-sample diversity (collapse =>
        # avg≈min); train_ade vs ade = train/held-out gap — both free
        # (evaluate computes avg anyway; train_ade rides the epoch
        # metrics), and together they classify a stalled fold: mode
        # collapse vs bad-but-diverse equilibrium vs overfit.
        curve.append({"epoch": done, "ade_min20": round(ev["ade_min"], 4),
                      "fde_min20": round(ev["fde_min"], 4),
                      "ade_avg20": round(ev["ade_avg"], 4),
                      "train_ade": round(m.get("train_ade", float("nan")), 4),
                      "d_loss": round(m["d_loss"], 4),
                      "g_loss": round(m["g_loss"], 4)})
        if ev["ade_min"] < best["ade_min20"]:
            best = {"ade_min20": round(ev["ade_min"], 4),
                    "fde_min20": round(ev["fde_min"], 4),
                    "at_epoch": done}
            best_state = state
        print(curve[-1], flush=True)
        if tracker.observe(ev["ade_min"], ade_avg=ev["ade_avg"],
                           train_ade=m.get("train_ade")) \
                and done < args.epochs:
            # stalled adversarial equilibrium: restore the best G/EMA
            # seen so far and give it a FRESH discriminator (the
            # --ade-stall-recover mechanism; schedule clocks rewind
            # with the restore, so the noise anneal replays from the
            # best epoch — acceptable for an anneal-to-floor schedule).
            # NB the D key deliberately comes off the TRAIN stream —
            # byte-compatible with every r4k/r4l matrix artifact.
            rng, kd = jax.random.split(rng)
            state = reinit_discriminator(best_state, cfg, kd)
            streak = tracker.fired(best["ade_min20"], at_epoch=done)
            jittered = False
            if args.rescue_g_jitter and streak >= 1:
                # the previous fresh-D rescue found no new basin:
                # break the exact re-entry (engine/rescue.py lever)
                from socialways_tpu.engine.rescue import jitter_generator
                rng, kj = jax.random.split(rng)
                state = jitter_generator(state, kj, args.rescue_g_jitter)
                jittered = True
            print({"rescue_at": done, "from_best_epoch":
                   best["at_epoch"], "ineffective_streak": streak,
                   "trigger": tracker.last_trigger,
                   "signature": tracker.last_signature,
                   "g_jittered": jittered},
                  flush=True)

    total_s = time.perf_counter() - tic_total
    return {
        "fold": fold_name, "epochs": args.epochs,
        "steps": trainer.n_steps_per_epoch * args.epochs,
        "best": best, "final": curve[-1],
        "rescues": tracker.rescues,
        "rescues_fired_by_classifier": tracker.fired_early,
        "train_time_s": round(train_s, 1),
        "total_wall_s": round(total_s, 1),
        "reference_comparison": {
            "note": "same fold npz; reference hotel @3000 epochs (33k "
                    "steps) = 0.731/1.370 min-20 ADE/FDE in 81 min wall "
                    "(benchmarks/ethucy_loo_parity.json deep fold)",
            "reference_wall_s": 4860,
        },
        "curve": curve,
    }


if __name__ == "__main__":
    main()
