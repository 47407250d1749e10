"""ETH/UCY leave-one-out PROTOCOL PARITY: ours vs the unmodified reference
on identical synthetic obsmat scenes (VERDICT r1 next-round #3).

Real ETH/UCY data is absent (zero egress), so this establishes the
transferable evidence instead: on five realistic BIWI-format scenes
(benchmarks/synth_ethucy.py) windowed by the production pipeline, the full
leave-one-scene-out protocol runs through BOTH implementations —

- ours: `merge_scenes` + Trainer (fused epochs, TPU), min-of-20 eval;
- reference: /root/reference/train.py, UNMODIFIED, trained per fold on a
  merged npz whose held-out scene is exactly the last 1/5 of scene batches
  (so its hard-coded 4/5 split, train.py:95-98, IS the LOO split), then
  evaluated with its own test() over the full held-out scene.

Additionally the fold data itself is checked: `merge_scenes` (our LOO
runner's path) must produce bit-identical arrays to loading the merged
fold npz (the reference's path) — pinning the multi-scene normalization
semantics (VERDICT r1 weakness #3).

Usage:
    python benchmarks/ethucy_parity.py --dir /tmp/synth_ethucy \
        --epochs 600 [--ours-only | --reference-only] [--out result.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

from benchmarks.synth_ethucy import SCENES, build_all, merge_fold  # noqa: E402


def prepare_folds(data_dir: str) -> dict:
    if not os.path.exists(os.path.join(data_dir, "eth-8-12.npz")):
        build_all(data_dir)
    info = {}
    for held in SCENES:
        train_files = [os.path.join(data_dir, f"{s}-8-12.npz")
                       for s in SCENES if s != held]
        out = os.path.join(data_dir, f"fold_{held}.npz")
        info[held] = merge_fold(train_files,
                                os.path.join(data_dir, f"{held}-8-12.npz"),
                                out)
        info[held]["npz"] = out
    return info


def check_merge_scenes_equals_fold_npz(data_dir: str, held: str) -> None:
    """merge_scenes (our LOO runner) == load_npz_dataset(fold npz)
    (the reference-protocol path), bit for bit."""
    from socialways_tpu.data.dataset import load_npz_dataset
    from socialways_tpu.engine.ethucy import merge_scenes

    files = [os.path.join(data_dir, f"{s}-8-12.npz")
             for s in SCENES if s != held]
    ds_a = merge_scenes(files, os.path.join(data_dir, f"{held}-8-12.npz"))
    ds_b = load_npz_dataset(os.path.join(data_dir, f"fold_{held}.npz"))
    assert ds_a.train_size == ds_b.train_size
    np.testing.assert_array_equal(ds_a.obsvs, ds_b.obsvs)
    np.testing.assert_array_equal(ds_a.preds, ds_b.preds)
    np.testing.assert_array_equal(np.asarray(ds_a.batches),
                                  np.asarray(ds_b.batches))
    assert abs(ds_a.ss - ds_b.ss) < 1e-12


def run_ours(fold_npz: str, epochs: int, seed: int = 0) -> dict:
    import jax
    from socialways_tpu.config import TrainConfig
    from socialways_tpu.data.dataset import load_npz_dataset
    from socialways_tpu.engine.trainer import Trainer
    from socialways_tpu.ops.traj import predict_cv

    cfg = TrainConfig(n_epochs=epochs, seed=seed)
    ds = load_npz_dataset(fold_npz)
    trainer = Trainer(cfg, ds)
    state = trainer.init_state()
    rng = jax.random.PRNGKey(seed)

    tic = time.perf_counter()
    done = 0
    while done < epochs:
        block = min(50, epochs - done)
        rng, sub = jax.random.split(rng)
        state, m = trainer.train_epochs(state, sub, block)
        done += block
    train_s = time.perf_counter() - tic

    rng, sub = jax.random.split(rng)
    ev = trainer.evaluate(state, sub, n_gen_samples=20)

    # constant-velocity context (same baseline the reference prints)
    nt = ds.n_train_samples
    import jax.numpy as jnp
    lin = predict_cv(jnp.asarray(ds.obsvs[nt:]), ds.n_next)
    err = np.linalg.norm(np.asarray(lin) - ds.preds[nt:], axis=-1) / ds.ss
    return {
        "ade_min20": round(ev["ade_min"], 4),
        "fde_min20": round(ev["fde_min"], 4),
        "ade_avg": round(ev["ade_avg"], 4),
        "fde_avg": round(ev["fde_avg"], 4),
        "linear_ade": round(float(err.mean()), 4),
        "linear_fde": round(float(err[:, -1].mean()), 4),
        "train_time_s": round(train_s, 1),
        "steps": trainer.n_steps_per_epoch * epochs,
    }


def run_reference_fold(fold_npz: str, epochs: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "run_reference.py"),
         "--npz", fold_npz, "--epochs", str(epochs), "--final-test"],
        capture_output=True, text=True, timeout=7200)
    if out.returncode != 0:
        raise RuntimeError(f"reference fold failed: {out.stderr[-2000:]}")
    r = json.loads(out.stdout.strip().splitlines()[-1])
    f = r["final_eval"]
    return {
        "ade_min20": f["ade_min20"], "fde_min20": f["fde_min20"],
        "ade_avg": f["ade_avg"], "fde_avg": f["fde_avg"],
        "linear_ade": f["linear"]["ade_min20"],
        "linear_fde": f["linear"]["fde_min20"],
        "steps_per_sec": r["reference_steps_per_sec"],
        "n_chunks_per_epoch": r["n_chunks_per_epoch"],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/synth_ethucy")
    ap.add_argument("--epochs", type=int, default=600)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--ours-only", action="store_true")
    ap.add_argument("--reference-only", action="store_true")
    ap.add_argument("--scenes", default=",".join(SCENES))
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    scenes = args.scenes.split(",")
    folds = prepare_folds(args.dir)
    results = {"epochs": args.epochs, "folds": {}}
    for held in scenes:
        r = {"data": {k: v for k, v in folds[held].items() if k != "npz"}}
        check_merge_scenes_equals_fold_npz(args.dir, held)
        r["merge_scenes_check"] = "identical"
        if not args.reference_only:
            r["ours"] = run_ours(folds[held]["npz"], args.epochs, args.seed)
            print(f"[{held}] ours: {r['ours']}", flush=True)
        if not args.ours_only:
            r["reference"] = run_reference_fold(folds[held]["npz"],
                                                args.epochs)
            print(f"[{held}] reference: {r['reference']}", flush=True)
        results["folds"][held] = r

    for who in ("ours", "reference"):
        vals = [f[who] for f in results["folds"].values() if who in f]
        if vals:
            results[f"{who}_avg_ade_min20"] = round(
                float(np.mean([v["ade_min20"] for v in vals])), 4)
            results[f"{who}_avg_fde_min20"] = round(
                float(np.mean([v["fde_min20"] for v in vals])), 4)
    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
