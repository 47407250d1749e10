"""Ensemble-accelerated coverage sweep: N seeds of one recipe trained as
ONE device program (engine/ensemble.py), coverage scored per member per
block.

This is the fast path for seed-robustness protocols: all members train
jointly (vmapped fused epochs), so a 3-seed 40k-step sweep costs roughly
one run of wall clock on a TPU chip.  It covers the SIMPLE recipe surface
(everything expressed in TrainConfig: info weight, d-lr decay, instance
noise, spectral norm, latent codes...) plus, with --auto-recover,
PER-MEMBER divergence rescue mirroring `cli train --auto-recover`'s rule
(non-finite train ADE or >5x member best + 0.1 → restore that member from
its best-coverage snapshot; other members untouched).  The schedule-clock
transplant (--rescue-keep-clock) is NOT replicated — for anneal recipes
that outlive their horizon under rescues, use
benchmarks/coverage_robustness.py (the production `cli train` path).

Usage:
    python benchmarks/coverage_ensemble.py --toy big --seeds 0,1,2 \
        --steps 40000 --block 2000 \
        --overrides '{"loss_info_w": 2.0, "d_input_noise": 0.05, \
                      "d_input_noise_steps": 40000}' --out result.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

TOYS = {
    "small": dict(n_conditions=6, n_samples=216, n_per_batch=6),
    "big": dict(n_conditions=8, n_samples=768, n_per_batch=8),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--toy", default="big", choices=list(TOYS))
    ap.add_argument("--seeds", default="0,1,2")
    ap.add_argument("--steps", type=int, default=40000,
                    help="target GAN steps (converted to epochs by the "
                         "toy's chunks/epoch, like coverage_robustness)")
    ap.add_argument("--block", type=int, default=2000,
                    help="GAN steps per fused block (coverage scored "
                         "after each block)")
    ap.add_argument("--overrides", default="{}",
                    help="JSON dict of TrainConfig overrides on top of "
                         "the categorical robust1 base")
    ap.add_argument("--out", default="")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--cpu-devices", type=int, default=0,
                    help="with --cpu: force a virtual N-device host")
    ap.add_argument("--mesh", type=int, default=0,
                    help="shard the member axis over an N-device mesh "
                         "(len(seeds) %% N == 0); members stay independent")
    ap.add_argument("--auto-recover", action="store_true",
                    help="per-member divergence rescue: restore a diverged "
                         "member from its own best-coverage snapshot")
    args = ap.parse_args()

    if args.cpu_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") +
            f" --xla_force_host_platform_device_count={args.cpu_devices}"
        ).strip()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from socialways_tpu.config import TrainConfig
    from socialways_tpu.data.dataset import load_npz_dataset
    from socialways_tpu.data.toy import make_toy_npz_arrays
    from socialways_tpu.engine import EnsembleTrainer, Trainer

    toy = TOYS[args.toy]
    with tempfile.TemporaryDirectory(prefix="covens_") as td:
        npz = os.path.join(td, "toy.npz")
        np.savez(npz, **make_toy_npz_arrays(**toy))
        ds = load_npz_dataset(npz)

    # robust1 base (BASELINE.md): categorical codes, d-lr 5e-4 + decay
    base = dict(batch_size=256, n_unrolling_steps=1, lr_d=5e-4,
                latent_code_type="categorical", n_latent_codes=3,
                loss_info_w=1.0, d_lr_decay_rate=0.7,
                d_lr_decay_steps=10000)
    base.update(json.loads(args.overrides))
    cfg = TrainConfig(**base)

    tr = Trainer(cfg, ds)
    mesh = None
    if args.mesh:
        from socialways_tpu.parallel import make_mesh
        mesh = make_mesh(args.mesh)
    ens = EnsembleTrainer(tr, mesh=mesh)
    seeds = [int(s) for s in args.seeds.split(",")]
    states = ens.init_states(seeds)

    spe = tr.n_steps_per_epoch
    total_epochs = max(args.steps // spe, 1)
    block_epochs = max(args.block // spe, 1)
    rngs = jnp.stack([jax.random.PRNGKey(1000 + s) for s in seeds])

    history = {s: [] for s in seeds}
    # per-member rescue state: best-coverage snapshot + cli train's
    # divergence rule (NaN or train ADE > 5x member best + 0.1)
    best_cov = [-1.0] * len(seeds)
    best_ade = [float("inf")] * len(seeds)
    snapshots = [jax.tree_util.tree_map(lambda x: x[i], states)
                 for i in range(len(seeds))] if args.auto_recover else None
    rescues = {s: 0 for s in seeds}
    done = 0
    tic = time.perf_counter()
    while done < total_epochs:
        n = min(block_epochs, total_epochs - done)
        rngs = jax.vmap(lambda r: jax.random.fold_in(r, done))(rngs)
        states, m = ens.train_epochs(states, rngs, n=n)
        done += n
        covs = ens.coverage(states, rngs)
        ades = np.asarray(m["train_ade"], np.float64)
        for s, c in zip(seeds, covs):
            history[s].append(round(c, 4))
        if args.auto_recover:
            for i, s in enumerate(seeds):
                diverged = (not np.isfinite(ades[i])
                            or ades[i] > 5 * best_ade[i] + 0.1)
                if np.isfinite(ades[i]):
                    best_ade[i] = min(best_ade[i], float(ades[i]))
                if diverged and best_cov[i] >= 0:
                    states = jax.tree_util.tree_map(
                        lambda st, sn: st.at[i].set(sn),
                        states, snapshots[i])
                    rescues[s] += 1
                    print(f"  [seed {s}] diverged (ade {ades[i]:.3g}) — "
                          f"restored best-coverage snapshot "
                          f"(cov {best_cov[i]:.2f})", flush=True)
                elif covs[i] > best_cov[i]:
                    best_cov[i] = covs[i]
                    snapshots[i] = jax.tree_util.tree_map(
                        lambda x: x[i], states)
        print(f"epoch {done * spe}/{total_epochs * spe} steps: "
              f"coverage {['%.2f' % c for c in covs]}, "
              f"ade {[float(f'{a:.4f}') for a in ades]}",
              flush=True)
    wall = time.perf_counter() - tic

    ev = ens.evaluate(states, rngs)
    result = {"toy": args.toy, "steps": args.steps,
              "overrides": json.loads(args.overrides),
              "wall_s": round(wall, 1), "seeds": {}}
    for i, s in enumerate(seeds):
        result["seeds"][s] = {
            "final_coverage": history[s][-1],
            "peak_coverage": max(history[s]),
            "mean_last5_coverage": round(
                float(np.mean(history[s][-5:])), 4),
            "final_ade_min20": round(float(ev[i]["ade_min"]), 4)
            if ev else None,
            "rescues": rescues[s],
            "coverage_curve": history[s],
        }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(result, fh, indent=1)


if __name__ == "__main__":
    main()
