"""Coverage vs K diagnostic: mode PRESENCE vs mode BALANCE.

The in-training coverage eval (cli/main.py:_eval_coverage) scores K=20
samples over the first 64 test samples.  K=20 conflates two failure
modes: a mode the generator truly never produces (presence failure) and
a mode produced with low probability (balance failure — e.g. an 8%-mass
mode is missed by 20 draws ~19% of the time per agent, capping measured
coverage well below 1.0 even when all modes exist).  This tool loads a
saved checkpoint and reports coverage at K in {20, 64, 256} over the
FULL test split, per condition group (the toy's approach directions),
averaged over several eval RNGs:

- coverage rises substantially with K  -> balance failure (modes exist,
  weights skewed; a sampling-budget question, not a collapse);
- coverage flat in K and a condition row pinned near 1/3 -> genuine
  per-condition collapse (the training-lever question).

Usage:
    python benchmarks/coverage_vs_k.py \
        --ckpt <model_dir>/socialWays-hotel.npz --data <toy>.npz \
        --info-weight 2.0 [--n-latent-codes 3] [--hidden-size 64] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def condition_groups(obs_w: np.ndarray, decimals: int = 1) -> np.ndarray:
    """Group test agents by approach direction (the toy's condition id).

    obsvs[:, 0] of the toy lies on the start ring, so the rounded bearing
    of the first observed point is a stable condition key.
    """
    ang = np.round(np.degrees(np.arctan2(obs_w[:, 0, 1], obs_w[:, 0, 0])),
                   decimals)
    _, ids = np.unique(ang, return_inverse=True)
    return ids


def mode_hits(obs_w: np.ndarray, preds_w: np.ndarray,
              mode_angles=(-16.0, 0.0, 16.0),
              tol_deg: float = 8.0) -> np.ndarray:
    """[n_modes, N] bool — same geometry as eval/stats.toy_mode_coverage."""
    approach = np.degrees(np.arctan2(obs_w[:, 0, 1], obs_w[:, 0, 0]))
    final = preds_w[..., -1, :]
    ang = np.degrees(np.arctan2(final[..., 1], final[..., 0]))
    turn = (ang - approach[None, :] + 180.0) % 360.0 - 180.0
    return np.stack([(np.abs(turn - m) < tol_deg).any(axis=0)
                     for m in mode_angles])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--info-weight", type=float, default=2.0)
    ap.add_argument("--n-latent-codes", type=int, default=3)
    ap.add_argument("--hidden-size", type=int, default=64)
    ap.add_argument("--agent-frame", action="store_true")
    ap.add_argument("--ks", default="20,64,256")
    ap.add_argument("--rngs", type=int, default=3,
                    help="eval RNG replicates per K (error bars)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from socialways_tpu.config import TrainConfig
    from socialways_tpu.data.dataset import load_npz_dataset
    from socialways_tpu.engine import init_train_state
    from socialways_tpu.engine.train_step import eval_params
    from socialways_tpu.eval.metrics import k_sample_rollout
    from socialways_tpu.eval.stats import toy_mode_coverage
    from socialways_tpu.io.checkpoint import restore_checkpoint

    ds = load_npz_dataset(args.data)
    cfg = TrainConfig(n_past=ds.obsvs.shape[1], n_next=ds.preds.shape[1],
                      latent_code_type="categorical",
                      n_latent_codes=args.n_latent_codes,
                      loss_info_w=args.info_weight, lr_d=5e-4,
                      hidden_size=args.hidden_size,
                      social_feature_size=args.hidden_size,
                      noise_len=args.hidden_size // 2,
                      agent_frame=args.agent_frame)
    template = init_train_state(jax.random.PRNGKey(0), cfg)
    state, epoch, _, _ = restore_checkpoint(args.ckpt, template)

    nt = ds.n_train_samples
    obs = jnp.asarray(ds.obsvs[nt:])
    ids = jnp.asarray(ds.scene_ids_for_rows(nt, obs.shape[0]))
    obs_w = ds.scale.denormalize(np.asarray(obs))
    cond = condition_groups(obs_w)

    report = {"ckpt": args.ckpt, "epoch": int(epoch),
              "n_test": int(obs.shape[0]),
              "n_conditions": int(cond.max()) + 1, "by_k": {}}
    for k in [int(s) for s in args.ks.split(",")]:
        covs, per_cond = [], []
        for r in range(args.rngs):
            pk = k_sample_rollout(eval_params(state), obs, ids,
                                  jax.random.PRNGKey(1000 + r), k, cfg)
            pred_w = ds.scale.denormalize(np.asarray(pk[..., :2]))
            covs.append(toy_mode_coverage(obs_w, pred_w))
            hits = mode_hits(obs_w, pred_w)          # [modes, N]
            pc = [float(hits[:, cond == c].mean())
                  for c in range(int(cond.max()) + 1)]
            per_cond.append(pc)
        pc_mean = np.mean(per_cond, axis=0)
        report["by_k"][str(k)] = {
            "coverage_mean": round(float(np.mean(covs)), 4),
            "coverage_std": round(float(np.std(covs)), 4),
            "per_condition": [round(float(v), 3) for v in pc_mean],
            "worst_condition": round(float(pc_mean.min()), 4),
        }
        print(f"K={k}: coverage {np.mean(covs):.3f}±{np.std(covs):.3f} "
              f"worst-cond {pc_mean.min():.3f} per-cond "
              f"{[f'{v:.2f}' for v in pc_mean]}", flush=True)

    if args.out:
        with open(args.out, "w") as fh:
            json.dump(report, fh, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()


# Parity note: mode geometry matches eval/stats.py:toy_mode_coverage
# (reference toy modes at ±16°·k, create_toy.py); the reference itself has
# no coverage metric — this is our round-1 instrument, here decomposed.
