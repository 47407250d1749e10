"""Distribution-quality scoring of saved toy checkpoints (CPU-runnable).

For each final checkpoint of a coverage-sweep run, computes the
reference's offline distribution metrics (calc_statistics.py semantics:
EMD via Hungarian assignment + 1-NN two-sample accuracy, both per
condition group) plus mode coverage and min-K ADE — so the recommended
recipes carry the full quality triple (coverage, EMD, 1-NN), not just
coverage.

Usage:
    python benchmarks/recipe_quality.py \
        --ckpt .sweepwork/m_robust1+inoise2_0_40000_toy_small.npz/socialWays-hotel.npz \
        --data .sweepwork/toy_small.npz --info-weight 1.0 [--cpu]
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


def score(ckpt: str, data: str, info_weight: float, k: int,
          group: int) -> dict:
    import jax
    import jax.numpy as jnp

    from socialways_tpu.config import TrainConfig
    from socialways_tpu.data.dataset import load_npz_dataset
    from socialways_tpu.engine import init_train_state
    from socialways_tpu.engine.train_step import eval_params
    from socialways_tpu.eval.metrics import k_sample_rollout
    from socialways_tpu.eval.stats import (compute_1nn,
                                           compute_wasserstein,
                                           load_real_samples,
                                           toy_mode_coverage)
    from socialways_tpu.io.checkpoint import restore_checkpoint

    ds = load_npz_dataset(data)
    # the sweep recipes' architecture-relevant config (robust1 family)
    cfg = TrainConfig(n_past=ds.obsvs.shape[1], n_next=ds.preds.shape[1],
                      latent_code_type="categorical", n_latent_codes=3,
                      loss_info_w=info_weight, lr_d=5e-4)
    template = init_train_state(jax.random.PRNGKey(0), cfg)
    state, epoch, _, _ = restore_checkpoint(ckpt, template)

    nt = ds.n_train_samples
    obs = jnp.asarray(ds.obsvs[nt:])
    ids = jnp.asarray(ds.scene_ids_for_rows(nt, obs.shape[0]))
    pk = k_sample_rollout(eval_params(state), obs, ids,
                          jax.random.PRNGKey(123), k, cfg)
    obs_w = ds.scale.denormalize(np.asarray(obs))
    fake_pred_w = ds.scale.denormalize(np.asarray(pk[..., :2]))  # [K,N,T,2]
    real_w = ds.scale.denormalize(np.asarray(ds.preds[nt:]))

    cov = toy_mode_coverage(obs_w, fake_pred_w)

    # distribution metrics in stats_for_dump's framing: [K, nPed, T, 2]
    # full trajectories (obs prefix + pred), per scene group of `group`
    # pedestrians, vs the real set grouped the same way
    # (calc_statistics.py:48-105 semantics)
    n_past = obs_w.shape[1]
    reals = load_real_samples(data, group)       # [Kr, group, T, 2] world
    num = min(20, reals.shape[0], fake_pred_w.shape[0])
    reals = reals[:num]
    full_fake = np.concatenate(
        [np.broadcast_to(obs_w[None], (num,) + obs_w.shape),
         fake_pred_w[:num]], axis=2)             # [num, N, T, 2]
    n = real_w.shape[0]
    emds, onenns = [], []
    for s in range(0, n - group + 1, group):
        fake_g = full_fake[:, s:s + group]
        emds.append(compute_wasserstein(reals, fake_g, n_past))
        onenns.append(compute_1nn(reals, fake_g, n_past)[0])
    err = np.linalg.norm(fake_pred_w - real_w[None], axis=-1).mean(-1)
    return {
        "ckpt": os.path.relpath(ckpt, REPO), "epoch": epoch,
        "coverage": round(float(cov), 3),
        "emd": round(float(np.mean(emds)), 4),
        "one_nn_acc": round(float(np.mean(onenns)), 4),
        "ade_min_k": round(float(err.min(0).mean()), 4),
        "k": k, "n_test": int(n),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", action="append", required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--info-weight", type=float, default=1.0)
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--group", type=int, default=6)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    results = [score(c, args.data, args.info_weight, args.k, args.group)
               for c in args.ckpt]
    for r in results:
        print(json.dumps(r), flush=True)
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
