"""Per-sample diversity-ratio probe for --ms-weight / --ds-weight tuning.

Loads a trained checkpoint, rolls out two independent noise draws for the
same observations, and prints the distribution of the per-row ratio
r_i = mean|G_i(z1)-G_i(z2)| / mean|z1_i-z2_i| — the statistic both
diversity regularizers act on (engine/train_step.py).  Use it to place
--ds-tau: healthy generators on the big toy measure median ~0.10-0.13
with a legitimate same-mode tail at ~0.01-0.02 (two draws landing on the
same turn mode), so tau should sit between the tail and the median.

Usage:
    python benchmarks/diversity_probe.py --ckpt <model.npz> --data <toy.npz> \
        [--n 256] [--latent-code categorical --n-latent-codes 3] [--mb-std]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--latent-code", default="categorical",
                    choices=["continuous", "categorical"])
    ap.add_argument("--n-latent-codes", type=int, default=3)
    ap.add_argument("--mb-std", action="store_true",
                    help="checkpoint was trained with --mb-std (changes "
                         "D's classifier shape in the restore template)")
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from socialways_tpu.config import TrainConfig
    from socialways_tpu.data.dataset import load_npz_dataset
    from socialways_tpu.engine.losses import sample_noise
    from socialways_tpu.engine.train_step import init_train_state
    from socialways_tpu.io.checkpoint import restore_checkpoint
    from socialways_tpu.models.generator import generator_rollout

    ds = load_npz_dataset(args.data)
    n_past, n_next = ds.obsvs.shape[1], ds.preds.shape[1]
    cfg = TrainConfig(latent_code_type=args.latent_code,
                      n_latent_codes=args.n_latent_codes,
                      mb_std=args.mb_std, n_past=n_past, n_next=n_next)
    state, epoch, _, _ = restore_checkpoint(
        args.ckpt, init_train_state(jax.random.PRNGKey(0), cfg))

    sid = np.zeros(len(ds.obsvs), np.int32)
    for i, (s, e) in enumerate(ds.batches):
        sid[s:e] = i
    n = min(args.n, len(ds.obsvs))
    obs, sids = jnp.asarray(ds.obsvs[:n]), jnp.asarray(sid[:n])
    k1, k2 = jax.random.split(jax.random.PRNGKey(args.seed))
    z1 = sample_noise(k1, n, cfg, jnp.float32)
    z2 = sample_noise(k2, n, cfg, jnp.float32)
    p1 = generator_rollout(state.g_params, obs, z1, n_next, sids)
    p2 = generator_rollout(state.g_params, obs, z2, n_next, sids)
    d = jnp.mean(jnp.abs(p1[..., :2] - p2[..., :2]).reshape(n, -1), axis=-1)
    dz = jnp.mean(jnp.abs(z1 - z2), axis=-1)
    r = np.asarray(d / (dz + 1e-8))
    pct = np.percentile(r, [5, 25, 50, 75, 95])
    print(f"ckpt epoch {epoch}  n={n}")
    print(f"ratio pct [5,25,50,75,95] = {np.round(pct, 4).tolist()}  "
          f"min {r.min():.4f}  max {r.max():.4f}")


if __name__ == "__main__":
    main()
